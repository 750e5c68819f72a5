"""Benchmark runner — prints ONE JSON line for the driver.

Two parts:
1. Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
   on local[$SPARK_GRAFT_CPUS] — per-query seconds in "queries".
2. CDC replay throughput (the BASELINE.json metric): a deterministic
   hot-key-skewed change feed replayed through the full engine at two
   parallelism levels — local[8] (N) and local[32] (4N), each in its own
   JVM via a subprocess — reporting events/sec at both and the scaling
   efficiency eff = tput(4N) / (4 × tput(N)). Sandbox stand-in for N vs 4N
   executors (no real cluster here; see BENCH/BASELINE.md).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
BENCH_EVENTS (feed size, default 4,000,000), BENCH_SKIP_SCALING=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_EVENTS", "4000000"))

BENCH_QUERIES = [
    "lww_latest_by_user",
    "lww_salted_by_user",
    "cdc_apply_merge",
    "audit_batch_lineage",
    "pricing_summary",
    "top_revenue_orders",
    "region_customer_profile",
    "top3_orders_per_customer",
    "props_json_stats",
    "lsh_band_buckets",
    "ngram_jaccard_pairs",
    "cosine_similar_to_query",
    "doc_quality_scores",
]


def run_queries() -> dict[str, float]:
    from data_pipeline_spark import driver_queries
    from data_pipeline_spark.session import get_spark

    spark = get_spark("bench-queries", cores=CPUS)
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = driver_queries.Q[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return timings


def run_scaling(feed_dir: str) -> dict:
    out = {}
    for cores in (8, CPUS):
        cmd = [
            sys.executable, os.path.join(REPO, "scripts", "replay_job.py"),
            "--feed", feed_dir, "--events", str(N_EVENTS), "--cores", str(cores),
        ]
        res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
        line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
        out[cores] = json.loads(line)
    tput_n = out[8]["events_per_sec"]
    tput_4n = out[CPUS]["events_per_sec"]
    factor = CPUS / 8
    return {
        "replay_events": N_EVENTS,
        "tput_n_8cores": tput_n,
        "tput_4n_32cores": tput_4n,
        "scaling_efficiency": round(tput_4n / (factor * tput_n), 3),
        "wall_n_sec": out[8]["wall_sec"],
        "wall_4n_sec": out[CPUS]["wall_sec"],
    }


def main() -> None:
    # feed for the replay benchmark (deterministic, hot-key skewed)
    from data_pipeline_spark.sources.feed import FeedSpec, generate_feed

    queries = run_queries()

    result = {
        "metric": "change_events_applied_per_sec",
        "unit": "events/sec",
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "queries": queries,
    }
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        feed_dir = tempfile.mkdtemp(prefix="bench-feed-")
        spec = FeedSpec(
            n_events=N_EVENTS,
            n_convs=max(2000, N_EVENTS // 500),
            seed=42,
            hot_key=True,
            chunk_size=max(250_000, N_EVENTS // 16),
        )
        generate_feed(feed_dir, spec)
        scaling = run_scaling(feed_dir)
        result.update(scaling)
        result["value"] = scaling["tput_4n_32cores"]
    else:
        result["value"] = sum(queries.values())
        result["unit"] = "sec"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
