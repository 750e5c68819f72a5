"""Corpus-export benchmark: the CDC→training-corpus bridge, end to end.

Build phase: generate a raw change feed, replay it into the transcript
table (MOR). Measure phase: `snapshot_corpus` — time-travel read of the
pinned snapshot → MOR reconcile → assemble_conversations (turns→documents)
→ PII redaction → deterministic parquet layout — run at two parallelism
levels on the SAME table (fresh SparkSession per level, same
two-cluster-size stand-in as bench.py's replay scaling evidence).

Two claims measured:
- throughput scales: docs/sec at C and 4C cores + the pair efficiency;
- the export is parallelism-INVARIANT: the 4-core and 16-core exports
  hash identically document-for-document (xxhash64 sum over
  conv_id+doc_text) — determinism does not depend on the cluster size
  that produced the corpus.

Run: python scripts/bench_corpus.py --events 4000000 --cores-n 4
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _digest(spark, path: str) -> tuple[int, int]:
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64("conv_id", "doc_text").cast("decimal(38,0)")
        ).alias("h"),
    ).first()
    return row["n"], int(row["h"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--cores-n", type=int, default=4)
    ap.add_argument("--build-cores", type=int, default=16)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument(
        "--workdir", default="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    args = ap.parse_args()

    from data_pipeline_spark.operators.corpus import snapshot_corpus
    from data_pipeline_spark.plans.table_format import LakehouseTable
    from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_spark
    from data_pipeline_spark.streaming.ingest import IngestJob

    root = tempfile.mkdtemp(prefix="corpus-bench-", dir=args.workdir)
    levels = (args.cores_n, 4 * args.cores_n)

    def session(cores: int):
        return get_spark(
            f"corpus-bench-{cores}c",
            cores=cores,
            extra_conf={
                "spark.sql.files.maxPartitionBytes": "4m",
                "spark.sql.files.openCostInBytes": "512k",
                "spark.local.dir": os.path.join(root, "sparklocal"),
            },
        )

    table = os.path.join(root, "t")
    try:
        # ---- build once, wide (build time is not measured)
        spark = session(args.build_cores)
        feed = os.path.join(root, "feed")
        generate_feed_spark(
            spark,
            feed,
            FeedSpec(
                n_events=args.events,
                n_convs=max(2_000, args.events // 500),
                seed=23,
            ),
            n_chunks=args.chunks,
        )
        LakehouseTable(table).create(TRANSCRIPT_SCHEMA, n_buckets=args.n_buckets)
        IngestJob(table, os.path.join(root, "ctl")).run_to_completion(
            spark, feed, os.path.join(root, "cp"), max_files_per_trigger=256
        )
        pinned = LakehouseTable(table).current_snapshot()["snapshot_id"]
        spark.stop()

        # ---- measure the export at each level, narrow first
        walls: dict[int, float] = {}
        manifests: dict[int, dict] = {}
        digests: dict[int, tuple[int, int]] = {}
        for cores in levels:
            spark = session(cores)
            # warm the executor pool + codegen before timing: a real cluster
            # doesn't cold-start per export, and the fixed session-startup
            # cost would otherwise masquerade as poor scaling
            spark.range(1_000_000).selectExpr("sum(id)").collect()
            out = os.path.join(root, f"corpus-{cores}c")
            t0 = time.monotonic()
            manifests[cores] = snapshot_corpus(
                spark, table, out, snapshot_id=pinned, tag=f"bench-{cores}c"
            )
            walls[cores] = time.monotonic() - t0
            digests[cores] = _digest(spark, out)
            spark.stop()

        n, w4 = levels
        n_docs = manifests[n]["n_docs"]
        tput = {c: n_docs / walls[c] for c in levels}
        print(
            json.dumps(
                {
                    "events": args.events,
                    "n_docs": n_docs,
                    "n_turns": manifests[n]["n_turns"],
                    "cores_n": n,
                    "cores_4n": w4,
                    "export_n_sec": round(walls[n], 1),
                    "export_4n_sec": round(walls[w4], 1),
                    "docs_per_sec_n": int(tput[n]),
                    "docs_per_sec_4n": int(tput[w4]),
                    "scaling_efficiency": round(tput[w4] / tput[n] / 4.0, 3),
                    "exports_identical": bool(digests[n] == digests[w4]),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
