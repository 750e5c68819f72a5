"""Redaction-count cost A/B (VERDICT r3 #4): `redact_pii(counts=True)` runs
every pattern twice (regexp_extract_all to count, then regexp_replace), so
the exact per-row `_redactions` lineage costs a second regex pass. This
measures both modes over a synthetic PII-dense corpus (every doc carries an
email + phone + IPv4 inside ~1 KB of filler) — the worst case for the count
pass, since every pattern matches on every row.

Run: python scripts/bench_redact.py [--docs 200000] [--cores 16]
Recorded result (2026-08-18, this sandbox): counts=False 2.91 s,
counts=True 5.78 s → 1.99× — hence counts=False is the default.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_pipeline_spark.operators.corpus import redact_pii
    from data_pipeline_spark.session import get_spark

    spark = get_spark("bench-redact", cores=args.cores)
    work = os.path.join(
        "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp", "bench-redact-corpus"
    )
    base = spark.range(args.docs).select(
        F.col("id"),
        F.concat(
            F.lit("Contact u"), F.col("id").cast("string"),
            F.lit("@example.com or +1 (415) 555-01"),
            F.lpad((F.col("id") % 100).cast("string"), 2, "0"),
            F.lit(" at 10.0."), (F.col("id") % 256).cast("string"), F.lit(".7 — "),
            F.repeat(
                F.lit("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "),
                16,
            ),
        ).alias("text"),
    )
    base.write.mode("overwrite").parquet(work)
    df = spark.read.parquet(work)

    def run(counts: bool) -> float:
        ts = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            redact_pii(df, counts=counts).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.monotonic() - t0)
        return round(sorted(ts)[len(ts) // 2], 3)

    run(False)  # warm
    scrub, counted = run(False), run(True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps({
        "docs": args.docs,
        "cores": args.cores,
        "scrub_only_sec": scrub,
        "with_counts_sec": counted,
        "counts_overhead_x": round(counted / scrub, 2),
    }))


if __name__ == "__main__":
    main()
