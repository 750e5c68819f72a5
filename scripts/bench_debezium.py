"""Debezium adapter bench: staged-json_tuple one-pass (shipped) vs the two
naive formulations (two-branch union; one-pass per-path get_json_object).

Writes a DML-only Debezium feed (the hot-path shape: DDL is ~1e-5 of a real
feed and rides its own filtered UDF input either way), then times each
adapter shape with a full-output aggregate so every envelope column is
forced. Numbers: BENCH/BASELINE.md §"Debezium adapter".

    python scripts/bench_debezium.py [--events 2000000] [--cores 8]
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

from pyspark.sql import functions as F  # noqa: E402


def union_variant(raw):
    """Round-5 pre-optimization shape kept for the A/B: DML and DDL as two
    filtered branches over the source, per-path get_json_object."""
    from data_pipeline_spark.sources.debezium import _translate_ddl_udf

    v = F.col("value").cast("string")

    def g(path):
        return F.coalesce(
            F.get_json_object(v, "$.payload" + path[1:]), F.get_json_object(v, path)
        )

    op_raw = g("$.op")
    ddl_sql = g("$.ddl")
    after, before = g("$.after"), g("$.before")
    image = F.coalesce(after, before)
    lsn = F.coalesce(
        g("$.source.lsn"), g("$.source.scn"), g("$.source.pos"), g("$.source.sequence")
    ).cast("long")
    ts = F.timestamp_millis(F.coalesce(g("$.source.ts_ms"), g("$.ts_ms")).cast("long"))

    def common(payload_col, conv, turn, op_col):
        return [lsn.alias("lsn"), op_col.alias("op"), ts.alias("ts"),
                conv.alias("conv_id"), turn.cast("int").alias("turn_idx"),
                payload_col.alias("payload")]

    dml = raw.where(v.isNotNull() & op_raw.isNotNull()).select(
        *common(
            F.when(op_raw == "d", F.lit(None).cast("string")).otherwise(after),
            F.get_json_object(image, "$.conv_id"),
            F.get_json_object(image, "$.turn_idx"),
            F.when(op_raw.isin("c", "r"), F.lit("I"))
            .when(op_raw == "u", F.lit("U"))
            .when(op_raw == "d", F.lit("D")),
        )
    ).where(F.col("op").isNotNull())
    ddl = raw.where(v.isNotNull() & op_raw.isNull() & ddl_sql.isNotNull()).select(
        *common(_translate_ddl_udf(ddl_sql), F.lit(None).cast("string"),
                F.lit(None).cast("int"), F.lit("DDL"))
    ).where(F.col("payload").isNotNull())
    return dml.unionByName(ddl)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.sources.debezium import (
        debezium_to_envelope,
        write_debezium_feed,
    )
    from data_pipeline_spark.sources.feed import FeedSpec

    spark = get_spark("bench_debezium", cores=args.cores)
    d = tempfile.mkdtemp(prefix="dbz_bench_")
    try:
        write_debezium_feed(
            d,
            FeedSpec(n_events=args.events, n_convs=max(100, args.events // 100),
                     seed=3, chunk_size=500_000),
        )
        raw = spark.read.schema("value string").parquet(d)

        def run(df):
            t0 = time.monotonic()
            df.agg(F.count("*"), F.max("lsn"), F.sum(F.length("payload"))).collect()
            return time.monotonic() - t0

        out = {"events": args.events, "cores": args.cores}
        for label, build in [("union_per_path", union_variant),
                             ("onepass_json_tuple", debezium_to_envelope)]:
            times = sorted(run(build(raw)) for _ in range(args.repeats))
            out[label + "_median_s"] = round(times[len(times) // 2], 3)
            out[label + "_all_s"] = [round(t, 3) for t in times]
        out["speedup"] = round(
            out["union_per_path_median_s"] / out["onepass_json_tuple_median_s"], 2
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
