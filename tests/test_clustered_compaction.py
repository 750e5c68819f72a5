"""Clustered compaction + manifest key-range file skipping.

Tables created with cluster_by sort each bucket's rows on compaction and
split them into target_file_rows-bounded files, recording per-file
min/max of the cluster key in the manifest. `read(conv_ids=)` must then
(a) return exactly what an unclustered table returns, and (b) plan
strictly fewer base files once the id list stops pruning at bucket
granularity. Pruning is an optimization only: files without key stats
(deltas, pre-clustering bases) are always kept."""

from __future__ import annotations

import pandas as pd

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _mk(spark, tmp_path, name, **create_kw):
    path = str(tmp_path / name)
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=2, **create_kw)
    return path, IngestJob(path, str(tmp_path / f"ctl-{name}"))


def _apply(spark, job, pdf, batch_id=0):
    job.apply_batch(spark, batch_id, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))


def _frame(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_clustered_equals_unclustered_and_prunes_files(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=10_000, n_convs=200, seed=31))
    cl_path, cl_job = _mk(
        spark, tmp_path, "cl",
        compact_every=10**9, cluster_by=["conv_id", "turn_idx"], target_file_rows=500,
    )
    un_path, un_job = _mk(spark, tmp_path, "un", compact_every=10**9)
    _apply(spark, cl_job, pdf)
    _apply(spark, un_job, pdf)
    cl, un = LakehouseTable(cl_path), LakehouseTable(un_path)
    cl.compact(spark)
    un.compact(spark)

    # clustering must not change table contents
    pd.testing.assert_frame_equal(_frame(cl.read(spark)), _frame(un.read(spark)))

    base = [e for e in cl._files(cl.current_snapshot()) if e.get("layer") == "base"]
    assert len(base) > 4, "target_file_rows must split each bucket into several files"
    assert all(e.get("key_min") and e.get("key_max") for e in base)

    # per bucket, sorted files cover non-overlapping (contiguous) key ranges
    # (boundary rows may share a conv_id across neighboring files)
    for bucket in {e["bucket"] for e in base}:
        ranges = sorted(
            (e["key_min"], e["key_max"])
            for e in base
            if e["bucket"] == bucket
        )
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert lo1 <= hi1 <= lo2

    # a single-conversation point read keeps a small fraction of base files
    victim = pdf["conv_id"].iloc[0]
    fid = cl._field_id(cl.current_snapshot(), "conv_id")
    kept = cl._prune_by_key(base, [victim], fid)
    assert 1 <= len(kept) <= 2
    # the unclustered twin cannot skip anything inside the bucket
    un_base = [e for e in un._files(un.current_snapshot()) if e.get("layer") == "base"]
    assert un._prune_by_key(un_base, [victim], fid) == un_base

    # and the pruned point read returns exactly the full-read rows
    pd.testing.assert_frame_equal(
        _frame(cl.read(spark, conv_ids=[victim])),
        _frame(un.read(spark).where(f"conv_id = '{victim}'")),
    )


def test_point_read_correct_with_post_compaction_deltas(spark, tmp_path):
    base_pdf = generate_feed_pandas(FeedSpec(n_events=6_000, n_convs=100, seed=37))
    cl_path, cl_job = _mk(
        spark, tmp_path, "cl2",
        compact_every=10**9, cluster_by=["conv_id", "turn_idx"], target_file_rows=400,
    )
    _apply(spark, cl_job, base_pdf, batch_id=0)
    cl = LakehouseTable(cl_path)
    cl.compact(spark)

    # post-compaction churn: unsorted delta files without key stats
    churn = generate_feed_pandas(FeedSpec(n_events=1_500, n_convs=100, seed=41))
    churn["lsn"] = churn["lsn"] + (cl.current_snapshot()["watermark_lsn"] or 0)
    _apply(spark, cl_job, churn, batch_id=1)

    snap = cl.current_snapshot()
    deltas = [e for e in cl._files(snap) if e.get("layer") == "delta"]
    assert deltas and all("key_min" not in e for e in deltas)
    # pruning keeps every statless delta file whatever the key
    fid = cl._field_id(snap, "conv_id")
    assert cl._prune_by_key(deltas, ["conv-zzz"], fid) == deltas

    # LWW reconcile over (pruned base ∪ all deltas) == plain filtered read,
    # for several conversations including ones touched only by the churn
    ids = sorted(set(churn["conv_id"].iloc[:3]) | set(base_pdf["conv_id"].iloc[:3]))
    full = cl.read(spark)
    pd.testing.assert_frame_equal(
        _frame(cl.read(spark, conv_ids=ids)),
        _frame(full.where(full["conv_id"].isin(ids))),
    )


def test_initsync_writes_clustered_base(spark, tmp_path):
    cl_path, _ = _mk(
        spark, tmp_path, "cl3",
        cluster_by=["conv_id", "turn_idx"], target_file_rows=300,
    )
    cl = LakehouseTable(cl_path)
    snap_df = (
        spark.range(3_000)
        .selectExpr(
            "concat('conv-', lpad(cast(id % 150 as string), 6, '0')) conv_id",
            "cast(id div 150 as int) turn_idx",
            "'user' role",
            "concat('t', id) text",
            "cast(null as string) tool",
            "cast(null as timestamp) ts",
        )
    )
    cl.overwrite(spark, snap_df, watermark_lsn=0)
    base = [e for e in cl._files(cl.current_snapshot()) if e.get("layer") == "base"]
    assert len(base) > 4 and all(e.get("key_min") for e in base)
    victim = "conv-000007"
    fid = cl._field_id(cl.current_snapshot(), "conv_id")
    assert len(cl._prune_by_key(base, [victim], fid)) <= 2
    got = _frame(cl.read(spark, conv_ids=[victim]))
    assert len(got) == 20 and set(got["conv_id"]) == {victim}
