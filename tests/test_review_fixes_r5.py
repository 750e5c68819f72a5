"""Regression tests for the round-5 review findings (code review over the
r5 diff).

1. HIGH — LongType columns: Spark's `simpleString()` spells LongType
   "bigint", which `_TYPES`/`_stat_codec` did not recognize — a table
   created with any LongType column recorded "bigint" in schema JSON and
   broke at the first `schema_struct()` read; a LongType z-order column
   passed `create()` validation ("bigint" is in `_ZORDER_TYPES`) but never
   recorded bounds, silently degrading the layout to linear forever. Type
   names are now canonicalized ("bigint"→"long") at every recording
   boundary (create, apply_ddl) and aliased in `_spark_type`/`_stat_codec`.
2. MEDIUM — `WapIngestJob.try_publish(pre_batch_id=...)` WITHOUT batch_id
   (manual staging drivers) reset the branch but skipped the txn-aligner
   spill rollback, so a discarded batch's open tail was prepended to the
   next batch and the rejected events reached a later published commit.
   The first discarded batch is now derived from the reset target's own
   last_batch_id.
3. MEDIUM — `DedupIndexJob.create_index_tables` created the signatures /
   bands tables without cluster_by, so the manifest key ranges the point
   paths rely on for within-bucket file skipping were never recorded; the
   tables now default to cluster_by=['conv_id'].
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.plans.table_format import (
    LakehouseTable,
    _canon_type,
    _spark_type,
    _stat_codec,
)
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TXN_EVENT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas

LONG_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("val", T.LongType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=True),
    ]
)


def _long_df(spark, n=200):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (f"c{i % 20:03d}", i // 20, i * 1_000_003, base + datetime.timedelta(minutes=i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, LONG_SCHEMA)


def test_canon_type_aliases():
    assert _canon_type("bigint") == "long"
    assert _stat_codec("bigint") is int
    assert _spark_type("bigint") == T.LongType()


def test_longtype_column_roundtrip_and_pruning(spark, tmp_path):
    """A create()-time LongType column must behave exactly like a
    DDL-added 'long': canonical schema JSON, readable table, recorded
    stats, predicate file skipping."""
    path = str(tmp_path / "t_long")
    tbl = LakehouseTable(path)
    tbl.create(
        LONG_SCHEMA, n_buckets=2, cluster_by=["conv_id"],
        stats_columns=["val"], target_file_rows=50,
    )
    snap = tbl.current_snapshot()
    types = {f["name"]: f["type"] for f in tbl._load_schema(snap["schema_id"])["fields"]}
    assert types["val"] == "long"  # canonical, not 'bigint'

    tbl.overwrite(spark, _long_df(spark))
    out = tbl.read(spark)
    assert dict(out.dtypes)["val"] == "bigint"
    assert out.count() == 200

    # footer stats were recorded for the long column (codec now resolves)
    snap = tbl.current_snapshot()
    fid = str(next(f["id"] for f in tbl._load_schema(snap["schema_id"])["fields"]
                   if f["name"] == "val"))
    stats = [e.get("col_stats", {}).get(fid) for e in tbl._files(snap)
             if e.get("layer") != "delta"]
    assert any(s is not None for s in stats)

    # and read(where=) both prunes by them and returns exact rows
    got = tbl.read(spark, where=[("val", ">", 150 * 1_000_003)])
    assert got.count() == 49


def test_zorder_activates_on_longtype_columns(spark, tmp_path):
    """cluster_order='zorder' over LongType columns must actually z-sort
    once bounds exist — before the fix _sort_cols fell back to linear
    forever because 'bigint' had no stats codec."""
    path = str(tmp_path / "t_zlong")
    tbl = LakehouseTable(path)
    tbl.create(
        LONG_SCHEMA, n_buckets=1, cluster_by=["val", "turn_idx"],
        cluster_order="zorder", target_file_rows=50,
    )
    tbl.overwrite(spark, _long_df(spark))
    sc = tbl._sort_cols(tbl.current_snapshot())
    assert sc is not None and len(sc) == 1 and not isinstance(sc[0], str), (
        "zorder with LongType cluster columns must produce the Morton "
        "sort expression once bounds are recorded, not the linear fallback"
    )


def test_ddl_widen_accepts_bigint_alias(spark, tmp_path):
    path = str(tmp_path / "t_widen")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=2)
    tbl.apply_ddl([{"action": "add_column", "name": "n", "type": "int"}])
    tbl.apply_ddl([{"action": "widen_type", "name": "n", "to": "bigint"}])
    snap = tbl.current_snapshot()
    types = {f["name"]: f["type"] for f in tbl._load_schema(snap["schema_id"])["fields"]}
    assert types["n"] == "long"
    assert dict(tbl.read(spark).dtypes)["n"] == "bigint"


def test_manual_try_publish_rolls_back_aligner_spill(spark, tmp_path):
    """try_publish(pre_batch_id=...) WITHOUT batch_id — the manual staging
    driver — must still roll the discarded batches' open-tail spills back
    with the branch, or the rejected events leak into the next batch."""
    from data_pipeline_spark.streaming.wap import (
        AuditFailedError,
        WapIngestJob,
        audit_changes_clean,
    )

    chunks, lsn0, txn0 = [], 0, 0
    for i in range(3):
        pdf = generate_feed_pandas(
            FeedSpec(n_events=900, n_convs=50, seed=520 + i,
                     with_txns=True, txn_mean_size=15)
        )
        pdf["lsn"] = pdf["lsn"] + lsn0
        pdf["txn_id"] = pdf["txn_id"] + txn0
        lsn0 = int(pdf["lsn"].max())
        txn0 = int(pdf["txn_id"].max())
        chunks.append(pdf)
    chunks[2]["payload"] = chunks[2]["payload"].str.replace(
        "turn", "POISON", regex=False
    )

    tbl = str(tmp_path / "t")
    LakehouseTable(tbl).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    wap = WapIngestJob(
        tbl, str(tmp_path / "ctl"),
        audit=audit_changes_clean("text", "POISON"),
        publish_every=10**9,  # never auto-publish: we drive try_publish
        txn_aligned=True,
    )
    for bid in (0, 1):
        wap.apply_batch(spark, bid, spark.createDataFrame(chunks[bid], TXN_EVENT_SCHEMA))
    pre = wap.branch.current_snapshot()["snapshot_id"]
    wap.apply_batch(spark, 2, spark.createDataFrame(chunks[2], TXN_EVENT_SCHEMA))
    assert 2 in wap.job.aligner._pending_ids()

    with pytest.raises(AuditFailedError):
        wap.try_publish(spark, pre_batch_id=pre)  # no batch_id on purpose

    # the poisoned batch's spill rolled back with the branch; batch 1's
    # spill (the redelivery input) survives
    assert wap.job.aligner._pending_ids() == [1]
    assert wap.branch.current_snapshot()["snapshot_id"] == pre

    # replacement batch 2 + drain publishes clean text only
    pdf2 = generate_feed_pandas(
        FeedSpec(n_events=900, n_convs=50, seed=620, with_txns=True,
                 txn_mean_size=15)
    )
    pdf2["lsn"] = pdf2["lsn"] + lsn0
    pdf2["txn_id"] = pdf2["txn_id"] + txn0
    wap.apply_batch(spark, 3, spark.createDataFrame(pdf2, TXN_EVENT_SCHEMA))
    wap.job.flush_pending(spark)
    wap.try_publish(spark)
    main = LakehouseTable(tbl).read(spark)
    assert main.where(F.col("text").contains("POISON")).count() == 0


def test_index_tables_cluster_by_default(tmp_path):
    from data_pipeline_spark.streaming.dedup_index import DedupIndexJob

    idx = str(tmp_path / "idx")
    DedupIndexJob.create_index_tables(idx, n_hashes=4, n_buckets=4)
    for name in ("signatures", "bands"):
        snap = LakehouseTable(f"{idx}/{name}").current_snapshot()
        assert snap.get("cluster_by") == ["conv_id"], name
