"""Snapshot tags (Iceberg-style named refs): a tag pins a snapshot — and
its data/manifest files — out of expire_snapshots' reach, so a consumer can
re-read an exact historical state (a pinned training-corpus export) however
far the retention window has moved.

Covers: read(tag=) == read(snapshot_id=); expiry keeps ONLY tagged history
beyond the retention window (byte-equal re-read after aggressive expiry);
untag makes the snapshot expirable again; guard rails (dangling target,
conflicting re-tag, bad names, tag+snapshot_id together); snapshot_corpus's
tag= hook records the pin and survives expiry.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from data_pipeline_spark.operators.corpus import snapshot_corpus
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _table_with_batches(spark, tmp_path, n_batches=3, events_per_batch=800):
    """A MOR table advanced by n_batches CDC batches; returns (table, job)."""
    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    job = IngestJob(path, str(tmp_path / "ctl"))
    table = LakehouseTable(path)
    lsn0 = 0
    for b in range(n_batches):
        pdf = generate_feed_pandas(
            FeedSpec(n_events=events_per_batch, n_convs=60, seed=200 + b)
        )
        pdf["lsn"] = pdf["lsn"] + lsn0
        job.apply_batch(spark, b, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))
        lsn0 = table.current_snapshot()["watermark_lsn"]
    return table, job


def _frame(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_tag_read_and_expiry_keeps_pinned(spark, tmp_path):
    table, _ = _table_with_batches(spark, tmp_path, n_batches=3)
    snaps = [s["snapshot_id"] for s in table.history() if s["kind"] == "merge"]
    pinned = snaps[0]  # after batch 0 — well outside keep_last=1

    table.tag_snapshot("corpus-v1", pinned)
    assert table.tags()["corpus-v1"]["snapshot_id"] == pinned
    before = _frame(table.read(spark, snapshot_id=pinned))
    pd.testing.assert_frame_equal(_frame(table.read(spark, tag="corpus-v1")), before)

    res = table.expire_snapshots(keep_last=1)
    assert pinned in res["kept"]
    # the untagged middle snapshot is gone, the tagged island survives
    assert snaps[1] not in res["kept"]
    assert not os.path.exists(
        os.path.join(table.meta_dir, f"snapshot-{snaps[1]:08d}.json")
    )
    after = _frame(table.read(spark, tag="corpus-v1"))
    pd.testing.assert_frame_equal(after, before)

    # untag → next expiry reclaims it
    table.remove_tag("corpus-v1")
    res2 = table.expire_snapshots(keep_last=1)
    assert pinned not in res2["kept"]
    with pytest.raises(FileNotFoundError):
        table.snapshot_by_id(pinned)


def test_tag_guard_rails(spark, tmp_path):
    table, _ = _table_with_batches(spark, tmp_path, n_batches=2)
    cur = table.current_snapshot()["snapshot_id"]
    older = table.history()[0]["snapshot_id"]

    with pytest.raises(FileNotFoundError):
        table.tag_snapshot("dangling", 10_000)
    for bad in ("", "  padded  ", "a/b"):
        with pytest.raises(ValueError):
            table.tag_snapshot(bad)

    table.tag_snapshot("v", older)
    table.tag_snapshot("v", older)  # same target: idempotent
    with pytest.raises(ValueError):
        table.tag_snapshot("v", cur)  # conflicting move needs replace
    table.tag_snapshot("v", cur, replace=True)
    assert table.tags()["v"]["snapshot_id"] == cur

    with pytest.raises(KeyError):
        table.remove_tag("never-existed")
    with pytest.raises(KeyError):
        table.read(spark, tag="never-existed")
    with pytest.raises(ValueError):
        table.read(spark, snapshot_id=cur, tag="v")


def test_snapshot_corpus_tag_survives_expiry(spark, tmp_path):
    table, job = _table_with_batches(spark, tmp_path, n_batches=1)
    out1 = str(tmp_path / "corpus1")
    m1 = snapshot_corpus(spark, table.path, out1, redact=False, tag="train-2026-08")
    assert m1["tag"] == "train-2026-08"
    assert table.tags()["train-2026-08"]["snapshot_id"] == m1["snapshot_id"]

    # table moves on twice, then aggressive expiry
    lsn0 = table.current_snapshot()["watermark_lsn"]
    for b in (10, 11):
        pdf = generate_feed_pandas(FeedSpec(n_events=600, n_convs=60, seed=300 + b))
        pdf["lsn"] = pdf["lsn"] + lsn0
        job.apply_batch(spark, b, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))
        lsn0 = table.current_snapshot()["watermark_lsn"]
    res = table.expire_snapshots(keep_last=1)
    assert m1["snapshot_id"] in res["kept"]

    # pinned re-export after expiry: document-for-document equal
    out2 = str(tmp_path / "corpus2")
    m2 = snapshot_corpus(
        spark, table.path, out2, snapshot_id=m1["snapshot_id"], redact=False
    )
    assert (m2["n_docs"], m2["n_turns"]) == (m1["n_docs"], m1["n_turns"])
    d1 = spark.read.parquet(out1).toPandas().sort_values("conv_id").reset_index(drop=True)
    d2 = spark.read.parquet(out2).toPandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(d1, d2)
