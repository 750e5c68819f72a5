"""Audit-gated streaming WAP: publish on pass, isolate + redeliver on fail.

The end-to-end story the runner exists for: a poisoned micro-batch kills
the stream BEFORE its offsets commit, main never shows it, and after the
operator fixes the feed a plain restart redelivers the same batch, which
then passes audit and publishes — exactly-once end-to-end."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql.streaming import StreamingQueryException

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.wap import (
    AuditFailedError,
    WapIngestJob,
    audit_changes_clean,
    audit_row_delta,
    audit_unique_key,
    combine_audits,
)


def _chunked_feed(tmp_path, n_chunks=5, n_events=4_000, seed=51):
    pdf = generate_feed_pandas(FeedSpec(n_events=n_events, n_convs=80, seed=seed))
    fdir = tmp_path / "feed"
    os.makedirs(fdir)
    size = -(-len(pdf) // n_chunks)
    for c in range(n_chunks):
        pdf.iloc[c * size : (c + 1) * size].to_parquet(
            fdir / f"chunk-{c:04d}.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    return pdf, str(fdir)


def _texts(df):
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)["text"]
        .tolist()
    )


AUDIT = combine_audits(
    audit_unique_key(),
    audit_row_delta(max_shrink=0.9),
    audit_changes_clean("text", "POISON"),
)


def test_wap_stream_publishes_every_batch(spark, tmp_path):
    pdf, fdir = _chunked_feed(tmp_path)
    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    job = WapIngestJob(path, str(tmp_path / "ctl"), audit=AUDIT)
    job.run_to_completion(spark, fdir, str(tmp_path / "ckpt"), max_files_per_trigger=1)

    tbl = LakehouseTable(path)
    assert _texts(tbl.read(spark)) == reduce_feed(pdf)["text"].tolist()
    # main fully caught up with the branch, with a published alert per batch
    assert tbl.current_snapshot()["snapshot_id"] == tbl.branches()["audit"]
    alerts = [
        json.loads(l) for l in open(tmp_path / "ctl" / "alerts.jsonl")
    ]
    assert sum(a["kind"] == "published" for a in alerts) == 5


def test_wap_stream_poison_isolated_then_redelivered(spark, tmp_path):
    pdf, fdir = _chunked_feed(tmp_path, seed=52)
    # poison chunk 2 (the third micro-batch at maxFilesPerTrigger=1).
    # Rewrite IN PLACE preserving mtime: the file source orders batches by
    # modification time, and a bumped mtime would deliver this chunk last —
    # where the ingest watermark filter correctly drops its (old-LSN) rows
    # as duplicates and the poison never reaches the audit.
    bad_path = os.path.join(fdir, "chunk-0002.parquet")
    st = os.stat(bad_path)
    bad = pd.read_parquet(bad_path)
    good_payloads = bad["payload"].copy()
    bad["payload"] = bad["payload"].str.replace("turn", "POISON", regex=False)
    bad.to_parquet(bad_path, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(bad_path, (st.st_atime, st.st_mtime))

    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    job = WapIngestJob(path, str(tmp_path / "ctl"), audit=AUDIT)
    with pytest.raises(StreamingQueryException) as exc:
        job.run_to_completion(spark, fdir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert AuditFailedError.__name__ in str(exc.value)

    tbl = LakehouseTable(path)
    # batches 0-1 published; the poisoned batch is nowhere — not on main,
    # not staged (branch reset), and the changelog never emitted it
    main_head = tbl.current_snapshot()["snapshot_id"]
    assert tbl.branches()["audit"] == main_head
    assert not any("POISON" in (t or "") for t in _texts(tbl.read(spark)))
    alerts = [json.loads(l) for l in open(tmp_path / "ctl" / "alerts.jsonl")]
    fail = [a for a in alerts if a["kind"] == "audit_failed"]
    assert fail and fail[-1]["reset_to"] == main_head
    assert any(not c["ok"] and c["name"] == "changes_clean"
               for c in fail[-1]["report"]["checks"])

    # operator fixes the feed file in place; restart redelivers batch 2
    bad["payload"] = good_payloads
    bad.to_parquet(bad_path, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(bad_path, (st.st_atime, st.st_mtime))
    job2 = WapIngestJob(path, str(tmp_path / "ctl"), audit=AUDIT)
    job2.run_to_completion(spark, fdir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert _texts(tbl.read(spark)) == reduce_feed(pdf)["text"].tolist()
    assert tbl.current_snapshot()["snapshot_id"] == tbl.branches()["audit"]


def test_wap_row_delta_blocks_mass_delete(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=3_000, n_convs=50, seed=53))
    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    job = WapIngestJob(
        path, str(tmp_path / "ctl"),
        audit=combine_audits(audit_row_delta(max_shrink=0.5)),
    )
    from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA

    job.apply_batch(spark, 0, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))
    tbl = LakehouseTable(path)
    published = tbl.read(spark).toPandas()
    assert len(published) > 0

    # a runaway upstream deletes ~everything; the audit refuses to publish
    hi = int(pdf["lsn"].max())
    live = published[["conv_id", "turn_idx"]]
    wipe = pd.DataFrame({
        "lsn": range(hi + 1, hi + 1 + len(live)),
        "op": "D",
        "ts": pd.Timestamp("2026-01-01"),
        "conv_id": live["conv_id"].values,
        "turn_idx": live["turn_idx"].values,
        "payload": None,
    })
    with pytest.raises(AuditFailedError):
        job.apply_batch(spark, 1, spark.createDataFrame(wipe, schema=CHANGE_EVENT_SCHEMA))
    # nothing published, nothing staged: the delete batch was discarded
    assert len(tbl.read(spark).toPandas()) == len(published)
    assert tbl.branches()["audit"] == tbl.current_snapshot()["snapshot_id"]
