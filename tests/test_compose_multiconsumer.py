"""Composition under multi-consumer concurrency (VERDICT r3 #5): ONE WAP
upstream that publishes out of order (audit-discarded batch in the middle,
then a cherry-pick publish of a branch staged BEFORE the latest main
publish), consumed simultaneously through cursors by three independent
consumers — a full cascade replica, a filtered+projected cascade replica,
and the incremental corpus view — each of which crashes mid-window (after
its merge, before its cursor commit) and restarts.

Proves the cursor protocol composes: staged/discarded snapshots are never
seen by any consumer, redelivery after a crash is absorbed by the
idempotent batch_id skip, and after catch-up all three targets equal their
oracles over exactly the published batches."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.operators.corpus import assemble_conversations
from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.cascade import CascadeJob
from data_pipeline_spark.streaming.corpus_view import CorpusViewJob
from data_pipeline_spark.streaming.ingest import IngestJob
from data_pipeline_spark.streaming.wap import (
    AuditFailedError,
    WapIngestJob,
    audit_changes_clean,
    combine_audits,
)

PRED = "length(text) % 2 = 0"


def _feed(n, seed, base=0):
    pdf = generate_feed_pandas(FeedSpec(n_events=n, n_convs=60, seed=seed))
    pdf["lsn"] = pdf["lsn"] + base
    return pdf


def _df(spark, pdf):
    return spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA)


def _sorted(df):
    return df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _crash_then_resume(poll):
    """Run one cursor poll with commit_cursor crashing AFTER the merge —
    the consumer 'dies' mid-window — then re-run it normally; the
    redelivered window must be skipped by batch_id (idempotent), and a
    third poll must find nothing new."""
    orig = LakehouseTable.commit_cursor

    def boom(cursor_path, cursor):
        raise RuntimeError("injected crash before cursor commit")

    LakehouseTable.commit_cursor = staticmethod(boom)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            poll()
    finally:
        LakehouseTable.commit_cursor = staticmethod(orig)
    res = poll()  # restart: same window redelivered
    assert res["applied"] is True
    assert res["result"].get("skipped"), "redelivered window must be a batch_id skip"
    assert poll()["applied"] is False  # and the cursor is now committed


@pytest.mark.slow
def test_wap_cascade_and_corpus_view_compose_under_crashes(spark, tmp_path):
    a = str(tmp_path / "hub")
    LakehouseTable(a).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    wap = WapIngestJob(
        a, str(tmp_path / "ctl-hub"),
        audit=combine_audits(audit_changes_clean("text", "POISON")),
    )

    # three independent cursor consumers of the SAME upstream
    r_full = str(tmp_path / "replica-full")
    LakehouseTable(r_full).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    edge_full = CascadeJob(a, r_full, str(tmp_path / "ctl-full"))
    cur_full = str(tmp_path / "cursor-full.json")

    r_proj = str(tmp_path / "replica-proj")
    LakehouseTable(r_proj).create(
        T.StructType([f for f in TRANSCRIPT_SCHEMA.fields
                      if f.name in ("conv_id", "turn_idx", "role")]),
        n_buckets=4,
    )
    edge_proj = CascadeJob(
        a, r_proj, str(tmp_path / "ctl-proj"),
        row_predicate=PRED, columns=["role"],
    )
    cur_proj = str(tmp_path / "cursor-proj.json")

    view = str(tmp_path / "view")
    CorpusViewJob.create_view_table(view, n_buckets=4)
    vj = CorpusViewJob(a, view, str(tmp_path / "ctl-view"))
    cur_view = str(tmp_path / "cursor-view.json")

    consumers = [
        lambda: edge_full.poll_once(spark, cur_full),
        lambda: edge_proj.poll_once(spark, cur_proj),
        lambda: vj.poll_once(spark, cur_view),
    ]

    # --- published batch 0, everyone consumes their first window
    b0 = _feed(1_500, 201)
    wap.apply_batch(spark, 0, _df(spark, b0))
    hi = int(b0["lsn"].max())
    for poll in consumers:
        assert poll()["applied"] is True

    # --- batch 1 publishes; poisoned batch 2 is DISCARDED by the audit;
    # batch 3 publishes — no consumer may ever see the poison
    b1 = _feed(700, 202, base=hi)
    wap.apply_batch(spark, 1, _df(spark, b1))
    hi = int(b1["lsn"].max())
    bad = _feed(400, 203, base=hi)
    bad["payload"] = bad["payload"].str.replace("turn", "POISON", regex=False)
    with pytest.raises(AuditFailedError):
        wap.apply_batch(spark, 2, _df(spark, bad))
    b3 = _feed(700, 204, base=hi)
    wap.apply_batch(spark, 3, _df(spark, b3))
    hi = int(b3["lsn"].max())

    # --- EVERY consumer crashes mid-window on this catch-up and restarts
    for poll in consumers:
        _crash_then_resume(poll)

    # --- out-of-order publish: b4 staged on a side branch, b5 publishes on
    # main FIRST (fast-forward), then b4 lands via cherry-pick — the
    # published chain is b5-then-b4 while the LSN order is b4-then-b5
    LakehouseTable(a).create_branch("hotfix")
    b4 = _feed(600, 205, base=hi)
    IngestJob(a, str(tmp_path / "ctl-hotfix"), ref="hotfix").apply_batch(
        spark, 4, _df(spark, b4)
    )
    staged_id = LakehouseTable(a, ref="hotfix").current_snapshot()["snapshot_id"]
    b5 = _feed(600, 206, base=int(b4["lsn"].max()))
    wap.apply_batch(spark, 5, _df(spark, b5))
    out = LakehouseTable(a).cherry_pick(staged_id)
    assert out["skipped"] is False and out["picked_files"] > 0

    # --- final catch-up for all three consumers
    assert edge_full.run_until_caught_up(spark, cur_full) >= 1
    assert edge_proj.run_until_caught_up(spark, cur_proj) >= 1
    assert vj.run_until_caught_up(spark, cur_view) >= 1

    # --- oracles: the hub equals the feed-level reduce over EXACTLY the
    # published batches (poison excluded), and each consumer equals its
    # derivation of the hub
    hub = LakehouseTable(a).read(spark)
    expected = reduce_feed(pd.concat([b0, b1, b3, b4, b5], ignore_index=True))
    hub_pdf = _sorted(hub)
    assert hub_pdf["text"].tolist() == expected["text"].tolist()
    assert not hub_pdf["text"].fillna("").str.contains("POISON").any()

    pd.testing.assert_frame_equal(_sorted(LakehouseTable(r_full).read(spark)), hub_pdf)
    pd.testing.assert_frame_equal(
        _sorted(LakehouseTable(r_proj).read(spark)),
        _sorted(hub.where(F.expr(PRED)).select("conv_id", "turn_idx", "role")),
    )
    view_pdf = (
        LakehouseTable(view).read(spark)
        .select("conv_id", "doc_text", "n_turns", "n_chars")
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    oracle_docs = (
        assemble_conversations(hub)
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(view_pdf, oracle_docs)

    # every consumer fully caught up (lag telemetry agrees)
    assert edge_full.lag()["lag_lsns"] == 0
    assert vj.lag()["lag_lsns"] == 0
