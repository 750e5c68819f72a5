"""Delta export against a write-audit-publish upstream: the exporter is a
cursor consumer (`tail_changes`), so staged and audit-discarded batches
must NEVER reach an exported delta — only published state ships, and the
fold converges on exactly the audited corpus."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from data_pipeline_spark.operators.corpus import assemble_conversations
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.corpus_view import (
    export_corpus_delta,
    list_corpus_deltas,
    read_corpus_deltas,
)
from data_pipeline_spark.streaming.ingest import IngestJob
from data_pipeline_spark.streaming.wap import (
    AuditFailedError,
    WapIngestJob,
    audit_changes_clean,
    combine_audits,
)


def _feed(n, seed, base=0):
    pdf = generate_feed_pandas(FeedSpec(n_events=n, n_convs=30, seed=seed))
    pdf["lsn"] = pdf["lsn"] + base
    return pdf


def _df(spark, pdf):
    return spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA)


def test_delta_export_never_ships_staged_or_discarded(spark, tmp_path):
    hub = str(tmp_path / "hub")
    LakehouseTable(hub).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    wap = WapIngestJob(
        hub, str(tmp_path / "ctl"),
        audit=combine_audits(audit_changes_clean("text", "POISON")),
    )
    out = str(tmp_path / "deltas")
    cursor = str(tmp_path / "cursor.json")

    # published base → bootstrap export
    b0 = _feed(600, 301)
    wap.apply_batch(spark, 0, _df(spark, b0))
    r1 = export_corpus_delta(spark, hub, out, cursor, redact=False)
    assert r1["mode"] == "bootstrap" and r1["n_docs"] > 0

    # stage WITHOUT publishing (raw branch ingest): the exporter must see
    # nothing new
    staged_job = IngestJob(hub, str(tmp_path / "ctl-raw"), ref="audit")
    b1 = _feed(300, 302, base=int(b0["lsn"].max()))
    staged_job.apply_batch(spark, 1, _df(spark, b1))
    assert export_corpus_delta(spark, hub, out, cursor)["exported"] is False

    # a poisoned batch is discarded by the audit — still nothing new
    bad = _feed(200, 303, base=int(b1["lsn"].max()))
    bad["payload"] = bad["payload"].str.replace("turn", "POISON", regex=False)
    with pytest.raises(AuditFailedError):
        wap.apply_batch(spark, 2, _df(spark, bad))
    assert export_corpus_delta(spark, hub, out, cursor)["exported"] is False

    # a clean batch publishes b1 + itself in one fast-forward → ONE delta
    # carrying both, with zero poison anywhere in the chain
    b2 = _feed(300, 304, base=int(b1["lsn"].max()))
    wap.apply_batch(spark, 3, _df(spark, b2))
    r2 = export_corpus_delta(spark, hub, out, cursor, redact=False)
    assert r2["exported"]
    docs = pd.read_parquet(os.path.join(r2["path"], "docs.parquet"))
    assert not docs["doc_text"].fillna("").str.contains("POISON").any()

    # fold == assemble(published hub); every doc in the chain is clean
    fold = (
        read_corpus_deltas(spark, out)
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    oracle = (
        assemble_conversations(LakehouseTable(hub).read(spark))
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fold[sorted(fold.columns)],
                                  oracle[sorted(fold.columns)])
    assert not fold["doc_text"].fillna("").str.contains("POISON").any()
    assert len(list_corpus_deltas(out)) == 2
