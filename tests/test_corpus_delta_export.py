"""Incremental corpus delta export (`export_corpus_delta`): only the
documents of touched conversations ship per export; a consumer folding the
delta chain (upsert docs, drop deletes) reconstructs exactly the full
re-assembled corpus at each export point; a crash between the write and the
cursor commit re-exports a covering window and the fold still converges."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from data_pipeline_spark.operators.corpus import assemble_conversations
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.corpus_view import export_corpus_delta
from data_pipeline_spark.streaming.ingest import IngestJob


def _apply(spark, job, table, batch_id, pdf):
    pdf = pdf.copy()
    pdf["lsn"] = pdf["lsn"] + (
        LakehouseTable(table).current_snapshot()["watermark_lsn"] or 0
    )
    job.apply_batch(
        spark, batch_id, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA)
    )


def _oracle(spark, up) -> pd.DataFrame:
    return (
        assemble_conversations(LakehouseTable(up).read(spark))
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )


def _fold(corpus: pd.DataFrame | None, delta_dir: str) -> pd.DataFrame:
    """Consumer-side reconstruction: upsert docs.parquet, drop deletes."""
    docs = pd.read_parquet(os.path.join(delta_dir, "docs.parquet"))
    dels = pd.read_parquet(os.path.join(delta_dir, "deletes.parquet"))
    if corpus is None:
        corpus = docs
    else:
        corpus = pd.concat(
            [corpus[~corpus["conv_id"].isin(docs["conv_id"])], docs],
            ignore_index=True,
        )
    corpus = corpus[~corpus["conv_id"].isin(dels["conv_id"])]
    return corpus.sort_values("conv_id").reset_index(drop=True)


def test_delta_chain_reconstructs_corpus(spark, tmp_path):
    up = str(tmp_path / "up")
    LakehouseTable(up).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    ingest = IngestJob(up, str(tmp_path / "ctl"))
    out = str(tmp_path / "corpus-deltas")
    cursor = str(tmp_path / "cursor.json")

    # --- delta 1: first export = full corpus
    _apply(spark, ingest, up, 0, generate_feed_pandas(
        FeedSpec(n_events=800, n_convs=40, seed=910)
    ))
    r1 = export_corpus_delta(spark, up, out, cursor, redact=False)
    assert r1["exported"] and r1["n_deleted"] == 0 and r1["from_snapshot"] is None
    corpus = _fold(None, r1["path"])
    pd.testing.assert_frame_equal(corpus, _oracle(spark, up))

    # nothing new → no export, no new directory
    assert export_corpus_delta(spark, up, out, cursor)["exported"] is False

    # --- churn: update a few conversations, add new ones, fully delete one
    upd = generate_feed_pandas(FeedSpec(n_events=200, n_convs=60, seed=911))
    _apply(spark, ingest, up, 1, upd)
    victim = corpus["conv_id"].iloc[0]
    turns = (
        LakehouseTable(up).read(spark)
        .where(f"conv_id = '{victim}'").select("turn_idx")
        .toPandas()["turn_idx"]
    )
    dels = pd.DataFrame({
        "lsn": range(1, len(turns) + 1),
        "op": ["D"] * len(turns),
        "ts": [pd.NaT] * len(turns),
        "conv_id": [victim] * len(turns),
        "turn_idx": turns.astype("int32").tolist(),
        "payload": [None] * len(turns),
    })
    _apply(spark, ingest, up, 2, dels)

    r2 = export_corpus_delta(spark, up, out, cursor, redact=False)
    assert r2["exported"]
    # the delta ships ONLY touched conversations, not the corpus
    delta_docs = pd.read_parquet(os.path.join(r2["path"], "docs.parquet"))
    assert 0 < len(delta_docs) < len(_oracle(spark, up))
    # the fully-deleted conversation is a delete entry
    delta_dels = pd.read_parquet(os.path.join(r2["path"], "deletes.parquet"))
    assert victim in set(delta_dels["conv_id"])
    # folding delta 2 over delta 1 reconstructs the current corpus exactly
    corpus = _fold(corpus, r2["path"])
    pd.testing.assert_frame_equal(corpus, _oracle(spark, up))

    # the manifest chain is contiguous: from_snapshot of delta 2 equals
    # to_snapshot of delta 1
    m1 = json.load(open(os.path.join(r1["path"], "_delta_manifest.json")))
    m2 = json.load(open(os.path.join(r2["path"], "_delta_manifest.json")))
    assert m2["from_snapshot"] == m1["to_snapshot"]
    assert m2["n_docs"] == len(delta_docs) and m2["n_deleted"] == len(delta_dels)


def test_crash_before_cursor_commit_converges(spark, tmp_path):
    up = str(tmp_path / "up")
    LakehouseTable(up).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    ingest = IngestJob(up, str(tmp_path / "ctl"))
    out = str(tmp_path / "corpus-deltas")
    cursor = str(tmp_path / "cursor.json")

    _apply(spark, ingest, up, 0, generate_feed_pandas(
        FeedSpec(n_events=400, n_convs=20, seed=920)
    ))
    r1 = export_corpus_delta(spark, up, out, cursor, redact=False)
    corpus = _fold(None, r1["path"])

    _apply(spark, ingest, up, 1, generate_feed_pandas(
        FeedSpec(n_events=200, n_convs=25, seed=921)
    ))

    # crash AFTER the parquet writes, BEFORE the cursor commit
    orig = LakehouseTable.commit_cursor

    def boom(cursor_path, cur):
        raise RuntimeError("injected crash before cursor commit")

    LakehouseTable.commit_cursor = staticmethod(boom)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            export_corpus_delta(spark, up, out, cursor, redact=False)
    finally:
        LakehouseTable.commit_cursor = staticmethod(orig)

    # upstream moves on BEFORE the retry — the re-export window must COVER
    # the crashed one (same from_snapshot, newer head)
    _apply(spark, ingest, up, 2, generate_feed_pandas(
        FeedSpec(n_events=200, n_convs=25, seed=922)
    ))
    r2 = export_corpus_delta(spark, up, out, cursor, redact=False)
    assert r2["exported"] and r2["from_snapshot"] == r1["to_snapshot"]
    corpus = _fold(corpus, r2["path"])
    pd.testing.assert_frame_equal(corpus, _oracle(spark, up))
    # and the abandoned partial window's range is not part of the committed
    # chain (its dir may exist; the manifest chain skips it)
    assert export_corpus_delta(spark, up, out, cursor)["exported"] is False
