"""Conversation assembly (turns → training documents) and the snapshot-
pinned corpus export:

- assemble_conversations vs a DuckDB string_agg(... ORDER BY turn_idx)
  oracle, including null-role / null-text turns (concat_ws semantics match
  across engines).
- snapshot_corpus is a pure function of (table, snapshot_id, settings):
  re-exporting the SAME pinned snapshot after the live table moved on
  yields identical documents; a fresh (unpinned) export sees the new data;
  the lineage manifest records the pin.
"""

from __future__ import annotations

import json
import os

import duckdb
import pandas as pd

from data_pipeline_spark.operators.corpus import assemble_conversations, snapshot_corpus
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _turns_fixture() -> pd.DataFrame:
    rows = []
    for c in range(40):
        for t in range(1 + c % 7):
            rows.append(
                {
                    "conv_id": f"conv-{c:04d}",
                    "turn_idx": t,
                    # exercise null role and null text paths
                    "role": None if (c + t) % 11 == 0 else ("user" if t % 2 == 0 else "assistant"),
                    "text": None if (c * 7 + t) % 13 == 0 else f"turn {t} of conversation {c} body",
                }
            )
    return pd.DataFrame(rows)


def test_assemble_matches_duckdb(spark):
    pdf = _turns_fixture()
    got = (
        assemble_conversations(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("turns", pdf)
    want = con.execute(
        """
        SELECT conv_id,
               string_agg(concat_ws(': ', role, text), chr(10) ORDER BY turn_idx)
                   AS doc_text,
               count(*)::INT AS n_turns,
               length(string_agg(concat_ws(': ', role, text),
                                 chr(10) ORDER BY turn_idx))::INT AS n_chars
        FROM turns GROUP BY conv_id ORDER BY conv_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_assemble_max_turns_matches_duckdb(spark, tmp_path):
    pdf = _turns_fixture()
    got = (
        assemble_conversations(spark.createDataFrame(pdf), max_turns=3)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("turns", pdf)
    want = con.execute(
        """
        SELECT conv_id,
               string_agg(concat_ws(': ', role, text), chr(10) ORDER BY turn_idx)
                   AS doc_text,
               count(*)::INT AS n_turns,
               length(string_agg(concat_ws(': ', role, text),
                                 chr(10) ORDER BY turn_idx))::INT AS n_chars
        FROM turns WHERE turn_idx < 3 GROUP BY conv_id ORDER BY conv_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)
    assert got["n_turns"].max() == 3
    # the truncation is a pre-aggregation predicate, not a post-agg slice:
    # over a parquet scan it must reach the reader as a pushed filter
    # (file-level min/max pruning skips deep-tail files at scale)
    p = str(tmp_path / "turns.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    physical = (
        assemble_conversations(spark.read.parquet(p), max_turns=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LessThan(turn_idx,3)" in physical  # in PushedFilters


def test_snapshot_corpus_pinned_reproducible(spark, tmp_path):
    feed = str(tmp_path / "feed")
    generate_feed(feed, FeedSpec(n_events=6_000, n_convs=120, seed=101, chunk_size=3_000))
    a = str(tmp_path / "a")
    LakehouseTable(a).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    IngestJob(a, str(tmp_path / "ctl")).run_to_completion(
        spark, feed, str(tmp_path / "cp"), max_files_per_trigger=2
    )

    out1 = str(tmp_path / "corpus1")
    m1 = snapshot_corpus(spark, a, out1, redact=False)
    assert m1["snapshot_id"] == LakehouseTable(a).current_snapshot()["snapshot_id"]
    assert m1["n_docs"] > 0 and m1["n_turns"] > m1["n_docs"]
    assert json.load(open(os.path.join(out1, "_corpus_manifest.json"))) == m1

    # live table moves on
    feed2 = generate_feed_pandas(FeedSpec(n_events=2_000, n_convs=120, seed=103))
    feed2["lsn"] = feed2["lsn"] + LakehouseTable(a).current_snapshot()["watermark_lsn"]
    IngestJob(a, str(tmp_path / "ctl")).apply_batch(
        spark, 99, spark.createDataFrame(feed2, schema=CHANGE_EVENT_SCHEMA)
    )

    # pinned re-export == original export, document for document
    out2 = str(tmp_path / "corpus2")
    m2 = snapshot_corpus(spark, a, out2, snapshot_id=m1["snapshot_id"], redact=False)
    assert (m2["snapshot_id"], m2["n_docs"], m2["n_turns"]) == (
        m1["snapshot_id"], m1["n_docs"], m1["n_turns"],
    )
    d1 = spark.read.parquet(out1).toPandas().sort_values("conv_id").reset_index(drop=True)
    d2 = spark.read.parquet(out2).toPandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(d1, d2)

    # an unpinned export sees the moved-on table
    out3 = str(tmp_path / "corpus3")
    m3 = snapshot_corpus(spark, a, out3, redact=False)
    assert m3["snapshot_id"] > m1["snapshot_id"]
    d3 = spark.read.parquet(out3).toPandas()
    assert not d3.set_index("conv_id")["doc_text"].sort_index().equals(
        d1.set_index("conv_id")["doc_text"].sort_index()
    )

    # the export equals assembling the pinned time-travel read directly
    direct = (
        assemble_conversations(LakehouseTable(a).read(spark, snapshot_id=m1["snapshot_id"]))
        .toPandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        d1[["conv_id", "doc_text", "n_turns", "n_chars"]].reset_index(drop=True),
        direct,
    )
