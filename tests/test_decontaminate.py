"""Train/eval decontamination at the corpus layer.

`decontaminate(docs, benchmark)` must drop EXACTLY the documents sharing
at least one word n-gram shingle with the benchmark set — oracle is the
same overlap computed independently in DuckDB over the exported parquet —
and `snapshot_corpus(benchmark=...)` must apply it to the export with the
provenance recorded in the corpus manifest.
"""

from __future__ import annotations

import json
import os

import duckdb
import pandas as pd

from data_pipeline_spark.operators.corpus import (
    assemble_conversations,
    decontaminate,
    snapshot_corpus,
)
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed
from data_pipeline_spark.streaming.ingest import IngestJob

from data_pipeline_spark.driver_queries import _SHINGLES_DUCK  # noqa: E402

DUCK_ORACLE = f"""
WITH dt AS (SELECT conv_id, string_split(doc_text, ' ') AS t
            FROM read_parquet($docs)),
dsh AS (
  SELECT conv_id, unnest({_SHINGLES_DUCK}) AS shingle
  FROM dt WHERE len(t) >= 3
),
bt AS (SELECT string_split(text, ' ') AS t FROM read_parquet($bench)),
bsh AS (
  SELECT DISTINCT unnest({_SHINGLES_DUCK}) AS shingle
  FROM bt WHERE len(t) >= 3
)
SELECT DISTINCT d.conv_id FROM dsh d JOIN bsh b USING (shingle)
"""


def _build_table(spark, tmp_path) -> str:
    feed = str(tmp_path / "feed")
    generate_feed(feed, FeedSpec(n_events=6_000, n_convs=120, seed=211, chunk_size=6_000))
    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    IngestJob(path, str(tmp_path / "ctl")).run_to_completion(
        spark, feed, str(tmp_path / "cp"), max_files_per_trigger=10**9
    )
    return path


def test_decontaminate_matches_duckdb_overlap(spark, tmp_path):
    path = _build_table(spark, tmp_path)
    docs = assemble_conversations(LakehouseTable(path).read(spark))
    full = docs.toPandas().sort_values("conv_id").reset_index(drop=True)

    # benchmark: verbatim excerpts of a few documents (guaranteed overlap)
    # plus a string sharing no 3-gram with anything
    excerpts = [
        " ".join(t.split(" ")[:12]) for t in full["doc_text"].iloc[[3, 17, 40]]
    ]
    bench_pdf = pd.DataFrame({"text": excerpts + ["zz yy xx ww vv uu"]})
    bench_dir = str(tmp_path / "bench")
    os.makedirs(bench_dir)
    bench_pdf.to_parquet(os.path.join(bench_dir, "b.parquet"), index=False)

    docs_dir = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(docs_dir)

    con = duckdb.connect()
    contaminated = {
        r[0]
        for r in con.execute(
            DUCK_ORACLE,
            {"docs": f"{docs_dir}/*.parquet", "bench": f"{bench_dir}/*.parquet"},
        ).fetchall()
    }
    assert len(contaminated) >= 3, "the planted excerpts must contaminate"

    clean = decontaminate(
        docs, spark.read.parquet(bench_dir), text_col="doc_text",
        key_col="conv_id", bench_text_col="text",
    ).toPandas().sort_values("conv_id").reset_index(drop=True)

    expected = (
        full[~full["conv_id"].isin(contaminated)].reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(clean, expected)


def test_snapshot_corpus_with_benchmark_screen(spark, tmp_path):
    path = _build_table(spark, tmp_path)
    full_out = str(tmp_path / "full")
    snapshot_corpus(spark, path, full_out, redact=False)
    full = (
        pd.read_parquet(full_out).sort_values("conv_id").reset_index(drop=True)
    )

    bench_pdf = pd.DataFrame(
        {"text": [" ".join(t.split(" ")[:10]) for t in full["doc_text"].iloc[[5, 60]]]}
    )
    bench_dir = str(tmp_path / "bench")
    os.makedirs(bench_dir)
    bench_pdf.to_parquet(os.path.join(bench_dir, "b.parquet"), index=False)

    clean_out = str(tmp_path / "clean")
    m = snapshot_corpus(
        spark, path, clean_out, redact=False, benchmark=bench_dir
    )
    clean = (
        pd.read_parquet(clean_out).sort_values("conv_id").reset_index(drop=True)
    )
    assert m["settings"]["decontaminate_ngram"] == 3
    assert m["settings"]["decontaminated_against"] == os.path.abspath(bench_dir)
    assert m["n_docs"] == len(clean) < len(full)
    # the screened export equals the full export minus the flagged ids —
    # same anti-join semantics as the operator test above
    dropped = set(full["conv_id"]) - set(clean["conv_id"])
    assert {full["conv_id"].iloc[5], full["conv_id"].iloc[60]} <= dropped
    kept = full[full["conv_id"].isin(set(clean["conv_id"]))].reset_index(drop=True)
    pd.testing.assert_frame_equal(clean, kept)
    # manifest on disk matches the returned one
    assert json.load(open(os.path.join(clean_out, "_corpus_manifest.json"))) == m


def test_screen_runs_before_redaction(spark, tmp_path):
    """A benchmark excerpt CONTAINING PII must still flag the document
    under redact=True: the screen compares raw text to raw text, because
    redacting only the corpus side rewrites every shingle within pattern
    reach of the PII and would let the contaminated doc slip through."""
    import pyspark.sql.functions as F

    from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA

    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=2, compact_every=10**9)
    job = IngestJob(path, str(tmp_path / "ctl"))
    mk = lambda text: json.dumps({"role": "user", "text": text})
    rows = pd.DataFrame(
        {
            "lsn": pd.array([1, 2], dtype="int64"),
            "op": ["I", "I"],
            "ts": pd.to_datetime(["2026-01-01"] * 2),
            "conv_id": ["dirty", "clean"],
            "turn_idx": pd.array([0, 0], dtype="Int32"),
            "payload": pd.array(
                [
                    mk("please contact john@example.com for the answer key now"),
                    mk("an entirely unrelated conversation about gardening tools"),
                ],
                dtype="string",
            ),
        }
    )
    job.apply_batch(spark, 0, spark.createDataFrame(rows, schema=CHANGE_EVENT_SCHEMA))

    bench_dir = str(tmp_path / "bench")
    os.makedirs(bench_dir)
    pd.DataFrame(
        {"text": ["contact john@example.com for the answer key"]}
    ).to_parquet(os.path.join(bench_dir, "b.parquet"), index=False)

    out = str(tmp_path / "corpus")
    snapshot_corpus(spark, path, out, redact=True, benchmark=bench_dir)
    exported = pd.read_parquet(out)
    assert set(exported["conv_id"]) == {"clean"}, (
        "the PII-bearing benchmark overlap must be dropped even though the "
        "exported text is redacted"
    )
    # and the kept doc IS redaction-processed output (column intact)
    assert "doc_text" in exported.columns


def test_delta_export_screens_and_emits_delete_on_contaminating_churn(
    spark, tmp_path
):
    """The incremental delta chain honors the same screen: a contaminated
    doc never ships, and a doc whose UPDATE pulls in benchmark text emits
    a DELETE in the next delta — consumers folding the chain converge to
    the decontaminated corpus."""
    from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA
    from data_pipeline_spark.streaming.corpus_view import export_corpus_delta

    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=2, compact_every=10**9)
    job = IngestJob(path, str(tmp_path / "ctl"))
    mk = lambda text: json.dumps({"role": "user", "text": text})

    def batch(bid, rows):
        pdf = pd.DataFrame(
            {
                "lsn": pd.array([r[0] for r in rows], dtype="int64"),
                "op": [r[1] for r in rows],
                "ts": pd.to_datetime(["2026-01-01"] * len(rows)),
                "conv_id": [r[2] for r in rows],
                "turn_idx": pd.array([0] * len(rows), dtype="Int32"),
                "payload": pd.array([mk(r[3]) for r in rows], dtype="string"),
            }
        )
        job.apply_batch(spark, bid, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))

    bench_dir = str(tmp_path / "bench")
    os.makedirs(bench_dir)
    pd.DataFrame({"text": ["the secret benchmark answer key"]}).to_parquet(
        os.path.join(bench_dir, "b.parquet"), index=False
    )
    out = str(tmp_path / "deltas")
    cursor = str(tmp_path / "cursor.json")

    batch(0, [(1, "I", "dirty", "holds the secret benchmark answer key verbatim"),
              (2, "I", "clean", "totally unrelated text about alpine hiking")])
    m1 = export_corpus_delta(
        spark, path, out, cursor, redact=False, benchmark=bench_dir
    )
    d1 = pd.read_parquet(os.path.join(m1["path"], "docs.parquet"))
    assert set(d1["conv_id"]) == {"clean"}
    assert m1["settings"]["decontaminated_against"] == os.path.abspath(bench_dir)

    # churn INTO contamination: clean's turn now quotes the benchmark
    batch(1, [(3, "U", "clean", "quoting the secret benchmark answer key here")])
    m2 = export_corpus_delta(
        spark, path, out, cursor, redact=False, benchmark=bench_dir
    )
    d2_docs = pd.read_parquet(os.path.join(m2["path"], "docs.parquet"))
    d2_del = pd.read_parquet(os.path.join(m2["path"], "deletes.parquet"))
    assert "clean" not in set(d2_docs["conv_id"])
    assert set(d2_del["conv_id"]) == {"clean"}, (
        "contaminating churn must emit a delete so chain consumers drop it"
    )
