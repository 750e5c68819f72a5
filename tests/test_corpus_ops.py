"""Corpus-assembly operators (operators/corpus.py) vs DuckDB oracles on the
driver testdata — same rigor as the registry queries (the 50-entry driver
window is full, so these verify at the pytest level instead):

- stratified_sample / upsample_by_weight: md5-fraction decisions recomputed
  in DuckDB (same md5, same hex slice) — exact row/multiset equality.
- redact_pii: Spark (Java regex) vs DuckDB (RE2) on the shared-dialect
  patterns — redacted text and match counts equal.
- pack_sequences: the slice table vs a DuckDB window-cumsum + LATERAL-range
  reconstruction, plus the packing invariants (every sequence except each
  shard's last is exactly `budget` tokens; every doc fully covered, in
  order, split across contiguous sequences).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from data_pipeline_spark.operators.corpus import (
    PII_PATTERNS,
    pack_sequences,
    redact_pii,
    stratified_sample,
    upsample_by_weight,
)

SF = "/root/testdata/sf0.01"
FRAC = "(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))::UBIGINT / 4294967295.0)"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_stratified_sample_matches_duckdb(spark, duck):
    rates = {"src0": 1.0, "src1": 0.25, "src2": 0.0}
    got = sorted(
        r.doc_id
        for r in stratified_sample(
            _docs(spark), "source", rates, key_col="doc_id", default_rate=0.1
        ).select("doc_id").collect()
    )
    frac = FRAC.format(salt="strat", key="doc_id")
    want = duck.execute(
        f"""
        SELECT doc_id FROM documents
        WHERE {frac} < CASE source
            WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.25 WHEN 'src2' THEN 0.0
            ELSE 0.1 END
        ORDER BY doc_id
        """
    ).df()["doc_id"].tolist()
    assert got == want
    assert 0 < len(got) < 500  # genuinely selective


def test_stratified_sample_is_deterministic(spark):
    a = stratified_sample(_docs(spark), "source", {"src1": 0.5}, "doc_id")
    b = stratified_sample(_docs(spark), "source", {"src1": 0.5}, "doc_id")
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())


def test_upsample_by_weight_matches_duckdb(spark, duck):
    weights = {"src0": 2.5, "src1": 1.0, "src2": 0.3}
    got = sorted(
        (r.doc_id, r.epoch)
        for r in upsample_by_weight(_docs(spark), weights, "source", "doc_id")
        .select("doc_id", "epoch").collect()
    )
    frac = FRAC.format(salt="mix", key="doc_id")
    want = duck.execute(
        f"""
        WITH w AS (
          SELECT doc_id,
                 CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                             WHEN 'src2' THEN 0.3 ELSE 0.0 END AS wt,
                 {frac} AS u
          FROM documents
        ), n AS (
          SELECT doc_id,
                 CAST(floor(wt) AS BIGINT)
                 + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END AS reps
          FROM w
        )
        SELECT n.doc_id, CAST(e.epoch AS BIGINT) AS epoch
        FROM n, LATERAL (SELECT unnest(range(1, reps + 1)) AS epoch) e
        WHERE reps > 0
        ORDER BY doc_id, epoch
        """
    ).df()
    assert got == list(map(tuple, want.itertuples(index=False)))
    # src0 docs appear 2 or 3 times; src1 exactly once
    counts = pd.Series([d for d, _ in got]).value_counts()
    docs = _docs(spark).select("doc_id", "source").toPandas().set_index("doc_id")
    for doc_id, c in counts.items():
        src = docs.loc[doc_id, "source"]
        if src == "src0":
            assert c in (2, 3)
        elif src == "src1":
            assert c == 1


def test_redact_pii_matches_duckdb(spark, duck):
    rows = [
        (1, "mail me at jane.doe+x@example.co.uk or call +1 (415) 555-0199 now"),
        (2, "server at 10.0.12.7 responded; backup 192.168.1.254."),
        (3, "no pii here, just text with numbers 42 and x@y (not an email)"),
        (4, "two mails a@b.io c@d.org and a phone 020 7946 0958"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = redact_pii(df, counts=True).orderBy("doc_id").toPandas()
    # default is the single-pass scrub: same text, no counts column
    plain = redact_pii(df).orderBy("doc_id").toPandas()
    assert "_redactions" not in plain.columns
    assert plain["text"].tolist() == got["text"].tolist()

    expr = "text"
    for pat, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    counts = " + ".join(
        f"len(regexp_extract_all({e}, '{p}'))"
        for p, e in [
            (PII_PATTERNS[0][0], "text"),
            (PII_PATTERNS[1][0],
             f"regexp_replace(text, '{PII_PATTERNS[0][0]}', '<EMAIL>', 'g')"),
            (PII_PATTERNS[2][0],
             f"regexp_replace(regexp_replace(text, '{PII_PATTERNS[0][0]}', '<EMAIL>', 'g'), '{PII_PATTERNS[1][0]}', '<PHONE>', 'g')"),
        ]
    )
    duck.register("pii_rows", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.execute(
        f"SELECT doc_id, {expr} AS text, {counts} AS n FROM pii_rows ORDER BY doc_id"
    ).df()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["_redactions"].tolist() == want["n"].astype(int).tolist()
    assert "<EMAIL>" in got.loc[0, "text"] and "<PHONE>" in got.loc[0, "text"]
    assert got.loc[2, "text"] == rows[2][1] and got.loc[2, "_redactions"] == 0


BUDGET = 512


def _packed(spark):
    from pyspark.sql import functions as F

    docs = _docs(spark).select(
        "doc_id", F.length("text").cast("long").alias("n_tokens")
    )
    return pack_sequences(docs, BUDGET, n_shards=8)


def test_pack_sequences_matches_duckdb(spark, duck):
    got = (
        _packed(spark).orderBy("shard", "seq_id", "doc_id").toPandas()
    )
    want = duck.execute(
        f"""
        WITH d AS (
          SELECT doc_id, length(text)::BIGINT AS n,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8 AS shard
          FROM documents WHERE length(text) > 0
        ), c AS (
          SELECT *,
                 COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
                 COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n AS e
          FROM d
        )
        SELECT CAST(shard AS BIGINT) AS shard, CAST(q.seq_id AS BIGINT) AS seq_id,
               doc_id,
               CAST(GREATEST(s, q.seq_id * {BUDGET}) - q.seq_id * {BUDGET} AS INT) AS seq_offset,
               CAST(GREATEST(s, q.seq_id * {BUDGET}) - s AS INT) AS doc_offset,
               CAST(LEAST(e, (q.seq_id + 1) * {BUDGET}) - GREATEST(s, q.seq_id * {BUDGET}) AS INT) AS len
        FROM c, LATERAL (
          SELECT unnest(range(CAST(s // {BUDGET} AS BIGINT),
                              CAST((e - 1) // {BUDGET} + 1 AS BIGINT))) AS seq_id
        ) q
        ORDER BY shard, seq_id, doc_id
        """
    ).df()
    for col in ("shard", "seq_id", "doc_id", "seq_offset", "doc_offset", "len"):
        assert got[col].astype("int64").tolist() == want[col].astype("int64").tolist(), col


def test_pack_sequences_invariants(spark):
    got = _packed(spark).toPandas()
    docs = (
        _docs(spark).toPandas().assign(n=lambda d: d["text"].str.len())
        .set_index("doc_id")["n"]
    )
    # every doc fully covered, in order, no gaps
    for doc_id, g in got.groupby("doc_id"):
        g = g.sort_values("doc_offset")
        assert g["len"].sum() == docs.loc[doc_id]
        assert g["doc_offset"].iloc[0] == 0
        assert (g["doc_offset"] + g["len"]).iloc[:-1].tolist() == g["doc_offset"].iloc[1:].tolist()
    # every sequence except each shard's LAST is exactly `budget` tokens
    seq_tokens = got.groupby(["shard", "seq_id"])["len"].sum()
    last = got.groupby("shard")["seq_id"].max()
    for (shard, seq_id), tot in seq_tokens.items():
        if seq_id != last.loc[shard]:
            assert tot == BUDGET, (shard, seq_id, tot)
        else:
            assert 0 < tot <= BUDGET
    # pieces tile each sequence contiguously from offset 0
    for (_, _), g in got.groupby(["shard", "seq_id"]):
        g = g.sort_values("seq_offset")
        assert g["seq_offset"].iloc[0] == 0
        assert (g["seq_offset"] + g["len"]).iloc[:-1].tolist() == g["seq_offset"].iloc[1:].tolist()


def test_repetition_profile_known_values(spark):
    from data_pipeline_spark.operators.corpus import repetition_profile

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                # 6 tokens -> 5 bigrams: "a b","b a","a b","b c","c d";
                # top bigram "a b" x2 -> 2/5; dup 2 -> 2/5; max run 1
                "a b a b c d",
                # degenerate loop: 5 identical tokens -> 4 identical bigrams
                "x x x x x",
                # single token: no bigrams
                "hello",
                # repeated lines: 4 lines, "nav bar" repeats 3x (2 excess)
                "nav bar\ncontent here now\nnav bar\nnav bar",
                # all distinct
                "the quick brown fox",
            ],
        }
    )
    got = (
        repetition_profile(spark.createDataFrame(pdf), n=2)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, "n_ngrams"] == 5
    assert got.loc[1, "top_ngram_frac"] == 0.4
    assert got.loc[1, "dup_ngram_frac"] == 0.4
    assert got.loc[1, "max_token_run"] == 1
    assert got.loc[2, "n_ngrams"] == 4
    assert got.loc[2, "top_ngram_frac"] == 1.0
    assert got.loc[2, "dup_ngram_frac"] == 1.0
    assert got.loc[2, "max_token_run"] == 5
    assert got.loc[3, "n_ngrams"] == 0
    assert got.loc[3, "top_ngram_frac"] == 0.0
    assert got.loc[3, "dup_ngram_frac"] == 0.0
    assert got.loc[3, "max_token_run"] == 1
    # doc 4: lines = [nav bar, content here now, nav bar, nav bar]
    # distinct = 2 -> dup_line_frac = (4-2)/4 = 0.5
    # line chars: 7+16+7+7 = 37; excess chars = 14 -> 14/37
    assert got.loc[4, "dup_line_frac"] == 0.5
    assert got.loc[4, "dup_line_char_frac"] == round(14 / 37, 4)
    assert got.loc[5, "dup_ngram_frac"] == 0.0
    assert got.loc[5, "dup_line_frac"] == 0.0
    # original columns preserved
    assert {"doc_id", "text"} <= set(got.reset_index().columns)


def test_repetition_profile_zero_exchanges(spark, tmp_path):
    """The 100-TB claim in the docstring: within-document statistics never
    justify a shuffle. Over a parquet scan the whole profile must be a
    single scan->project stage — no Exchange in the physical plan."""
    from data_pipeline_spark.operators.corpus import repetition_profile

    p = str(tmp_path / "docs.parquet")
    spark.read.parquet(f"{SF}/documents.parquet").limit(100).write.parquet(p)
    physical = (
        repetition_profile(spark.read.parquet(p))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in physical


def test_dedup_lines_known_values(spark):
    from data_pipeline_spark.operators.corpus import dedup_lines

    # "cookie banner" appears in docs 1,2,3 (df=3); "nav" in 1,2 (df=2);
    # every other line is unique. min_df=3 -> only the banner is boilerplate.
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "cookie banner\nreal content one\nnav",
                "nav\ncookie banner\nreal content two",
                "cookie banner\ncookie banner",  # within-doc repeat: df counts docs, not occurrences
                "standalone doc",
            ],
            "lang": ["en", "en", "de", "en"],
        }
    )
    got = (
        dedup_lines(spark.createDataFrame(pdf), min_df=3)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, "text_dedup"] == "real content one\nnav"
    assert got.loc[2, "text_dedup"] == "nav\nreal content two"
    # doc 3 loses every line but the ROW survives with empty text
    assert got.loc[3, "text_dedup"] == ""
    assert got.loc[3, "n_lines"] == 2 and got.loc[3, "n_lines_kept"] == 0
    assert got.loc[4, "text_dedup"] == "standalone doc"
    assert (got["n_lines"] == [3, 3, 2, 1]).all()
    assert (got["n_lines_kept"] == [2, 2, 0, 1]).all()
    # original columns preserved
    assert got.loc[3, "lang"] == "de"

    # min_df=2: nav goes too; doc 3's two occurrences alone do NOT make a
    # df of 2 (one distinct doc)
    pdf2 = pd.DataFrame({"doc_id": [1, 2], "text": ["only here\nonly here", "other"]})
    got2 = (
        dedup_lines(spark.createDataFrame(pdf2), min_df=2)
        .toPandas()
        .set_index("doc_id")
    )
    assert got2.loc[1, "text_dedup"] == "only here\nonly here"
    assert got2.loc[1, "n_lines_kept"] == 2


def test_dedup_lines_order_and_empty_lines(spark):
    from data_pipeline_spark.operators.corpus import dedup_lines

    # empty lines (consecutive separators) are dropped from the counts AND
    # the reassembly; surviving-line order is the original document order
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["z last\n\ncommon\na first", "common\nmiddle\ncommon"],
        }
    )
    got = (
        dedup_lines(spark.createDataFrame(pdf), min_df=2)
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "text_dedup"] == "z last\na first"
    assert got.loc[1, "n_lines"] == 3  # the empty line never counted
    assert got.loc[2, "text_dedup"] == "middle"
    # completely empty text: zero lines, row survives
    pdf3 = pd.DataFrame({"doc_id": [9], "text": [""]})
    got3 = dedup_lines(spark.createDataFrame(pdf3), min_df=2).toPandas()
    assert got3.loc[0, "n_lines"] == 0 and got3.loc[0, "text_dedup"] == ""


def test_dedup_lines_matches_duckdb(spark, duck):
    """The driver-style oracle at operator level: screen the documents table
    split on ' ' (the synthetic corpus is single-line, so token = 'line'
    here — the semantics under test are the global-df screen + ordered
    reassembly, which don't care what the separator is)."""
    from data_pipeline_spark.operators.corpus import dedup_lines

    got = (
        dedup_lines(_docs(spark), text_col="text", line_sep=" ", min_df=400)
        .select("doc_id", "text_dedup", "n_lines", "n_lines_kept")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duck.execute(
        """
        WITH lines AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS line,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
          FROM documents
        ), nz AS (SELECT * FROM lines WHERE line <> ''),
        freq AS (
          SELECT line FROM nz GROUP BY line
          HAVING COUNT(DISTINCT doc_id) >= 400
        ), marked AS (
          SELECT nz.doc_id, nz.pos, nz.line, f.line IS NOT NULL AS dup
          FROM nz LEFT JOIN freq f USING (line)
        )
        SELECT d.doc_id,
               COALESCE(m.t, '') AS text_dedup,
               CAST(COALESCE(m.n, 0) AS INT) AS n_lines,
               CAST(COALESCE(m.k, 0) AS INT) AS n_lines_kept
        FROM documents d LEFT JOIN (
          SELECT doc_id,
                 string_agg(line, ' ' ORDER BY pos) FILTER (WHERE NOT dup) AS t,
                 count(*) AS n,
                 COALESCE(count(*) FILTER (WHERE NOT dup), 0) AS k
          FROM marked GROUP BY doc_id
        ) m USING (doc_id)
        ORDER BY doc_id
        """
    ).df()
    # the screen must actually fire at this threshold or the test is vacuous
    assert (want["n_lines_kept"] < want["n_lines"]).any()
    assert (want["n_lines_kept"] > 0).any()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_dedup_substrings_known_values(spark):
    """ExactSubstr screen (Lee et al. 2021) pinned against hand-computed
    spans: a cross-document shared phrase is cut from BOTH copies as one
    maximal span (consecutive duplicate windows merge), a within-document
    repeat is cut at both occurrences (two spans), short and empty
    documents pass through, and whitespace is normalized to single
    spaces."""
    from data_pipeline_spark.operators.corpus import dedup_substrings

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                # docs 1+2 share a 6-token phrase -> 3 duplicate 4-windows
                # each, merging to ONE span covering the whole phrase
                "alpha beta gamma delta epsilon zeta unique1 tail1",
                "head2 alpha beta gamma delta epsilon zeta tail2",
                # within-doc repeat of a 4-token phrase -> two spans
                "one two three four X one two three four",
                # shorter than min_len: untouched
                "just three tokens",
                "",
                # whitespace normalization (tab + double space)
                "padme  anakin\tleia",
            ],
        }
    )
    got = (
        dedup_substrings(spark.createDataFrame(pdf), min_len=4, min_count=2)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, "text_dedup"] == "unique1 tail1"
    assert (got.loc[1, ["n_tokens", "n_tokens_kept", "n_dup_spans"]] == [8, 2, 1]).all()
    assert got.loc[2, "text_dedup"] == "head2 tail2"
    assert (got.loc[2, ["n_tokens", "n_tokens_kept", "n_dup_spans"]] == [8, 2, 1]).all()
    assert got.loc[3, "text_dedup"] == "X"
    assert (got.loc[3, ["n_tokens", "n_tokens_kept", "n_dup_spans"]] == [9, 1, 2]).all()
    assert got.loc[4, "text_dedup"] == "just three tokens"
    assert (got.loc[4, ["n_tokens", "n_tokens_kept", "n_dup_spans"]] == [3, 3, 0]).all()
    assert got.loc[5, "text_dedup"] == ""
    assert (got.loc[5, ["n_tokens", "n_tokens_kept", "n_dup_spans"]] == [0, 0, 0]).all()
    assert got.loc[6, "text_dedup"] == "padme anakin leia"

    with pytest.raises(ValueError, match="min_len"):
        dedup_substrings(spark.createDataFrame(pdf), min_len=1)


def test_dedup_substrings_span_extension(spark):
    """A duplicate span LONGER than min_len is removed in full (every
    stride-1 window inside it is duplicated, so the merged cover equals
    the maximal span), and a doc that is entirely one duplicate span
    dedups to ''."""
    from data_pipeline_spark.operators.corpus import dedup_substrings

    phrase = " ".join(f"w{i}" for i in range(10))  # 10-token shared span
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [f"{phrase} solo1 solo2", phrase],
        }
    )
    got = (
        dedup_substrings(spark.createDataFrame(pdf), min_len=4, min_count=2)
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "text_dedup"] == "solo1 solo2"
    assert (got.loc[1, ["n_tokens", "n_tokens_kept", "n_dup_spans"]] == [12, 2, 1]).all()
    assert got.loc[2, "text_dedup"] == ""
    assert (got.loc[2, ["n_tokens", "n_tokens_kept", "n_dup_spans"]] == [10, 0, 1]).all()


def test_dedup_substrings_matches_duckdb(spark, duck):
    """Operator-level driver-style oracle: the SAME SQL the off-window
    driver compare runs (driver_queries.SQL['dedup_substr_docs']) executed
    here over the sf0.01 documents table, row-for-row equal to the
    operator at min_len=4."""
    from data_pipeline_spark import driver_queries
    from data_pipeline_spark.operators.corpus import dedup_substrings

    got = (
        dedup_substrings(_docs(spark).select("doc_id", "text"), min_len=4)
        .select("doc_id", "text_dedup", "n_tokens", "n_tokens_kept", "n_dup_spans")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(driver_queries.SQL["dedup_substr_docs"] + " ORDER BY doc_id")
        .df()
        .reset_index(drop=True)
    )
    # the screen must actually fire at this min_len or the test is vacuous
    assert (want["n_tokens_kept"] < want["n_tokens"]).any()
    assert (want["n_tokens_kept"] > 0).any()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_lm_perplexity_known_values(spark):
    """Hand-computed bigram model: ref 'a b a c' → C(a,b)=C(b,a)=C(a,c)=1,
    C(a)=2, C(b)=1, V' = |{a,b,c}|+1 = 4 (add-one smoothing)."""
    import math

    from data_pipeline_spark.operators.corpus import lm_perplexity

    ref = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["a b a c"]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["a b x", "z", "  "]}
        )
    )
    got = (
        lm_perplexity(docs, ref_df=ref)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1: (a,b): (1+1)/(2+4); (b,x): unseen, (0+1)/(1+4)
    alp = (math.log(2 / 6) + math.log(1 / 5)) / 2
    assert got.loc[0, "n_bigrams"] == 2
    assert got.loc[0, "n_unseen_bigrams"] == 1
    assert got.loc[0, "avg_logp"] == pytest.approx(round(alp, 4))
    assert got.loc[0, "ppl"] == pytest.approx(round(math.exp(-alp), 2))
    # doc 2: single token → no bigrams, null scores, row kept
    assert got.loc[1, "n_bigrams"] == 0
    assert pd.isna(got.loc[1, "avg_logp"]) and pd.isna(got.loc[1, "ppl"])
    # doc 3: whitespace-only → empty tokens filtered → no bigrams
    assert got.loc[2, "n_bigrams"] == 0


def test_lm_perplexity_capped_model(spark):
    """max_bigrams keeps the top-B by (count desc, w1, w2): all ref counts
    are 1, so cap=2 keeps (a,b),(a,c) lexicographically — (b,a) becomes
    unseen and its context count drops to 0."""
    import math

    from data_pipeline_spark.operators.corpus import lm_perplexity

    ref = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["a b a c"]})
    )
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["b a"]}))
    got = lm_perplexity(docs, ref_df=ref, max_bigrams=2).toPandas()
    # (b,a): dropped from the capped model → cb=0, cc(b)=0, V'=4 unchanged
    alp = math.log((0 + 1) / (0 + 4))
    assert got.loc[0, "n_unseen_bigrams"] == 1
    assert got.loc[0, "avg_logp"] == pytest.approx(round(alp, 4))


def test_lm_perplexity_self_reference_default(spark):
    """ref_df=None scores df against itself — every bigram is then seen."""
    from data_pipeline_spark.operators.corpus import lm_perplexity

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b a b", "c d"]})
    )
    got = lm_perplexity(docs).toPandas()
    assert (got["n_unseen_bigrams"] == 0).all()
    assert (got["n_bigrams"] > 0).all()
