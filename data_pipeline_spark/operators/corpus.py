"""Corpus-preparation operators for LLM training-data pipelines.

These extend the engine's training-data surface (SURVEY.md §2, LLM-ops
table) with the assembly-side operations a pretraining pipeline runs AFTER
dedup/quality filtering: deterministic sampling, source re-weighting,
PII redaction, and token-budget sequence packing. All Catalyst built-ins —
no Python UDFs anywhere — and every operator is deterministic (md5-based
uniforms, never engine-private hashes), so each one is DuckDB-oracle-checked
in tests/test_corpus_ops.py over the same parquet.

100-TB design notes per operator are in the docstrings; the common thread:
everything is row-local or shard-local (no global coordination), so the
plans scale embarrassingly — the only shuffle anywhere is sequence packing's
per-shard window sort, bounded by shard size, never by corpus size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Deterministic uniform(0,1) per row: the first 8 hex digits of md5 over a
#: salted key. Identical in DuckDB (same md5, same slice), unlike xxhash64 /
#: rand() — this is what makes sampling decisions oracle-checkable AND
#: reproducible across engines (the property a training-data pipeline needs
#: so a re-run selects the SAME corpus).
def _hash_frac(col, salt: str):
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / float(0xFFFFFFFF)
    )


def stratified_sample(
    df: DataFrame, strata_col: str, rates: dict[str, float], key_col: str,
    default_rate: float = 0.0, salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash-uniform
    < the stratum's rate (e.g. keep 100% of 'books', 10% of 'web'). Row-local
    predicate — ZERO shuffles, pushes into the scan; at 100 TB this is a
    filter, not a job. Unknown strata fall to default_rate."""
    rate = F.lit(default_rate)
    for name, r in rates.items():
        rate = F.when(F.col(strata_col) == name, F.lit(float(r))).otherwise(rate)
    return df.where(_hash_frac(F.col(key_col), salt) < rate)


def upsample_by_weight(
    df: DataFrame, weight_col_map: dict[str, float], strata_col: str, key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Corpus mixing: repeat each row per its source's mixing weight
    (epochs-per-source, e.g. wiki×2.5 = always 2 copies + a deterministic
    50% chance of a 3rd). repeat = floor(w) + (hash_frac < frac(w)); emitted
    via explode(sequence(...)) with the copy index as `epoch` (so downstream
    shuffles de-collocate the copies). Row-multiplying but row-LOCAL — no
    shuffle; output size = Σ weights × rows, known up front."""
    w = F.lit(0.0)
    for name, wt in weight_col_map.items():
        w = F.when(F.col(strata_col) == name, F.lit(float(wt))).otherwise(w)
    n = F.floor(w).cast("long") + (
        _hash_frac(F.col(key_col), salt) < (w - F.floor(w))
    ).cast("long")
    return (
        df.withColumn("_n", n)
        .where(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def _run_length_fold(arr):
    """Max run length and total rows-in-runs>1 over a SORTED string array,
    as ONE F.aggregate fold — struct accumulator (prev, run, maxrun, dupn).
    Returns (maxrun, dupn) columns. The finish lambda folds the last run."""
    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        closed_dup = F.when(
            (x != acc["prev"]) & (acc["run"] > 1), acc["run"]
        ).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["maxrun"], run).alias("maxrun"),
            (acc["dupn"] + closed_dup).alias("dupn"),
        )

    def _finish(acc):
        return F.struct(
            acc["maxrun"].alias("maxrun"),
            (
                acc["dupn"]
                + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
            ).alias("dupn"),
        )

    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("maxrun"),
        F.lit(0).alias("dupn"),
    )
    res = F.aggregate(arr, zero, _step, _finish)
    return res["maxrun"], res["dupn"]


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    token_sep: str = " ",
    line_sep: str = "\n",
    n: int = 2,
) -> DataFrame:
    """Gopher-style intra-document repetition features (Rae et al. 2021,
    public paper): the standard web-corpus quality gate that drops docs
    dominated by boilerplate (repeated nav lines) or degenerate loops
    (repeated n-grams, "the the the ...").

    Appends, per row:
      n_ngrams          — number of token n-grams (docs with < n tokens: 0)
      top_ngram_frac    — occurrences of the single most frequent n-gram
                          over n_ngrams (Gopher's top-n-gram fraction)
      dup_ngram_frac    — fraction of n-grams whose n-gram occurs ≥ 2×
      max_token_run     — longest run of IDENTICAL consecutive tokens
      dup_line_frac     — fraction of lines that repeat an earlier line
      dup_line_char_frac— chars in those excess line occurrences / all
                          line chars (the excess-occurrence variant: a
                          line's FIRST occurrence is legitimate content)

    100-TB design: everything is a row-LOCAL Catalyst expression — the
    n-gram histogram is a sorted-array run-length fold (F.aggregate with a
    struct accumulator), NOT explode → groupBy(doc, gram), which would
    shuffle |corpus| × |grams/doc| rows just to count within-row. Zero
    Exchanges; the whole profile rides one WholeStageCodegen/project stage
    and composes with stratified_sample's scan-level filters."""
    toks = F.split(F.col(text_col), token_sep)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.when(F.size(toks) >= n, F.transform(
        idx,
        lambda i: F.concat_ws(
            token_sep, *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
        ),
    )).otherwise(F.array().cast("array<string>"))
    d = df.withColumn("_sg", F.array_sort(grams))
    top_g, dup_g = _run_length_fold(F.col("_sg"))
    # max consecutive identical-token run folds the UNSORTED token array
    max_run, _ = _run_length_fold(toks)
    lines = F.filter(F.split(F.col(text_col), line_sep), lambda x: x != "")
    dlines = F.array_distinct(lines)
    line_chars = F.length(F.concat_ws("", lines))
    dup_chars = line_chars - F.length(F.concat_ws("", dlines))
    ng = F.size("_sg")
    return d.select(
        *df.columns,
        ng.alias("n_ngrams"),
        F.when(ng > 0, F.round(top_g / ng, 4)).otherwise(F.lit(0.0)).alias("top_ngram_frac"),
        F.when(ng > 0, F.round(dup_g / ng, 4)).otherwise(F.lit(0.0)).alias("dup_ngram_frac"),
        F.when(F.size(toks) > 0, max_run).otherwise(F.lit(0)).alias("max_token_run"),
        F.when(
            F.size(lines) > 0,
            F.round((F.size(lines) - F.size(dlines)) / F.size(lines), 4),
        ).otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(line_chars > 0, F.round(dup_chars / line_chars, 4))
        .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
    )


#: Redaction patterns: a shared-regex-dialect subset (no lookaround, no \b
#: differences) so the same pattern strings run in Spark (Java regex) and
#: DuckDB (RE2) — tested equal. Order matters: emails before phones so the
#: digits inside an already-redacted token don't re-match.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
]


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    min_df: int = 2,
) -> DataFrame:
    """Cross-document exact line deduplication (the RefinedWeb / CCNet
    boilerplate filter, public papers): a line that appears verbatim in
    ≥ `min_df` DISTINCT documents is boilerplate (nav bars, cookie
    banners, canned greetings) and is removed from EVERY document; each
    line's document frequency is global, so — unlike `repetition_profile`,
    which is within-document and shuffle-free — this operator genuinely
    needs a corpus-wide aggregation.

    Appends to each input row:
      text_dedup    — the document with boilerplate lines removed, original
                      line order preserved ('' if every line was removed;
                      the row itself is never dropped — survivorship is the
                      caller's policy, same contract as decontaminate)
      n_lines       — non-empty lines before the screen
      n_lines_kept  — lines surviving it

    100-TB shape (three stages, each the minimal one):
      1. frequency: posexplode(split) → groupBy(md5(line)) countDistinct(id)
         — ONE shuffle moving (16-byte hash, id) pairs, partial-aggregated
         map-side; the full line text never shuffles.
      2. screen: the frequent set (≤ total_lines / min_df rows of ONE hash
         column — heavy-hitter-bounded) joins back onto the exploded lines.
         Left to AQE: broadcast when it fits (the common case — RefinedWeb
         reports a tiny boilerplate set vs corpus), shuffle-hash when a
         pathological corpus makes it huge. Same deliberate non-forcing as
         decontaminate's anti-join.
      3. reassembly: groupBy(id) re-concatenates surviving lines in posexplode
         order — map-side-combinable ObjectHashAggregate, reduce memory
         bounded by the longest single document. The final join back to the
         input rides the same id hash partitioning Spark just produced.
    countDistinct(id) within stage 1 is per-line-hash, so Spark plans it as
    two cascaded partial aggregates — no expansion join, no distinct-explode.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("_pos", "_line"),
    ).where(F.col("_line") != "")
    lines = lines.withColumn("_lh", F.md5(F.col("_line").cast("binary")))
    frequent = (
        lines.groupBy("_lh")
        .agg(F.countDistinct(id_col).alias("_df"))
        .where(F.col("_df") >= min_df)
        .select("_lh", F.lit(True).alias("_dup"))
    )
    marked = lines.join(frequent, "_lh", "left")
    kept_text = F.concat_ws(
        line_sep,
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_dup").isNull(),
                        F.struct(F.col("_pos"), F.col("_line")),
                    )
                )
            ),
            lambda t: t["_line"],
        ),
    )
    agg = marked.groupBy(id_col).agg(
        kept_text.alias("text_dedup"),
        F.count(F.lit(1)).cast("int").alias("n_lines"),
        F.sum(F.when(F.col("_dup").isNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_lines_kept"),
    )
    return df.join(agg, id_col, "left").select(
        *df.columns,
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).alias("n_lines_kept"),
    )


def dedup_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicate-substring removal (the ExactSubstr screen of Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models Better"):
    any token span of length ≥ `min_len` that occurs at ≥ `min_count`
    positions ANYWHERE in the corpus (across documents or repeated inside
    one) is removed from every occurrence. Finer-grained than `dedup_lines`
    (no newline structure required) and exact where MinHash/SimHash are
    approximate — this is the screen that catches licence blocks, quoted
    chain-mail, and templated passages that near-dup document hashes miss.

    Detection is the standard distributed reformulation of the paper's
    suffix-array pass: every stride-1 `min_len`-token window is hashed, and
    a window hash seen ≥ `min_count` times marks all `min_len` tokens it
    covers. A duplicate span of length L ≥ min_len contributes exactly
    L − min_len + 1 matching windows in each copy, so marked windows tile
    the span completely and the merged cover equals the paper's maximal
    duplicate spans (suffix arrays don't distribute; stride-1 k-gram
    hashing trades one thin hash-per-token shuffle for that).

    Appends to each input row:
      text_dedup     — tokens outside every duplicate span, joined by a
                       single space (whitespace is normalized; '' if the
                       whole document was duplicated — rows are never
                       dropped, survivorship is the caller's policy, same
                       contract as dedup_lines/decontaminate)
      n_tokens       — whitespace tokens in the document
      n_tokens_kept  — tokens surviving the screen
      n_dup_spans    — maximal duplicate spans removed

    100-TB shape (mirrors dedup_lines, one stage denser):
      1. frequency: one shuffle of (16-byte hash, id, pos) rows — one per
         token position, the honest cost of exactness at substring
         granularity — with the count partial-aggregated map-side; window
         text never shuffles. Gram construction is O(tokens × min_len)
         chars inside WholeStageCodegen (a rolling-hash pandas variant
         would cut that constant, not the shuffle, so it stays Catalyst).
      2. screen: the duplicate-hash set (heavy-hitter-bounded: ≤ windows /
         min_count rows of one hash column) joins back onto the window
         rows; left to AQE — broadcast in the common case, shuffle-hash on
         a pathological corpus. Same deliberate non-forcing as
         decontaminate / dedup_lines.
      3. cover: per document, ONE groupBy(id) of int positions only
         (collect_list of ints, map-side-combinable; bounded by tokens per
         doc); span-merge and token filtering are row-local Catalyst folds
         on the joined row — the document text itself never leaves its row.
    """
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    k = min_len
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = df.withColumn("_toks", toks)
    n = F.size("_toks")
    win_hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda p: F.md5(
                F.concat_ws("\x1f", F.slice("_toks", p + 1, k)).cast("binary")
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = base.select(F.col(id_col), F.posexplode(win_hashes).alias("_p", "_h"))
    dup = (
        wins.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_h")
    )
    covered = (
        wins.join(dup, "_h")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("_p")).alias("_ps"))
    )
    joined = base.join(covered, id_col, "left").withColumn(
        "_ps", F.coalesce(F.col("_ps"), F.array().cast("array<int>"))
    )
    # merge sorted window starts into disjoint token intervals [lo, hi]:
    # window p covers [p, p+k-1]; touching/overlapping windows (p ≤ hi+1)
    # extend the last interval — O(spans) array rebuilds, spans ≪ tokens
    last = lambda acc: F.element_at(acc, -1)
    ivs = F.aggregate(
        F.col("_ps"),
        F.array().cast("array<struct<lo:int,hi:int>>"),
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= last(acc)["hi"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["lo"].alias("lo"),
                        (p + k - 1).cast("int").alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        p.cast("int").alias("lo"), (p + k - 1).cast("int").alias("hi")
                    )
                ),
            )
        ),
    )
    out = joined.withColumn("_ivs", ivs)
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(
            F.col("_ivs"), lambda iv: (i >= iv["lo"]) & (i <= iv["hi"])
        ),
    )
    return out.select(
        *df.columns,
        F.concat_ws(" ", kept).alias("text_dedup"),
        F.size("_toks").alias("n_tokens"),
        F.size(kept).alias("n_tokens_kept"),
        F.size("_ivs").alias("n_dup_spans"),
    )


def lm_perplexity(
    df: DataFrame,
    ref_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    max_bigrams: int | None = None,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score every document by its perplexity under an n-gram LM
    trained on a trusted reference slice — the standard web-corpus quality
    gate between the heuristic filters (repetition_profile,
    doc_quality_scores) and dedup. Low perplexity ≈ fluent in-distribution
    text; high ≈ boilerplate/garble/wrong-language.

    Model: bigram counts over `ref_df` (default: df itself — a
    self-perplexity repetitiveness signal) with add-alpha smoothing:
        P(w | prev) = (C(prev, w) + alpha) / (C(prev) + alpha * V')
    where V' = |distinct reference unigrams| + 1 (the +1 reserves unseen
    mass). Tokens are lowercase whitespace words — the point is a
    deterministic, engine-portable score, not linguistic fidelity (CCNet
    itself uses a 5-gram KenLM; the pipeline shape is identical).

    Appends to each input row:
      n_bigrams        — scored token transitions (0 for <2-token docs)
      n_unseen_bigrams — transitions absent from the reference model
      avg_logp         — mean ln P per transition, rounded 4dp (null if no
                         bigrams — rows are never dropped)
      ppl              — exp(-avg_logp), rounded 2dp (null likewise)

    100-TB shape: the model is two aggregate tables over the REFERENCE
    slice only (one thin (w1, w2) shuffle with map-side partial counts —
    document text never shuffles); `max_bigrams` caps the model via ONE
    TakeOrderedAndProject (count desc, then lexicographic — deterministic)
    so the scoring joins broadcast, which is exactly CCNet's
    train-once/broadcast-model architecture. Scoring is a per-token-pair
    explode (row-local) + two thin hash joins left to AQE + ONE
    map-side-combinable groupBy(id) of int/double partials. The vocabulary
    scalar rides a broadcast cross join — no driver collect anywhere.
    """
    ref = ref_df if ref_df is not None else df

    def _bigrams(d: DataFrame) -> DataFrame:
        t = F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda w: w != F.lit("")
        )
        d = d.select(F.col(id_col).alias("_id"), t.alias("_t"))
        n = F.size("_t")
        arr = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at("_t", i).alias("w1"),
                    F.element_at("_t", i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        return d.select("_id", F.explode(arr).alias("p")).select(
            "_id", "p.w1", "p.w2"
        )

    big = _bigrams(ref).groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    if max_bigrams is not None:
        big = big.orderBy(F.desc("cb"), "w1", "w2").limit(max_bigrams)
    ctx = big.groupBy("w1").agg(F.sum("cb").alias("cc"))
    vsz = (
        ref.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), " "),
                    lambda w: w != F.lit(""),
                )
            ).alias("w")
        )
        .agg((F.count_distinct("w") + F.lit(1)).alias("_vsz"))
    )
    logp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("cc"), F.lit(0)) + F.lit(alpha) * F.col("_vsz"))
    )
    scores = (
        _bigrams(df)
        .join(big, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vsz))
        .groupBy("_id")
        .agg(
            F.count("*").alias("_nb"),
            F.sum(F.when(F.col("cb").isNull(), 1).otherwise(0)).alias("_nu"),
            (F.sum(logp) / F.count("*")).alias("_alp"),
        )
    )
    out = df.join(scores, F.col(id_col) == F.col("_id"), "left")
    return out.select(
        *df.columns,
        F.coalesce(F.col("_nb"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("_nu"), F.lit(0)).cast("long").alias("n_unseen_bigrams"),
        F.round(F.col("_alp"), 4).alias("avg_logp"),
        F.round(F.exp(-F.col("_alp")), 2).alias("ppl"),
    )


def redact_pii(df: DataFrame, text_col: str = "text", counts: bool = False) -> DataFrame:
    """Scrub emails / phone-ish numbers / IPv4s from a text column
    (chained regexp_replace — whole-stage codegen, row-local, no shuffle).
    The pattern list is the policy surface; a real deployment extends it.

    counts=True additionally emits `_redactions` = number of replacements
    per row (useful lineage), but it runs every pattern TWICE
    (regexp_extract_all to count, then regexp_replace) — measured 1.99×
    wall on a redaction-only pass over 200k PII-dense ~1KB docs at 16
    cores (2.91 s → 5.78 s, medians of 3; BENCH/BASELINE.md §Redaction
    cost). A length-delta count would be single-pass but is unreliable
    (replacement tokens change lengths unpredictably), so counting stays
    exact and OPT-IN; the default is the single-pass scrub."""
    out = F.col(text_col)
    n = F.lit(0)
    for pat, token in PII_PATTERNS:
        if counts:
            n = n + F.coalesce(
                F.cardinality(F.regexp_extract_all(out, F.lit(pat), F.lit(0))), F.lit(0)
            )
        out = F.regexp_replace(out, pat, token)
    if counts:
        df = df.withColumn("_redactions", n.cast("int"))
    return df.withColumn(text_col, out)


def assemble_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
    max_turns: int | None = None,
) -> DataFrame:
    """Turns → training documents: one row per conversation, turns ordered
    by `idx_col` and rendered "role: text" joined by `sep`. The bridge from
    the CDC-replicated transcript table to the corpus operators above —
    dedup/quality/sampling/packing all consume documents, the lakehouse
    stores turns.

    max_turns: keep only the first `max_turns` turns of each conversation
    (the training-window truncation). Relies on the table contract that
    `idx_col` is dense and 0-based, so it compiles to a row-local
    `idx < max_turns` PREDICATE — pushed into the parquet scan (file-level
    min/max pruning skips deep-tail files entirely) and, critically,
    applied BEFORE the aggregation: a pathological million-turn
    conversation never reaches collect_list, so reduce-side memory is
    bounded by design rather than by post-agg slicing.

    Output: (conv_id, doc_text, n_turns, n_chars). Null role or text drops
    that part, not the line (concat_ws semantics, identical in DuckDB's
    string_agg oracle).

    Scale shape: one shuffle (the groupBy), and collect_list partial-
    aggregates map-side (ObjectHashAggregate), so the reduce side moves one
    packed struct array per conversation — bounded by the longest single
    conversation, never by the corpus. No window over the whole table, no
    UDFs. At 100 TB the plan is scan → partial agg → exchange(conv_id) →
    final agg, and if the table is bucketed by conv_id (the engine default)
    the exchange disappears entirely."""
    if max_turns is not None:
        turns = turns.where(F.col(idx_col) < max_turns)
    rendered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(idx_col), F.col(role_col), F.col(text_col)))
        ),
        lambda t: F.concat_ws(": ", t[role_col], t[text_col]),
    )
    return turns.groupBy(F.col(conv_col)).agg(
        F.concat_ws(sep, rendered).alias("doc_text"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    ).withColumn("n_chars", F.length("doc_text").cast("int"))


def _lineage_path(p: str) -> str:
    """Record a data location in a lineage manifest: absolutize LOCAL
    paths only — URIs (s3a://, hdfs://, …) must pass through verbatim or
    the recorded provenance points at a nonexistent local path."""
    return p if "://" in p else os.path.abspath(p)


def doc_shingles(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (key, shingle). Pure
    Catalyst (split + transform + explode) — the shared fragment under
    Jaccard dedup, MinHash signatures, and decontamination."""
    if n < 1:
        raise ValueError(f"shingle width must be >= 1, got {n}")
    expr = (
        f"array_distinct(transform(sequence(0, size(_toks) - {n}), "
        f"i -> concat_ws(' ', {', '.join(f'_toks[i+{j}]' for j in range(n))})))"
    )
    return (
        df.withColumn("_toks", F.split(F.col(text_col), " "))
        .where(F.size("_toks") >= n)
        .select(F.col(key_col), F.explode(F.expr(expr)).alias("shingle"))
    )


def minhash_signature(
    shingles: DataFrame,
    key_col: str = "doc_id",
    n_hashes: int = 8,
    with_count: bool = False,
) -> DataFrame:
    """MinHash signature per key over a (key, shingle) frame: one row per
    key with columns mh0..mh{n_hashes-1} (each the MIN md5 of the seeded
    shingle — the classic permutation-free MinHash family). ONE map-side-
    combinable hash aggregate; linear in corpus size. Shared by the batch
    LSH pipeline (driver_queries.minhash_dedup_pairs) and the incremental
    dedup index (streaming/dedup_index.py) so the two can never drift.

    with_count: also emit n_shingles (shingles are already distinct per key
    from doc_shingles, so this is the distinct-shingle count for free)."""
    aggs = [
        F.min(
            F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")).cast("binary"))
        ).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    if with_count:
        aggs.append(F.count("*").cast("int").alias("n_shingles"))
    return shingles.groupBy(key_col).agg(*aggs)


def band_buckets(
    sig: DataFrame, key_col: str = "doc_id", n_bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """LSH banding over a signature frame: (key, band_id, bucket) rows,
    bucket = md5 of the band's concatenated minhashes. ONE explode over the
    signature — never a union of per-band selects, which would re-run the
    whole shingle+minhash pipeline per band."""
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh{rows_per_band * b + r}") for r in range(rows_per_band)]
                ).cast("binary")
            ).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    return sig.select(F.col(key_col), F.explode(band_structs).alias("bb")).select(
        F.col(key_col),
        F.col("bb.band_id").alias("band_id"),
        F.col("bb.bucket").alias("bucket"),
    )


def connected_components(pairs: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """Distributed connected components by iterative min-label propagation:
    label(u) ← min({label(u)} ∪ labels(N(u))) until fixpoint. Each round is
    ONE join + ONE groupBy (map-side-combinable); the driver only checks the
    changed-row COUNT for convergence. Rounds are bounded by the component
    diameter — near-dup graphs are clique-ish, 2–3 rounds. At true web
    scale swap the loop body for alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    same per-round plan shape.

    pairs: (u, v) undirected candidate edges (one direction suffices).
    nodes: optional (node) universe; defaults to the nodes appearing in
    pairs — for dedup survivor selection that is exactly right (isolated
    docs are their own cluster and are never dropped, so they need no row).
    Returns (node, cluster_id) with cluster_id = the component's min node."""
    pairs = pairs.select(F.col(pairs.columns[0]).alias("u"),
                         F.col(pairs.columns[1]).alias("v"))
    edges = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    if nodes is None:
        nodes = edges.select(F.col("u").alias("node")).distinct()
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    labels = nodes.select("node", F.col("node").alias("label")).persist()
    try:
        while True:
            nbr = (
                edges.join(labels, edges["v"] == labels["node"])
                .groupBy(edges["u"].alias("node"))
                .agg(F.min("label").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr, "node", "left")
                .select(
                    "node",
                    F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("node", F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "doc_text",
    key_col: str = "conv_id",
    bench_text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Drop every document sharing ANY word n-gram shingle with the
    benchmark set — the standard train/eval contamination guard (13-gram
    overlap in most published pipelines; `n` is the knob). Returns the
    clean documents, schema unchanged.

    100-TB shape: eval benchmarks are tiny next to a pretraining corpus,
    so the benchmark's DISTINCT shingle set is BROADCAST; the corpus side
    pays one map-side hash semi-join to find contaminated keys and one
    broadcast anti-join to drop them — no corpus shuffle on raw shingles,
    no driver-side id materialization."""
    bench_sh = (
        doc_shingles(
            benchmark.select(
                F.monotonically_increasing_id().alias("_bid"),
                F.col(bench_text_col),
            ),
            text_col=bench_text_col, key_col="_bid", n=n,
        )
        .select("shingle")
        .distinct()
    )
    contaminated = (
        doc_shingles(docs, text_col=text_col, key_col=key_col, n=n)
        .join(F.broadcast(bench_sh), "shingle")
        .select(key_col)
        .distinct()
    )
    # the anti-join side is left unhinted: contamination is usually tiny
    # (AQE broadcasts it at runtime) but a pathological benchmark overlap
    # must not be forced through one executor's memory
    return docs.join(contaminated, key_col, "left_anti")


def snapshot_corpus(
    spark: SparkSession,
    table_path: str,
    out_path: str,
    snapshot_id: int | None = None,
    redact: bool = True,
    min_turns: int = 1,
    max_turns: int | None = None,
    doc_filter: str | None = None,
    tag: str | None = None,
    benchmark: DataFrame | str | None = None,
    benchmark_text_col: str = "text",
    decontaminate_ngram: int = 3,
    exclude_ids: DataFrame | None = None,
) -> dict:
    """Reproducible corpus export from a LIVE CDC table: pin a snapshot,
    assemble conversations, optionally redact PII, write one parquet corpus
    plus a lineage manifest (`_corpus_manifest.json`: source path,
    snapshot_id, watermark LSN, doc/turn counts, operator settings).

    The point is the pin: a training run must name the exact corpus it saw,
    but the transcript table keeps moving under CDC. Exporting
    `read(snapshot_id=...)` makes the corpus a pure function of
    (table, snapshot_id, settings) — re-running months later yields byte-
    identical documents, while the live table has moved on. This is the
    reference pipeline's "consistent extract point" (capture at one SCN)
    re-expressed at the corpus layer. Retention contract: exports stay
    reproducible while the snapshot is retained — pass `tag` (the corpus
    name) to pin the snapshot out of `expire_snapshots`' reach via
    `tag_snapshot`; re-exporting the same tag re-pins it (replace=True).

    Returns the manifest dict."""
    from data_pipeline_spark.plans.table_format import LakehouseTable

    table = LakehouseTable(table_path)
    snap = (
        table.current_snapshot()
        if snapshot_id is None
        else table.snapshot_by_id(snapshot_id)
    )
    if tag is not None:
        table.tag_snapshot(tag, snap["snapshot_id"], replace=True)
    docs = assemble_conversations(
        table.read(spark, snapshot_id=snap["snapshot_id"]), max_turns=max_turns
    )
    if min_turns > 1:
        docs = docs.where(F.col("n_turns") >= min_turns)
    n_excluded = None
    if exclude_ids is not None:
        # dedup screen: a (conv_id) frame of documents to drop — typically
        # DedupIndexJob.drop_set (near-dup clusters minus one survivor
        # each). Applied BEFORE redaction for the same raw-vs-raw reason as
        # decontaminate: the drop decisions were made on raw text. The drop
        # set is cluster-sized (tiny vs corpus): persist it, count it for
        # the manifest, and broadcast the anti-join.
        exclude_ids = exclude_ids.select("conv_id").persist()
        n_excluded = exclude_ids.count()
        docs = docs.join(F.broadcast(exclude_ids), "conv_id", "left_anti")
    persisted = None
    if benchmark is not None:
        # train/eval contamination guard, applied BEFORE redaction: the
        # benchmark texts are raw, and redacting only the corpus side
        # would rewrite every shingle within PII_PATTERNS reach of an
        # email/phone/IP — a verbatim benchmark excerpt containing PII
        # would slip the screen. Raw-vs-raw is the sound comparison.
        # The assembled docs back BOTH sides of the screen's anti-join
        # (shingle branch + kept branch), so persist them once.
        bench_df = (
            spark.read.parquet(benchmark) if isinstance(benchmark, str) else benchmark
        )
        persisted = docs.persist()
        docs = decontaminate(
            persisted, bench_df, text_col="doc_text", key_col="conv_id",
            bench_text_col=benchmark_text_col, n=decontaminate_ngram,
        )
    if redact:
        docs = redact_pii(docs, text_col="doc_text")
    if doc_filter:
        # quality gate over the assembled (post-redaction) document columns
        # — row-local predicate, recorded in the manifest for lineage
        docs = docs.where(F.expr(doc_filter))
    # manifest stats ride the WRITE job itself (Observation = accumulator
    # metrics over exactly the rows written) — no post-write re-read of the
    # corpus, and the counts can never drift from what landed on disk
    from pyspark.sql import Observation

    obs = Observation("corpus_stats")
    docs = docs.observe(obs, F.count(F.lit(1)).alias("n"), F.sum("n_turns").alias("t"))
    # deterministic file layout: repartition by the same md5-fraction used
    # everywhere (never round-robin — that's nondeterministic), sort within
    docs.repartition(F.col("conv_id")).sortWithinPartitions("conv_id").write.mode(
        "overwrite"
    ).parquet(out_path)
    if persisted is not None:
        persisted.unpersist()
    if exclude_ids is not None:
        exclude_ids.unpersist()
    stats = obs.get
    manifest = {
        "source_table": os.path.abspath(table_path),
        "snapshot_id": snap["snapshot_id"],
        "watermark_lsn": snap.get("watermark_lsn"),
        "n_docs": stats["n"],
        "n_turns": stats["t"],
        "settings": {"redact": redact, "min_turns": min_turns,
                     "max_turns": max_turns, "doc_filter": doc_filter,
                     **(
                         {"n_excluded_ids": n_excluded}
                         if n_excluded is not None
                         else {}
                     ),
                     **(
                         {
                             "decontaminated_against": (
                                 _lineage_path(benchmark)
                                 if isinstance(benchmark, str)
                                 else "<dataframe>"
                             ),
                             "decontaminate_ngram": decontaminate_ngram,
                         }
                         if benchmark is not None
                         else {}
                     )},
        "tag": tag,
    }
    with open(os.path.join(out_path, "_corpus_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    doc_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Token-budget sequence packing, pretraining style: documents are
    concatenated in a deterministic order and the stream is cut every
    `budget` tokens; a document may SPAN sequences (GPT-style pack-then-
    chunk). Emits one row per (document × sequence it touches):

        (shard, seq_id, doc_id, seq_offset, doc_offset, len)

    i.e. "tokens [doc_offset, doc_offset+len) of doc_id land in seq_id at
    seq_offset" — exactly the slice table a tokenizer-side packer consumes.

    Scale shape: packing order is (shard, doc_id) where shard =
    md5-bucket(doc_id) — each shard packs INDEPENDENTLY, so the only
    shuffle is one window sort per shard (bounded by corpus/n_shards, never
    by the corpus; raise n_shards with the corpus). A global single-order
    pack would serialize 100 TB through one partition — deliberately not
    offered. The emit is a row-multiplying explode over the spanned
    sequence ids; no UDFs, no state."""
    w = Window.partitionBy("_shard").orderBy(doc_col)
    start = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    end = start + F.col(token_col).cast("long")  # exclusive
    d = (
        docs.withColumn("_shard", F.abs(F.conv(
            F.substring(F.md5(F.col(doc_col).cast("string")), 1, 8), 16, 10
        ).cast("long")) % n_shards)
        .where(F.col(token_col) > 0)
        .withColumn("_start", start)
        .withColumn("_end", end)
        # sequence bounds from the MATERIALIZED columns (window exprs can't
        # live inside the explode's projection); last token is at _end-1
        .withColumn(
            "seq_id",
            F.explode(F.sequence(
                (F.col("_start") / budget).cast("long"),
                ((F.col("_end") - 1) / budget).cast("long"),
            )),
        )
    )
    seq_lo = F.col("seq_id") * budget
    seq_hi = seq_lo + budget
    piece_lo = F.greatest(F.col("_start"), seq_lo)
    piece_hi = F.least(F.col("_end"), seq_hi)
    return d.select(
        F.col("_shard").alias("shard"),
        "seq_id",
        F.col(doc_col),
        (piece_lo - seq_lo).cast("int").alias("seq_offset"),
        (piece_lo - F.col("_start")).cast("int").alias("doc_offset"),
        (piece_hi - piece_lo).cast("int").alias("len"),
    )
