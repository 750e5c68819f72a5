"""Last-writer-wins dedup by LSN — the engine's core ordering operator.

The reference guarantees per-key apply order by being strictly sequential
(single applier process executing DML in LSN order — data_pipeline/applier/
applier.py, SURVEY.md §2 T5). With full-row images that ordering reduces to
"the max-LSN op per key wins", which parallelizes perfectly: a window
`row_number() OVER (PARTITION BY key ORDER BY lsn DESC)` per micro-batch.

Skew: a hot conv_id (north rule: one key can carry 30% of a batch) makes one
window partition giant. The salted two-phase variant first reduces within
(key, salt) groups — salt = pmod(xxhash64(lsn), S) spreads a hot key over S
reducers — then takes the global top-1 over the (at most S per key) survivors.
AQE skew-join splitting is the safety net; salting makes it explicit.

Tie-break (LSNs are unique in a real log; defined anyway so the operator is
total): delete > update > insert, then commit ts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def op_rank_expr(op_col: str = "op") -> Column:
    return (
        F.when(F.col(op_col) == "D", F.lit(2))
        .when(F.col(op_col) == "U", F.lit(1))
        .otherwise(F.lit(0))
    )


def _order_cols(df: DataFrame, lsn_col: str) -> list[Column]:
    cols = [F.col(lsn_col).desc()]
    if "op" in df.columns:
        cols.append(op_rank_expr().desc())
    return cols


def lww_collapse_agg(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    lsn_col: str = "lsn",
) -> DataFrame:
    """LWW collapse as ONE max-of-struct groupBy — keeps exactly the
    max-(lsn, op_rank) row per key, tombstones included (same contract as
    `lww_dedup`), as a declarative aggregate instead of a window. The plan
    is a partial+final aggregate around one Exchange (struct-typed buffers
    compile to SortAggregate — a sort on the GROUP KEY only): map-side
    partial aggregation collapses duplicate/hot keys in every map partition
    before the shuffle, whereas the window must co-locate rows and sort by
    (key, lsn DESC, op_rank DESC) on both sides of its WindowGroupLimit.

    Measured on the 16M-event hot-key replay, this is both faster and
    better-scaling than the window at low core counts (1→4 cores: the
    window's collapse stage scaled at 0.53 efficiency, this at ~0.9; probe
    numbers in BENCH/BASELINE.md). The window variant remains for the
    salted two-phase path and as the rank-k generalization.

    Struct comparison is lexicographic on (lsn, op_rank, …) — exactly the
    LWW total order; payload fields sit after the tie-break fields so they
    never influence the winner."""
    key_cols = list(keys)
    payload = [c for c in df.columns if c not in key_cols]
    ordered = [lsn_col] + (["op"] if "op" in df.columns else [])
    rest = [c for c in payload if c not in ordered]
    packed = df.select(
        *key_cols,
        F.struct(
            F.col(lsn_col),
            op_rank_expr().alias("_opr") if "op" in df.columns else F.lit(0).alias("_opr"),
            *[F.col(c) for c in ordered[1:]],
            *[F.col(c) for c in rest],
        ).alias("_s"),
    )
    winner = packed.groupBy(*key_cols).agg(F.max("_s").alias("_s"))
    return winner.select(
        F.col(f"_s.{lsn_col}").alias(lsn_col),
        *[F.col(f"_s.{c}").alias(c) for c in ordered[1:]],
        *[F.col(k) for k in key_cols],
        *[F.col(f"_s.{c}").alias(c) for c in rest],
    )


def lww_dedup(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    lsn_col: str = "lsn",
    salt: int | None = None,
) -> DataFrame:
    """Keep exactly one row per key: the max-(lsn, op_rank) one.

    salt=None → single window (one shuffle on the keys).
    salt=S    → two-phase: pre-reduce within (keys, salt) buckets, then the
                global top-1; use for hot-key-skewed batches.
    """
    key_cols = [F.col(k) for k in keys]
    if salt and salt > 1:
        salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(salt)))
        w1 = Window.partitionBy(*key_cols, F.col("_salt")).orderBy(*_order_cols(df, lsn_col))
        phase1 = (
            salted.withColumn("_rn", F.row_number().over(w1))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_salt")
        )
        df = phase1
    w = Window.partitionBy(*key_cols).orderBy(*_order_cols(df, lsn_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
