"""MERGE reconcile: existing rows ⊎ changeset → surviving rows.

Pure DataFrame → DataFrame operator (storage-agnostic; `plans.table_format`
wires it to the COW write path). Semantically this is the reference's apply
loop — INSERT/UPDATE/DELETE per key in LSN order (data_pipeline/applier/
applier.py, SURVEY.md §2 K3/T5) — collapsed into one last-writer-wins
reduction.

Implemented as max-of-struct aggregation, NOT a window: `groupBy(key).agg(
max(struct(lsn, op_rank, …)))` gets map-side partial aggregation, so
duplicate/hot keys collapse before the shuffle — a window (row_number) ships
every row of a hot key to a single reducer first. Struct comparison is
lexicographic on (lsn, op_rank), i.e. exactly the LWW total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _op_rank() -> Column:
    return (
        F.when(F.col("op") == "D", F.lit(2))
        .when(F.col("op") == "U", F.lit(1))
        .otherwise(F.lit(0))
    )


def merge_changeset(
    existing: DataFrame | None,
    changes: DataFrame,
    data_cols: list[str],
    keys: tuple[str, str] = ("conv_id", "turn_idx"),
    extra_cols: tuple[str, ...] = ("_bucket",),
) -> DataFrame:
    """existing: (lsn, op='I', *data_cols, *extra_cols) or None;
    changes: (lsn, op, *data_cols, *extra_cols).
    Returns surviving rows: (*extra_cols, lsn, *data_cols), deletes dropped.
    """
    both = existing.unionByName(changes) if existing is not None else changes
    key_cols = list(keys)
    payload_cols = [c for c in data_cols if c not in key_cols]
    packed = both.select(
        *[F.col(k) for k in key_cols],
        F.struct(
            F.col("lsn"),
            _op_rank().alias("_opr"),
            F.col("op"),
            *[F.col(c) for c in extra_cols],
            *[F.col(c) for c in payload_cols],
        ).alias("_s"),
    )
    winner = packed.groupBy(*key_cols).agg(F.max("_s").alias("_s"))
    return winner.where(F.col("_s.op") != "D").select(
        *[F.col(f"_s.{c}").alias(c) for c in extra_cols],
        F.col("_s.lsn").alias("lsn"),
        *[F.col(k) for k in key_cols],
        *[F.col(f"_s.{c}").alias(c) for c in payload_cols],
    )
