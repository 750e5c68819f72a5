"""Canonical schemas for the CDC engine.

The change-record envelope mirrors the reference's change record
(op, table, lsn, commit_ts, pk, column images — reference:
data_pipeline/extractor/* serialization, SURVEY.md §1.1) re-expressed as a
columnar Spark StructType. The transcripts table shape is authoritative from
``BASELINE.json.input_hint``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Change-event feed (the binlog/WAL-style input the engine tails).
# One row per captured DML/DDL op; `lsn` is the global total order.
# `payload` is the JSON-encoded full row image for I/U, null for D, and a
# DDL descriptor for op='DDL'.
# ---------------------------------------------------------------------------
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), nullable=False),
        T.StructField("op", T.StringType(), nullable=False),  # I | U | D | DDL
        T.StructField("ts", T.TimestampType(), nullable=True),
        T.StructField("conv_id", T.StringType(), nullable=True),  # null for DDL
        T.StructField("turn_idx", T.IntegerType(), nullable=True),  # null for DDL
        T.StructField("payload", T.StringType(), nullable=True),
    ]
)

# Envelope extension for transaction-consistent ingest (streaming/txn.py):
# `txn_id` is the commit ordinal of the source transaction (LogMiner
# COMMITTED_DATA_ONLY exposes this as the commit SCN — transactions arrive
# whole, in commit order, each spanning one contiguous LSN range). Optional:
# feeds without it ingest exactly as before; parquet chunks lacking the
# column read as null under this schema, which the aligner passes through.
TXN_EVENT_SCHEMA = T.StructType(
    CHANGE_EVENT_SCHEMA.fields + [T.StructField("txn_id", T.LongType(), nullable=True)]
)

# ---------------------------------------------------------------------------
# Target table: multi-turn conversation transcripts (BASELINE.json input_hint)
# MERGE key: (conv_id, turn_idx).  `_lsn` is an engine-managed hidden column
# persisted in data files so later merges can reconcile by LSN.
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=True),
    ]
)

MERGE_KEY = ("conv_id", "turn_idx")
LSN_COL = "_lsn"  # hidden engine column persisted with table rows

# Decoded change record = transcript columns + envelope bits the merge needs.
def decoded_schema(table_schema: T.StructType) -> T.StructType:
    """Schema produced by the decode stage for a given table schema version."""
    fields = [
        T.StructField("lsn", T.LongType(), nullable=False),
        T.StructField("op", T.StringType(), nullable=False),
    ]
    fields.extend(table_schema.fields)
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Control table (lineage + metrics, one row per micro-batch per partition) —
# the analog of the reference's process_control / process_control_detail
# audit schema (reference: data_pipeline/audit/*, SURVEY.md §1.1).
# ---------------------------------------------------------------------------
CONTROL_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), nullable=False),
        T.StructField("partition_id", T.IntegerType(), nullable=False),
        T.StructField("rows_applied", T.LongType(), nullable=False),
        T.StructField("rows_deleted", T.LongType(), nullable=False),
        T.StructField("watermark_lsn", T.LongType(), nullable=True),
        T.StructField("skew_ratio", T.DoubleType(), nullable=True),
        T.StructField("wall_ms", T.LongType(), nullable=False),
        T.StructField("committed_at", T.TimestampType(), nullable=False),
    ]
)

# Total order for LWW tie-breaks when two ops share an LSN for one key
# (cannot happen in the reference — LSNs are unique per source log — but we
# define it so the engine is total: delete beats update beats insert).
OP_RANK = {"I": 0, "U": 1, "D": 2}
