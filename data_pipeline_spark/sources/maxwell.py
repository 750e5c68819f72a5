"""Maxwell's daemon envelope adapter (MySQL CDC JSON → canonical envelope).

Maxwell (https://maxwells-daemon.io — public format) is the other widely
deployed CDC JSON wire beside Debezium, emitted flat per record:

    {"database": "app", "table": "transcripts", "type": "insert",
     "ts": 1699999999, "xid": 4711, "commit": true,
     "position": "binlog.000006:800911",
     "data": {"conv_id": "c1", "turn_idx": 3, ...},
     "old": {"text": "previous"}}

Mapping into CHANGE_EVENT_SCHEMA:

    op       insert / bootstrap-insert → I, update → U, delete → D
    payload  `data` raw JSON text (the FULL new row image on updates —
             Maxwell's `old` holds only the columns that changed, so
             full-image decode applies directly; null for deletes)
    keys     from `data` (Maxwell deletes carry the full old row in
             `data`, so no `old` fallback is needed)
    lsn      the binlog position "file.NNNNNN:offset" encoded as
             (file_number << 32) | offset — binlog file numbers increase
             monotonically across rotation and offsets within a file, so
             the composite is the server's total order (same idea as
             MySQL GTID ordering; offsets are < 2^32 = max_binlog_size's
             1 GB ceiling). Falls back to `xid` when positions are
             disabled.
    ts       `ts` (epoch SECONDS — Maxwell, unlike Debezium, is
             second-precision)
    txn_id   `xid` (one MySQL transaction per xid; commit-ordered)
    DDL      output_ddl records ({"type": "table-alter"|..., "ddl": SQL})
             through the same SQL→descriptor translator as Debezium

Same single-pass / one-json_tuple-parse-per-level shape as the Debezium
adapter (sources/debezium.py — see BENCH/BASELINE.md §Debezium adapter
for why), and the same null-except-DDL UDF input so DML rows cross to
Python as a null bitmap only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F, types as T

from data_pipeline_spark.sources.debezium import _translate_ddl_udf

_RAW_SCHEMA = T.StructType([T.StructField("value", T.StringType(), True)])


def maxwell_to_envelope(
    raw: DataFrame,
    value_col: str = "value",
    with_txns: bool = False,
    with_table_name: bool = False,
) -> DataFrame:
    """Maxwell JSON records → CHANGE_EVENT_SCHEMA (/ TXN / MULTI order)."""
    v = F.col(value_col).cast("string")
    s1 = raw.where(v.isNotNull()).select(
        F.json_tuple(
            v, "type", "data", "old", "ts", "xid", "position", "table", "ddl"
        ).alias("_type", "_data", "_old", "_ts", "_xid", "_pos", "_table", "_ddl")
    )
    s2 = s1.select(
        "*",
        F.json_tuple(F.col("_data"), "conv_id", "turn_idx").alias("_k_conv", "_k_turn"),
        _translate_ddl_udf(F.col("_ddl")).alias("_ddl_desc"),
    )

    t = F.col("_type")
    is_ddl = t.startswith("table-") & F.col("_ddl_desc").isNotNull()
    op = (
        F.when(t.isin("insert", "bootstrap-insert"), F.lit("I"))
        .when(t == "update", F.lit("U"))
        .when(t == "delete", F.lit("D"))
        .when(is_ddl, F.lit("DDL"))
    )
    # "binlog.000006:800911" → (6 << 32) | 800911; xid fallback
    file_no = F.regexp_extract(F.col("_pos"), r"\.(\d+):", 1).cast("long")
    offset = F.regexp_extract(F.col("_pos"), r":(\d+)$", 1).cast("long")
    lsn = F.coalesce(
        F.when(
            file_no.isNotNull() & offset.isNotNull(),
            F.shiftleft(file_no, 32) + offset,
        ),
        F.col("_xid").cast("long"),
    )
    payload = (
        F.when(is_ddl, F.col("_ddl_desc"))
        .when(t == "delete", F.lit(None).cast("string"))
        .otherwise(F.col("_data"))
    )
    cols = [
        lsn.alias("lsn"),
        op.alias("op"),
        F.timestamp_seconds(F.col("_ts").cast("long")).alias("ts"),
        F.when(~is_ddl, F.col("_k_conv")).alias("conv_id"),
        F.when(~is_ddl, F.col("_k_turn")).cast("int").alias("turn_idx"),
        payload.alias("payload"),
    ]
    if with_txns:
        cols.append(F.col("_xid").cast("long").alias("txn_id"))
    if with_table_name:
        cols.insert(0, F.col("_table").alias("table_name"))
    # same skip-and-continue contract as the Debezium adapter: unknown
    # types / broken JSON (op null), and structurally-valid records with
    # no usable order (null lsn) or a key-less DML row, drop at one filter
    valid = F.col("lsn").isNotNull() & (
        (F.col("op") == "DDL")
        | (F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull())
    )
    return s2.select(*cols).where(F.col("op").isNotNull() & valid)


def read_maxwell_batch(
    spark, feed_dir: str, with_txns: bool = False, with_table_name: bool = False
) -> DataFrame:
    raw = spark.read.schema(_RAW_SCHEMA).parquet(feed_dir)
    return maxwell_to_envelope(raw, with_txns=with_txns, with_table_name=with_table_name)


def read_maxwell_stream(
    spark, feed_dir: str, max_files_per_trigger: int = 8, with_txns: bool = False,
    with_table_name: bool = False,
) -> DataFrame:
    """IngestJob `stream_reader=` plug-in (read_feed_stream signature)."""
    raw = (
        spark.readStream.schema(_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_dir)
    )
    return maxwell_to_envelope(raw, with_txns=with_txns, with_table_name=with_table_name)


# ---------------------------------------------------------------------------
# Deterministic Maxwell-format feed writer (test fixture), mirroring
# debezium.write_debezium_feed: re-encodes the canonical generator's feed.
# ---------------------------------------------------------------------------

def encode_maxwell_pandas(df, database: str = "app", table: str = "transcripts"):
    """Canonical feed rows → one-column frame of Maxwell JSON values.
    lsn maps into the binlog position (file = lsn >> 20, offset = low 20
    bits — keeps both parts realistic and the composite order exact)."""
    import pandas as pd

    from data_pipeline_spark.sources.debezium import _ddl_to_sql
    import json as _json

    op = df["op"].to_numpy()
    is_ddl = op == "DDL"
    is_d = op == "D"
    ts_s = (df["ts"].astype("int64") // 1_000_000_000).astype(str)
    file_no = (df["lsn"] // (1 << 20)).astype(str).str.zfill(6)
    offset = (df["lsn"] % (1 << 20)).astype(str)
    position = '"position":"binlog.' + file_no + ":" + offset + '"'
    xid = (
        df["txn_id"].astype(str)
        if "txn_id" in df.columns
        else pd.Series("1", index=df.index)
    )

    mtype = pd.Series(pd.NA, index=df.index, dtype="object")
    mtype[op == "I"] = "insert"
    mtype[op == "U"] = "update"
    mtype[is_d] = "delete"

    key_json = (
        '{"conv_id":"' + df["conv_id"].astype(str) + '","turn_idx":'
        + df["turn_idx"].astype("Int64").astype(str) + "}"
    )
    data = key_json.str[:-1] + "," + df["payload"].astype(str).str[1:]
    # deletes: Maxwell puts the old row (key suffices) in data
    data = data.where(~is_d, key_json)

    value = pd.Series(pd.NA, index=df.index, dtype="object")
    dml = ~is_ddl
    value[dml] = (
        '{"database":"' + database + '","table":"' + table + '","type":"'
        + mtype[dml] + '","ts":' + ts_s[dml] + ',"xid":' + xid[dml]
        + ',"commit":true,' + position[dml] + ',"data":' + data[dml] + "}"
    )
    if is_ddl.any():
        ddl_sql = df.loc[is_ddl, "payload"].map(
            lambda p: _ddl_to_sql(_json.loads(p), table)
        )
        value[is_ddl] = (
            '{"database":"' + database + '","table":"' + table
            + '","type":"table-alter","ts":' + ts_s[is_ddl] + ',"xid":'
            + xid[is_ddl] + "," + position[is_ddl] + ',"ddl":"' + ddl_sql + '"}'
        )
    return pd.DataFrame({"value": value})


def write_maxwell_feed(out_dir: str, spec, chunk_size: int | None = None, **kw):
    from data_pipeline_spark.sources.feed import generate_feed_pandas

    os.makedirs(out_dir, exist_ok=True)
    values = encode_maxwell_pandas(generate_feed_pandas(spec), **kw)
    chunk = chunk_size or spec.chunk_size
    paths = []
    for c in range(0, len(values), chunk):
        p = os.path.join(out_dir, f"chunk-{c // chunk:06d}.parquet")
        values.iloc[c: c + chunk].to_parquet(p, index=False)
        paths.append(p)
    return paths
