"""Multi-table Debezium routing: one Debezium topic carrying several
tables' changes (source.table per record) — including a mid-feed CREATE
TABLE schema-change record — routed by MultiTableIngestJob via
read_debezium_multi_stream, landing the same tables as the native feed."""

from __future__ import annotations

import json
import os

import pandas as pd

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.debezium import (
    encode_debezium_pandas,
    read_debezium_multi_stream,
)
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.multi_table import MultiTableIngestJob

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _multi_feed():
    """A 'chats' feed where table 'agents' is CREATEd mid-log (same shape
    as test_multitable_create's fixture)."""
    fa = generate_feed_pandas(FeedSpec(n_events=2_400, n_convs=50, seed=42))
    fa["table_name"] = "chats"
    fb = generate_feed_pandas(FeedSpec(n_events=1_200, n_convs=25, seed=7))
    fb["table_name"] = "agents"
    create = pd.DataFrame(
        [{
            "table_name": "agents",
            "op": "DDL",
            "ts": fa["ts"].iloc[1200],  # real ts: the encoder stamps ts_ms
            "conv_id": None,
            "turn_idx": None,
            "payload": json.dumps(
                {"action": "create_table", "schema": TRANSCRIPT_DDL}
            ),
        }]
    )
    head = fa.iloc[:1200]
    tail = pd.concat([fa.iloc[1200:], fb]).sort_values("ts", kind="stable")
    feed = pd.concat([head, create, tail], ignore_index=True)
    feed["lsn"] = range(1, len(feed) + 1)
    return feed[["table_name", "lsn", "op", "ts", "conv_id", "turn_idx", "payload"]]


def _write_debezium(feed, fdir, n=4):
    os.makedirs(fdir)
    values = encode_debezium_pandas(feed, table_col="table_name")
    step = (len(values) + n - 1) // n
    for c in range(n):
        values.iloc[c * step: (c + 1) * step].to_parquet(
            os.path.join(fdir, f"chunk-{c:06d}.parquet"), index=False
        )


def _run(spark, tmp_path, fdir, label, stream_reader=None):
    root = str(tmp_path / f"tables_{label}")
    chats = os.path.join(root, "chats")
    LakehouseTable(chats).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    job = MultiTableIngestJob(
        {"chats": chats},
        str(tmp_path / f"ctl_{label}"),
        table_root=root,
        create_defaults={"n_buckets": 4},
    )
    job.run_to_completion(
        spark, fdir, str(tmp_path / f"cp_{label}"),
        max_files_per_trigger=2, stream_reader=stream_reader,
    )
    return root, job


def test_multi_table_debezium_matches_oracle(spark, tmp_path):
    """The Debezium arm is checked against an INDEPENDENT DuckDB oracle
    over the raw (pre-encoding) feed — the same reducer
    test_multitable_create pins the native reader with, so native ≡ oracle
    ≡ debezium without paying a second streaming run; single-table
    native-vs-debezium byte equality lives in test_debezium_adapter."""
    import duckdb

    feed = _multi_feed()
    dbz_dir = str(tmp_path / "dbz")
    _write_debezium(feed, dbz_dir)

    dbz_root, job = _run(
        spark, tmp_path, dbz_dir, "dbz", stream_reader=read_debezium_multi_stream
    )

    # the mid-feed CREATE TABLE replicated through the SQL round trip
    assert "agents" in job.jobs and "agents" in job.active
    con = duckdb.connect()
    con.register("feed", feed)
    for name in ("chats", "agents"):
        oracle = con.execute(
            """
            WITH ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM feed WHERE table_name = ? AND op != 'DDL'
            )
            SELECT conv_id, turn_idx,
                   json_extract_string(payload, '$.text') AS text
            FROM ranked WHERE rn = 1 AND op != 'D'
            ORDER BY conv_id, turn_idx
            """,
            [name],
        ).df()
        actual = (
            LakehouseTable(os.path.join(dbz_root, name)).read(spark).toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        assert len(actual) > 0
        assert actual["conv_id"].tolist() == oracle["conv_id"].tolist()
        assert actual["turn_idx"].tolist() == [int(t) for t in oracle["turn_idx"]]
        assert actual["text"].tolist() == oracle["text"].tolist()
