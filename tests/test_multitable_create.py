"""Mid-feed CREATE TABLE replication + single-pass batch routing
(VERDICT round 1, next-round #5; reference: dynamic table discovery from
source_system_profile + CREATE TABLE DDL replication — SURVEY.md §2 T8).
"""

from __future__ import annotations

import json
import os

import duckdb
import pandas as pd

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.multi_table import (
    MULTI_EVENT_SCHEMA,
    MultiTableIngestJob,
)

TRANSCRIPT_DDL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _feed_with_midstream_create():
    """A 'chats' feed where table 'agents' is CREATEd by a DDL event halfway
    through the log; agents rows only appear after its create LSN."""
    fa = generate_feed_pandas(FeedSpec(n_events=3_000, n_convs=60, seed=42))
    fa["table_name"] = "chats"
    fb = generate_feed_pandas(FeedSpec(n_events=1_500, n_convs=30, seed=7))
    fb["table_name"] = "agents"
    create = pd.DataFrame(
        [{
            "table_name": "agents",
            "op": "DDL",
            "ts": None,
            "conv_id": None,
            "turn_idx": None,
            "payload": json.dumps({
                "action": "create_table",
                "schema": TRANSCRIPT_DDL,
                "n_buckets": 8,
            }),
        }]
    )
    # order: first half of chats, CREATE TABLE agents, then the interleave
    head = fa.iloc[:1500]
    tail = pd.concat([fa.iloc[1500:], fb]).sort_values("ts", kind="stable")
    feed = pd.concat([head, create, tail], ignore_index=True)
    feed["lsn"] = range(1, len(feed) + 1)
    return feed[["table_name", "lsn", "op", "ts", "conv_id", "turn_idx", "payload"]]


def _write_chunks(feed, fdir, n=6):
    os.makedirs(fdir)
    step = (len(feed) + n - 1) // n
    for c in range(n):
        feed.iloc[c * step : (c + 1) * step].to_parquet(
            os.path.join(fdir, f"chunk-{c:06d}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )


def test_create_table_mid_feed_replicates_and_matches_oracle(spark, tmp_path):
    feed = _feed_with_midstream_create()
    fdir = str(tmp_path / "feed")
    _write_chunks(feed, fdir)
    LakehouseTable(str(tmp_path / "tables" / "chats")).create(TRANSCRIPT_SCHEMA, n_buckets=8)
    job = MultiTableIngestJob(
        {"chats": str(tmp_path / "tables" / "chats")},
        str(tmp_path / "ctl"),
        table_root=str(tmp_path / "tables"),
    )
    job.run_to_completion(spark, fdir, str(tmp_path / "cp"), max_files_per_trigger=2)

    # the mid-feed table exists, is registered, and replicated
    assert "agents" in job.jobs and "agents" in job.active
    agents = LakehouseTable(str(tmp_path / "tables" / "agents"))
    assert agents.exists()

    # final state of BOTH tables vs a DuckDB oracle over the raw feed
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
            LakehouseTable(str(tmp_path / "tables" / name)).read(spark).toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        assert actual["conv_id"].tolist() == oracle["conv_id"].tolist()
        assert actual["text"].tolist() == oracle["text"].tolist()

    # agents' pandas-oracle cross-check too (same reducer the e2e suites use)
    sl = feed[(feed["table_name"] == "agents") & (feed["op"] != "DDL")].drop(
        columns=["table_name"]
    )
    expected = reduce_feed(sl.reset_index(drop=True))
    actual = (
        agents.read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert actual["text"].tolist() == expected["text"].tolist()


def test_create_table_idempotent_under_replay(spark, tmp_path):
    """Replaying the batch containing create_table (checkpoint redelivery)
    must not fail or duplicate: the create short-circuits on the existing
    directory and the merge skips by batch_id."""
    feed = _feed_with_midstream_create()
    LakehouseTable(str(tmp_path / "tables" / "chats")).create(TRANSCRIPT_SCHEMA, n_buckets=8)
    job = MultiTableIngestJob(
        {"chats": str(tmp_path / "tables" / "chats")},
        str(tmp_path / "ctl"),
        table_root=str(tmp_path / "tables"),
    )
    sdf = spark.createDataFrame(feed, schema=MULTI_EVENT_SCHEMA)
    job.apply_batch(spark, 0, sdf)
    rows_before = LakehouseTable(str(tmp_path / "tables" / "agents")).read(spark).count()
    r2 = job.apply_batch(spark, 0, sdf)  # full replay of the same batch
    assert r2["agents"]["skipped"] and r2["chats"]["skipped"]
    assert (
        LakehouseTable(str(tmp_path / "tables" / "agents")).read(spark).count()
        == rows_before
    )


def test_routing_reads_cached_batch_not_files(spark, tmp_path):
    """Single-pass routing: per-table slices are filters over the persisted
    micro-batch (InMemoryTableScan), not re-scans of the source files —
    the same construction apply_batch uses."""
    feed = _feed_with_midstream_create()
    fdir = str(tmp_path / "feed")
    _write_chunks(feed, fdir)
    raw = spark.read.schema(MULTI_EVENT_SCHEMA).parquet(fdir)
    cached = raw.persist()
    try:
        cached.count()  # materialize
        from pyspark.sql import functions as F

        sub = cached.where(F.col("table_name") == "chats").drop("table_name")
        plan = sub._jdf.queryExecution().executedPlan().toString()
        # the slice reads the cache; the FileScan that may appear below it is
        # the InMemoryRelation's lineage printout, not an executed re-scan
        assert "InMemoryTableScan" in plan
    finally:
        cached.unpersist()


def test_initsync_all_parallel(spark, tmp_path):
    """Parallel multi-table initsync (reference initsync_pipe's per-table
    worker pool → concurrent Spark job submission): every table snapshot-
    loaded and verified in one call."""
    from pyspark.sql import functions as F

    from data_pipeline_spark.streaming.multi_table import MultiTableIngestJob

    tables = {}
    sources = {}
    for name, n in (("chats", 500), ("agents", 300), ("evals", 200)):
        path = str(tmp_path / "tables" / name)
        LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4)
        tables[name] = path
        sources[name] = (
            spark.range(n)
            .select(
                F.concat(F.lit(f"{name}-"), F.col("id")).alias("conv_id"),
                (F.col("id") % 7).cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.concat(F.lit("text "), F.col("id")).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit(None).cast("timestamp").alias("ts"),
            )
        )
    job = MultiTableIngestJob(tables, str(tmp_path / "ctl"))
    reports = job.initsync_all(spark, sources)
    assert set(reports) == {"chats", "agents", "evals"}
    assert all(r["ok"] for r in reports.values())
    for name, n in (("chats", 500), ("agents", 300), ("evals", 200)):
        assert LakehouseTable(tables[name]).read(spark).count() == n


def test_multitable_ddl_fanout(spark, tmp_path):
    """add_column DDL tagged for ONE table in a shared feed evolves only
    that table (the router's single DDL sweep fans rows out per table)."""
    import json as _json

    from data_pipeline_spark.streaming.multi_table import (
        MULTI_EVENT_SCHEMA,
        MultiTableIngestJob,
    )

    for name in ("chats", "agents"):
        LakehouseTable(str(tmp_path / name)).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    job = MultiTableIngestJob(
        {"chats": str(tmp_path / "chats"), "agents": str(tmp_path / "agents")},
        str(tmp_path / "ctl"),
    )
    rows = [
        ("chats", 1, "I", None, "c1", 0, '{"role": "user", "text": "a"}'),
        ("agents", 2, "I", None, "a1", 0, '{"role": "user", "text": "b"}'),
        ("chats", 3, "DDL", None, None, None,
         _json.dumps({"action": "add_column", "name": "tokens", "type": "int"})),
        ("chats", 4, "U", None, "c1", 0, '{"text": "a2", "tokens": 9}'),
    ]
    sdf = spark.createDataFrame(rows, schema=MULTI_EVENT_SCHEMA)
    job.apply_batch(spark, 0, sdf)
    chats = LakehouseTable(str(tmp_path / "chats"))
    agents = LakehouseTable(str(tmp_path / "agents"))
    assert "tokens" in [f.name for f in chats.schema_struct().fields]
    assert "tokens" not in [f.name for f in agents.schema_struct().fields]
    out = chats.read(spark).toPandas()
    assert out.loc[0, "text"] == "a2" and int(out.loc[0, "tokens"]) == 9
