"""DebeziumPublishJob (streaming/publish.py): an engine table published as
Debezium chunks is consumable by a downstream engine (the hardest consumer
to satisfy — byte-for-byte table equality), survives crash-between-write-
and-cursor-commit, and never leaves stale windows behind."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.debezium import read_debezium_batch
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed
from data_pipeline_spark.streaming.ingest import IngestJob
from data_pipeline_spark.streaming.publish import DebeziumPublishJob


def _advance(spark, tmp_path, up, seed, n, batch_id):
    """New upstream activity: a feed segment with LSNs continuing past the
    table's watermark, applied under a fresh explicit batch id."""
    from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA
    from data_pipeline_spark.sources.feed import generate_feed_pandas

    feed = generate_feed_pandas(FeedSpec(n_events=n, n_convs=120, seed=seed))
    feed["lsn"] += LakehouseTable(up).current_snapshot()["watermark_lsn"]
    IngestJob(up, str(tmp_path / f"ctl_{batch_id}")).apply_batch(
        spark, batch_id, spark.createDataFrame(feed, schema=CHANGE_EVENT_SCHEMA)
    )


def _table_pd(spark, path):
    return (
        LakehouseTable(path).read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def _consume(spark, tmp_path, wire_dir, name):
    down = str(tmp_path / name)
    LakehouseTable(down).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    raw = read_debezium_batch(spark, wire_dir)
    IngestJob(down, str(tmp_path / (name + "_ctl"))).apply_batch(spark, 0, raw)
    return down


@pytest.fixture(scope="module")
def pristine_upstream(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("pub")
    feed = str(base / "feed")
    generate_feed(feed, FeedSpec(n_events=5_000, n_convs=120, seed=17, chunk_size=1_000))
    up = str(base / "up")
    LakehouseTable(up).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=3)
    job = IngestJob(up, str(base / "cu"))
    job.run_to_completion(spark, feed, str(base / "ck"), max_files_per_trigger=2)
    return up


@pytest.fixture()
def upstream(pristine_upstream, tmp_path):
    import shutil

    up = str(tmp_path / "up")
    shutil.copytree(pristine_upstream, up)
    return up


def test_publish_and_consume_round_trip(spark, tmp_path, upstream):
    wire = str(tmp_path / "wire")
    pub = DebeziumPublishJob(upstream, wire)
    n = pub.run_until_caught_up(spark)
    assert n == 1  # whole retained backlog in one window
    # caught up: second poll publishes nothing
    assert pub.poll_once(spark)["published"] is False

    down = _consume(spark, tmp_path, wire, "down")
    pd.testing.assert_frame_equal(_table_pd(spark, upstream), _table_pd(spark, down))


@pytest.mark.slow  # gate-budget: the at-least-once cursor protocol this
# drives (commit-after-write, stale-window replacement) is the same
# tail_changes contract the in-gate cascade poll_once tests pin, and the
# in-gate round-trip test keeps publish->consume equality; the full
# crash-with-advancing-upstream race runs in the slow sweep.
def test_incremental_windows_and_crash_replay(spark, tmp_path, upstream):
    """Publish, advance upstream, publish again → two chunks; then simulate
    a crash between chunk write and cursor commit and re-poll: the stale
    window is replaced, consumers converge, nothing double-counts."""
    wire = str(tmp_path / "wire")
    pub = DebeziumPublishJob(upstream, wire)
    assert pub.run_until_caught_up(spark) == 1

    _advance(spark, tmp_path, upstream, seed=18, n=2_000, batch_id=99)

    # crash simulation: publish the new window but lose the cursor commit
    cursor_before = open(pub.cursor_path).read()
    r = pub.poll_once(spark)
    assert r["published"]
    with open(pub.cursor_path, "w") as f:
        f.write(cursor_before)  # cursor never committed
    stale_files = r["chunk_files"]
    assert stale_files and all(os.path.exists(p) for p in stale_files)

    # upstream advances AGAIN before the retry, so the re-published window
    # has the same FROM but a different TO than the stale chunk
    _advance(spark, tmp_path, upstream, seed=19, n=1_000, batch_id=100)
    r2 = pub.poll_once(spark)
    assert r2["published"]
    assert r2["from_snapshot_id"] == r["from_snapshot_id"]
    assert r2["to_snapshot_id"] > r["to_snapshot_id"]
    assert not any(os.path.exists(p) for p in stale_files)  # stale replaced
    assert pub.poll_once(spark)["published"] is False

    # exactly one chunk set per committed window; consumer reproduces upstream
    windows = {fn.rsplit("-", 1)[0] for fn in os.listdir(wire)
               if fn.startswith("chunk-")}
    assert len(windows) == 2
    down = _consume(spark, tmp_path, wire, "down")
    pd.testing.assert_frame_equal(_table_pd(spark, upstream), _table_pd(spark, down))


def test_projected_publish(spark, tmp_path, upstream):
    """columns= publishes a column-allowlisted wire (keys + subset)."""
    wire = str(tmp_path / "wire")
    DebeziumPublishJob(upstream, wire, columns=["text"]).run_until_caught_up(spark)
    got = read_debezium_batch(spark, wire).orderBy("lsn").toPandas()
    import json

    sample = json.loads(got.loc[got["op"] == "I", "payload"].iloc[0])
    assert set(sample) <= {"conv_id", "turn_idx", "text"}
    assert "text" in sample
