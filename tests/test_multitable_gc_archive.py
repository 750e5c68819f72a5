"""Multi-table routing + allowlist (T2), snapshot GC, raw archive sink (K2)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob
from data_pipeline_spark.streaming.multi_table import MULTI_EVENT_SCHEMA, MultiTableIngestJob


def _tagged_multitable_feed():
    """Two tables' feeds interleaved into one log with a global LSN."""
    fa = generate_feed_pandas(FeedSpec(n_events=3_000, n_convs=60, seed=42))
    fb = generate_feed_pandas(FeedSpec(n_events=2_000, n_convs=40, seed=7))
    fa["table_name"] = "chats"
    fb["table_name"] = "agents"
    both = pd.concat([fa, fb]).sort_values("ts", kind="stable").reset_index(drop=True)
    both["lsn"] = range(1, len(both) + 1)  # global log order
    return both[["table_name", "lsn", "op", "ts", "conv_id", "turn_idx", "payload"]]


def test_multitable_routing_and_allowlist(spark, tmp_path):
    feed = _tagged_multitable_feed()
    for name in ("chats", "agents"):
        LakehouseTable(str(tmp_path / name)).create(TRANSCRIPT_SCHEMA, n_buckets=8)
    job = MultiTableIngestJob(
        {"chats": str(tmp_path / "chats"), "agents": str(tmp_path / "agents")},
        str(tmp_path / "ctl"),
        active={"chats"},  # allowlist: agents NOT replicated
    )
    sdf = spark.createDataFrame(feed, schema=MULTI_EVENT_SCHEMA)
    results = job.apply_batch(spark, 0, sdf)
    assert set(results) == {"chats"}

    # chats table equals the oracle over its slice (with the global lsn)
    chats_slice = feed[feed["table_name"] == "chats"].drop(columns=["table_name"])
    expected = reduce_feed(chats_slice)
    actual = (
        LakehouseTable(str(tmp_path / "chats")).read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert actual["text"].tolist() == expected["text"].tolist()
    # the inactive table received nothing
    assert LakehouseTable(str(tmp_path / "agents")).read(spark).count() == 0


def test_multitable_streaming_both_active(spark, tmp_path):
    feed = _tagged_multitable_feed()
    fdir = tmp_path / "feed"
    os.makedirs(fdir)
    for c in range(5):
        feed.iloc[c * 1000 : (c + 1) * 1000].to_parquet(
            str(fdir / f"chunk-{c:06d}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    for name in ("chats", "agents"):
        LakehouseTable(str(tmp_path / name)).create(TRANSCRIPT_SCHEMA, n_buckets=8)
    job = MultiTableIngestJob(
        {"chats": str(tmp_path / "chats"), "agents": str(tmp_path / "agents")},
        str(tmp_path / "ctl"),
    )
    job.run_to_completion(spark, str(fdir), str(tmp_path / "cp"), max_files_per_trigger=2)
    for name in ("chats", "agents"):
        sl = feed[feed["table_name"] == name].drop(columns=["table_name"])
        expected = reduce_feed(sl)
        actual = (
            LakehouseTable(str(tmp_path / name)).read(spark).toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        assert actual["text"].tolist() == expected["text"].tolist()


def test_expire_snapshots_gc(spark, tmp_path):
    spec = FeedSpec(n_events=6_000, n_convs=100, seed=42, chunk_size=1_500)
    fdir = str(tmp_path / "feed")
    generate_feed(fdir, spec)
    tbl_path = str(tmp_path / "t")
    LakehouseTable(tbl_path).create(TRANSCRIPT_SCHEMA, n_buckets=8, compact_every=2)
    job = IngestJob(tbl_path, str(tmp_path / "ctl"))
    for i, c in enumerate(sorted(glob.glob(fdir + "/chunk-*.parquet"))):
        job.apply_batch(spark, i, spark.read.parquet(c))
    table = LakehouseTable(tbl_path)
    before = (
        table.read(spark).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    n_files_before = len(glob.glob(tbl_path + "/data/**/*.parquet", recursive=True))
    report = table.expire_snapshots(keep_last=1)
    assert report["removed_snapshots"] > 0 and report["removed_files"] > 0
    n_files_after = len(glob.glob(tbl_path + "/data/**/*.parquet", recursive=True))
    assert n_files_after < n_files_before
    after = (
        table.read(spark).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)
    # and the oracle still holds
    expected = reduce_feed(generate_feed_pandas(spec))
    assert after["text"].tolist() == expected["text"].tolist()


def test_raw_archive_sink(spark, tmp_path):
    spec = FeedSpec(n_events=2_000, n_convs=50, seed=42, chunk_size=1_000)
    fdir = str(tmp_path / "feed")
    generate_feed(fdir, spec)
    tbl_path = str(tmp_path / "t")
    LakehouseTable(tbl_path).create(TRANSCRIPT_SCHEMA, n_buckets=8)
    job = IngestJob(tbl_path, str(tmp_path / "ctl"), archive_path=str(tmp_path / "arch"))
    job.run_to_completion(spark, fdir, str(tmp_path / "cp"), max_files_per_trigger=1)
    archived = spark.read.parquet(str(tmp_path / "arch")).toPandas()
    assert len(archived) == spec.n_events  # full replayable raw copy
    assert sorted(archived["lsn"]) == list(range(1, spec.n_events + 1))


def test_multitable_mixed_update_modes(spark, tmp_path):
    """One feed, two tables with DIFFERENT update modes: 'chats' applies
    full-row LWW, 'agents' applies the partial-image sequential fold — each
    sub-job picks up its own table's mode from the snapshot and matches its
    own oracle."""
    from data_pipeline_spark.oracle import reduce_feed, reduce_feed_sequential

    fa = generate_feed_pandas(FeedSpec(n_events=3_000, n_convs=60, seed=42))
    fb = generate_feed_pandas(FeedSpec(n_events=2_000, n_convs=40, seed=7, partial_updates=True))
    fa["table_name"] = "chats"
    fb["table_name"] = "agents"
    both = pd.concat([fa, fb]).sort_values("ts", kind="stable").reset_index(drop=True)
    # remap to one global log, keeping each table's internal order
    order = both["lsn"].copy()
    both["lsn"] = range(1, len(both) + 1)
    # re-derive per-table feeds WITH the global lsns for the oracles
    fa_g = both[both["table_name"] == "chats"].drop(columns="table_name")
    fb_g = both[both["table_name"] == "agents"].drop(columns="table_name")
    del order

    feed = tmp_path / "feed"
    feed.mkdir()
    both.to_parquet(str(feed / "chunk-0.parquet"), index=False,
                    coerce_timestamps="us", allow_truncated_timestamps=True)

    paths = {"chats": str(tmp_path / "chats"), "agents": str(tmp_path / "agents")}
    LakehouseTable(paths["chats"]).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    LakehouseTable(paths["agents"]).create(TRANSCRIPT_SCHEMA, n_buckets=4, update_mode="partial")
    mjob = MultiTableIngestJob(paths, str(tmp_path / "ctl"))
    mjob.run_to_completion(spark, str(feed), str(tmp_path / "ck"), max_files_per_trigger=1)

    got_chats = (LakehouseTable(paths["chats"]).read(spark).toPandas()
                 .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    got_agents = (LakehouseTable(paths["agents"]).read(spark).toPandas()
                  .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    exp_chats = reduce_feed(fa_g)
    exp_agents = reduce_feed_sequential(fb_g)
    assert got_chats["text"].tolist() == exp_chats["text"].tolist()
    assert got_agents["text"].tolist() == exp_agents["text"].tolist()
