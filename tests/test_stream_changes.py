"""Streaming CDC-out: `stream_changes` tails the table's delta layer live
and must agree with the exact batch changelog (`read_changes`) on the set
of change rows; compaction folds deltas into base files without the stream
re-emitting them.
"""

from __future__ import annotations

import glob
import os

import pandas as pd

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed
from data_pipeline_spark.streaming.ingest import IngestJob

SPEC = FeedSpec(n_events=8_000, n_convs=150, seed=11, chunk_size=2_000)


def _drain(stream_df, tmp_path, name):
    out = str(tmp_path / f"sink-{name}")
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    files = glob.glob(os.path.join(out, "*.parquet"))
    return (
        pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if files
        else pd.DataFrame()
    )


def test_stream_changes_matches_batch_changelog(spark, tmp_path):
    feed = str(tmp_path / "feed")
    generate_feed(feed, SPEC)
    tbl_path = str(tmp_path / "t")
    LakehouseTable(tbl_path).create(TRANSCRIPT_SCHEMA, n_buckets=8, compact_every=10**9)
    job = IngestJob(tbl_path, str(tmp_path / "ctl"))
    job.run_to_completion(spark, feed, str(tmp_path / "cp"), max_files_per_trigger=2)
    tbl = LakehouseTable(tbl_path)

    streamed = _drain(tbl.stream_changes(spark), tmp_path, "s1")
    batch = tbl.read_changes(spark, 0).toPandas()

    key = ["lsn", "_change_op", "conv_id", "turn_idx"]
    s = streamed[key + ["text"]].sort_values("lsn").reset_index(drop=True)
    b = batch[key + ["text"]].sort_values("lsn").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, b)
    assert (s["_change_op"] == "D").any()  # tombstones flow too


def test_stream_changes_rename_projects_by_field_id(spark, tmp_path):
    """VERDICT r2 #4: delta files written BEFORE a rename_column must surface
    their values under the CURRENT name in a fresh-checkpoint tail — equal to
    the batch changelog's field-id projection, not null."""
    import json

    from pyspark.sql import functions as F

    tbl_path = str(tmp_path / "t")
    LakehouseTable(tbl_path).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    job = IngestJob(tbl_path, str(tmp_path / "ctl"))

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "lsn long, op string, ts timestamp, conv_id string, turn_idx int, payload string",
        )

    # batch 0: rows under the ORIGINAL column name `tool`
    job.apply_batch(spark, 0, batch([
        (1, "I", None, "c1", 0, json.dumps({"role": "user", "text": "a", "tool": "grep"})),
        (2, "I", None, "c2", 0, json.dumps({"role": "user", "text": "b", "tool": "sed"})),
    ]))
    # batch 1: rename tool -> tool_name, then more rows under the new name
    job.apply_batch(spark, 1, batch([
        (3, "DDL", None, None, None,
         json.dumps({"action": "rename_column", "old": "tool", "new": "tool_name"})),
        (4, "I", None, "c3", 0, json.dumps({"role": "user", "text": "c", "tool_name": "awk"})),
        (5, "U", None, "c1", 0, json.dumps({"text": "a2", "tool_name": "rg"})),
    ]))
    tbl = LakehouseTable(tbl_path)

    streamed = _drain(tbl.stream_changes(spark), tmp_path, "ren")
    batch_log = tbl.read_changes(spark, 0).toPandas()

    cols = ["lsn", "_change_op", "conv_id", "turn_idx", "text", "tool_name"]
    s = streamed[cols].sort_values("lsn").reset_index(drop=True)
    b = batch_log[cols].sort_values("lsn").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, b)
    # pre-rename values actually flow under the new name (the r2 gap: null)
    assert s.set_index("lsn").loc[1, "tool_name"] == "grep"
    assert s.set_index("lsn").loc[2, "tool_name"] == "sed"
    assert s.set_index("lsn").loc[4, "tool_name"] == "awk"

    # a historical-name COLLISION: re-add a fresh column named `tool`;
    # old files' `tool` values must keep flowing to tool_name (field id),
    # while the new `tool` column reads null for rows that never set it
    job.apply_batch(spark, 2, batch([
        (6, "DDL", None, None, None,
         json.dumps({"action": "add_column", "name": "tool", "type": "string"})),
        (7, "I", None, "c4", 0,
         json.dumps({"role": "user", "text": "d", "tool": "NEW", "tool_name": "cut"})),
    ]))
    streamed2 = _drain(tbl.stream_changes(spark), tmp_path, "ren2")
    s2 = streamed2.sort_values("lsn").set_index("lsn")
    assert s2.loc[1, "tool_name"] == "grep" and pd.isna(s2.loc[1, "tool"])
    assert s2.loc[7, "tool_name"] == "cut" and s2.loc[7, "tool"] == "NEW"
    b2 = tbl.read_changes(spark, 0).toPandas().sort_values("lsn").set_index("lsn")
    cols2 = ["_change_op", "conv_id", "turn_idx", "text", "tool_name", "tool"]
    pd.testing.assert_frame_equal(s2[cols2], b2[cols2])


def test_stream_changes_across_widen(spark, tmp_path):
    """Delta files written before a widen_type store the narrow physical
    type (int32 turn_idx); the stream declares the current (widened) type —
    Spark 4's parquet type-widening read must surface them correctly, equal
    to the batch changelog."""
    import json

    tbl_path = str(tmp_path / "t")
    LakehouseTable(tbl_path).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    job = IngestJob(tbl_path, str(tmp_path / "ctl"))

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "lsn long, op string, ts timestamp, conv_id string, turn_idx int, payload string",
        )

    job.apply_batch(spark, 0, batch([
        (1, "I", None, "c1", 7, json.dumps({"role": "user", "text": "narrow"})),
    ]))
    # post-widen events arrive with a 64-bit key in the envelope
    wide = spark.createDataFrame(
        [
            (2, "DDL", None, None, None,
             json.dumps({"action": "widen_type", "name": "turn_idx", "to": "long"})),
            (3, "I", None, "c2", 2**31 + 5, json.dumps({"role": "user", "text": "wide"})),
        ],
        "lsn long, op string, ts timestamp, conv_id string, turn_idx long, payload string",
    )
    job.apply_batch(spark, 1, wide)
    tbl = LakehouseTable(tbl_path)
    streamed = _drain(tbl.stream_changes(spark), tmp_path, "widen")
    s = streamed.sort_values("lsn").set_index("lsn")
    assert int(s.loc[1, "turn_idx"]) == 7          # narrow file, widened read
    assert int(s.loc[3, "turn_idx"]) == 2**31 + 5  # value needing the widen
    b = tbl.read_changes(spark, 0).toPandas().sort_values("lsn").set_index("lsn")
    cols = ["_change_op", "conv_id", "turn_idx", "text"]
    pd.testing.assert_frame_equal(s[cols], b[cols])


def test_stream_changes_compaction_emits_nothing_new(spark, tmp_path):
    """Compaction folds deltas into base files (no _del= dirs) — a stream
    that has already consumed the deltas sees NOTHING new from compaction;
    once expire_snapshots physically removes the folded delta files, even a
    fresh-checkpoint tail starts empty."""
    feed = str(tmp_path / "feed")
    generate_feed(feed, SPEC)
    tbl_path = str(tmp_path / "t")
    LakehouseTable(tbl_path).create(TRANSCRIPT_SCHEMA, n_buckets=8, compact_every=10**9)
    job = IngestJob(tbl_path, str(tmp_path / "ctl"))
    job.run_to_completion(spark, feed, str(tmp_path / "cp"), max_files_per_trigger=2)
    tbl = LakehouseTable(tbl_path)

    before = _drain(tbl.stream_changes(spark), tmp_path, "pre")
    assert len(before) > 0
    tbl.compact(spark)
    # same checkpoint, drained again after compaction: the cumulative sink
    # grows by zero rows (the new base files are invisible to the delta glob)
    again = _drain(tbl.stream_changes(spark), tmp_path, "pre")
    assert len(again) == len(before)
    # GC the folded delta files: a brand-new consumer now starts empty
    tbl.expire_snapshots(keep_last=1)
    fresh = _drain(tbl.stream_changes(spark), tmp_path, "post")
    assert len(fresh) == 0
