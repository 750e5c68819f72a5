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
