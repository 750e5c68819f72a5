"""Initsync → CDC switchover: the reference's primary operational workflow
(initsync_pipe captures a consistent snapshot at source SCN X, then the CDC
applier starts from X). Here: `overwrite(..., watermark_lsn=X)` marks the
snapshot's consistent point; the streaming ingest then skips feed events at
or below X (merge's watermark filter) instead of re-applying the prefix —
and the final table must equal a from-scratch full replay exactly."""

from __future__ import annotations

import pandas as pd

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob

SPEC = FeedSpec(n_events=6_000, n_convs=120, seed=17, chunk_size=1_500)


def _final(spark, path):
    return (
        LakehouseTable(path).read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_initsync_then_stream_equals_full_replay(spark, tmp_path):
    feed = generate_feed_pandas(SPEC)
    cut = 3_000  # source-consistent point: LSN of the initsync capture
    feed_dir = str(tmp_path / "feed")
    generate_feed(feed_dir, SPEC)

    # --- simulate the source's state at LSN `cut`: apply the prefix into a
    # scratch table, read back WITH LSNs (the snapshot's per-row versions)
    scratch = str(tmp_path / "scratch")
    LakehouseTable(scratch).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    IngestJob(scratch, str(tmp_path / "sctl")).apply_batch(
        spark, 0, spark.createDataFrame(feed.iloc[:cut], CHANGE_EVENT_SCHEMA)
    )
    source_at_cut = LakehouseTable(scratch).read(spark, with_lsn=True)

    # --- initsync the real table at watermark=cut, then stream the WHOLE
    # feed from a fresh checkpoint (the extractor doesn't rewind for us)
    target = str(tmp_path / "t")
    tbl = LakehouseTable(target)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4)
    tbl.overwrite(spark, source_at_cut, watermark_lsn=int(feed.iloc[cut - 1]["lsn"]))
    assert tbl.current_snapshot()["watermark_lsn"] == cut
    job = IngestJob(target, str(tmp_path / "ctl"))
    job.run_to_completion(spark, feed_dir, str(tmp_path / "cp"), max_files_per_trigger=1)

    # --- equality vs the from-scratch full replay oracle
    expected = reduce_feed(feed)
    actual = _final(spark, target)
    assert actual["conv_id"].tolist() == expected["conv_id"].tolist()
    assert actual["text"].tolist() == expected["text"].tolist()

    # --- the prefix was genuinely SKIPPED, not re-applied: total rows
    # applied across all streamed batches < events after the cut (collapse
    # shrinks it further), and far less than the whole feed
    ctl = pd.read_parquet(str(tmp_path / "ctl"))
    applied = ctl["rows_applied"].sum()
    assert applied <= len(feed) - cut
    assert applied < len(feed) * 0.6


def test_initsync_without_watermark_still_converges(spark, tmp_path):
    """Omitting watermark_lsn re-applies the prefix over the snapshot —
    wasteful but harmless: per-row LSNs make LWW discard stale images."""
    feed = generate_feed_pandas(SPEC)
    cut = 3_000
    feed_dir = str(tmp_path / "feed")
    generate_feed(feed_dir, SPEC)

    scratch = str(tmp_path / "scratch")
    LakehouseTable(scratch).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    IngestJob(scratch, str(tmp_path / "sctl")).apply_batch(
        spark, 0, spark.createDataFrame(feed.iloc[:cut], CHANGE_EVENT_SCHEMA)
    )
    target = str(tmp_path / "t")
    tbl = LakehouseTable(target)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4)
    tbl.overwrite(spark, LakehouseTable(scratch).read(spark, with_lsn=True))
    assert (tbl.current_snapshot().get("watermark_lsn") or 0) == 0
    job = IngestJob(target, str(tmp_path / "ctl"))
    job.run_to_completion(spark, feed_dir, str(tmp_path / "cp"), max_files_per_trigger=2)

    expected = reduce_feed(feed)
    actual = _final(spark, target)
    assert actual["conv_id"].tolist() == expected["conv_id"].tolist()
    assert actual["text"].tolist() == expected["text"].tolist()


def test_multitable_initsync_switchover(spark, tmp_path):
    """initsync_all(watermark_lsns=...) then streaming the shared feed:
    every table skips its prefix and converges to the full-replay oracle."""
    import os

    from data_pipeline_spark.streaming.multi_table import (
        MULTI_EVENT_SCHEMA,
        MultiTableIngestJob,
    )

    names = ("chats", "agents")
    parts = []
    for i, name in enumerate(names):
        f = generate_feed_pandas(FeedSpec(n_events=2_000, n_convs=50, seed=40 + i))
        f["table_name"] = name
        parts.append(f)
    feed = pd.concat(parts).sort_values("ts", kind="stable").reset_index(drop=True)
    feed["lsn"] = range(1, len(feed) + 1)
    feed = feed[["table_name", "lsn", "op", "ts", "conv_id", "turn_idx", "payload"]]
    cut = 2_000  # global LSN of the multi-table capture point

    # source state at the cut, per table (scratch applies of each prefix)
    sources, marks = {}, {}
    for name in names:
        scratch = str(tmp_path / f"scratch-{name}")
        LakehouseTable(scratch).create(TRANSCRIPT_SCHEMA, n_buckets=4)
        prefix = feed.iloc[:cut]
        sl = prefix[prefix["table_name"] == name].drop(columns=["table_name"])
        IngestJob(scratch, str(tmp_path / f"sctl-{name}")).apply_batch(
            spark, 0, spark.createDataFrame(sl, CHANGE_EVENT_SCHEMA)
        )
        sources[name] = LakehouseTable(scratch).read(spark, with_lsn=True)
        marks[name] = cut

    tables = {}
    for name in names:
        p = str(tmp_path / "tables" / name)
        LakehouseTable(p).create(TRANSCRIPT_SCHEMA, n_buckets=4)
        tables[name] = p
    router = MultiTableIngestJob(tables, str(tmp_path / "ctl"))
    reports = router.initsync_all(spark, sources, watermark_lsns=marks)
    assert all(r["ok"] for r in reports.values())

    fdir = str(tmp_path / "feed")
    os.makedirs(fdir)
    feed.to_parquet(os.path.join(fdir, "chunk-000000.parquet"), index=False,
                    coerce_timestamps="us", allow_truncated_timestamps=True)
    router.run_to_completion(spark, fdir, str(tmp_path / "cp"))

    for name in names:
        sl = feed[(feed["table_name"] == name) & (feed["op"] != "DDL")].drop(
            columns=["table_name"]
        )
        expected = reduce_feed(sl.reset_index(drop=True))
        actual = _final(spark, tables[name])
        assert actual["text"].tolist() == expected["text"].tolist(), name


def test_switchover_watermark_never_regresses(spark, tmp_path):
    """overwrite(watermark_lsn=X) with X below the table's current watermark
    keeps the higher one (a re-initsync cannot reopen already-applied LSNs
    to duplicate delivery)."""
    target = str(tmp_path / "t")
    tbl = LakehouseTable(target)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4)
    df = spark.createDataFrame(
        [(500, "I", "c1", 0, "user", "hello", None, None)],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    tbl.merge(spark, batch_id=0, changes=df)
    assert tbl.current_snapshot()["watermark_lsn"] == 500
    tbl.overwrite(spark, tbl.read(spark, with_lsn=True), watermark_lsn=100)
    assert tbl.current_snapshot()["watermark_lsn"] == 500
