"""Timestamp time travel (snapshot_as_of / read(as_of_ts=)) and metadata
inspection tables (inspect('snapshots'|'files'|'manifests'|'refs')).

Time-travel resolution is Iceberg's TIMESTAMP AS OF: the latest retained
snapshot committed at or before the requested time; asking for a time before
the oldest retained snapshot raises (expired history needs a pinned tag).
Metadata tables are driver-built, O(retained metadata), zero data I/O.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _mk(spark, tmp_path, name, **kw):
    path = str(tmp_path / name)
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=2, **kw)
    return LakehouseTable(path), IngestJob(path, str(tmp_path / f"ctl-{name}"))


def _apply(spark, job, pdf, batch_id):
    job.apply_batch(spark, batch_id, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))


def test_as_of_ts_reads_the_right_snapshot(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=2_000, n_convs=40, seed=5))
    half = len(pdf) // 2
    t, job = _mk(spark, tmp_path, "tt", compact_every=10**9)
    _apply(spark, job, pdf.iloc[:half], 0)
    sid_a = t.current_snapshot()["snapshot_id"]
    ts_a = t.current_snapshot()["committed_at"]
    _apply(spark, job, pdf.iloc[half:], 1)
    sid_b = t.current_snapshot()["snapshot_id"]

    # pin by float seconds and by datetime, both resolve to snapshot A
    assert t.snapshot_as_of(ts_a)["snapshot_id"] == sid_a
    dt = datetime.datetime.fromtimestamp(ts_a, tz=datetime.timezone.utc)
    assert t.snapshot_as_of(dt)["snapshot_id"] == sid_a
    # far future resolves to the head
    assert t.snapshot_as_of(ts_a + 10**6)["snapshot_id"] == sid_b
    # before table creation: expired/nonexistent
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.snapshot_as_of(0.0)

    pd.testing.assert_frame_equal(
        t.read(spark, as_of_ts=ts_a).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        t.read(spark, snapshot_id=sid_a).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )
    with pytest.raises(ValueError, match="exactly one"):
        t.read(spark, snapshot_id=sid_a, as_of_ts=ts_a)


def test_inspect_metadata_tables(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=3_000, n_convs=50, seed=9))
    t, job = _mk(
        spark, tmp_path, "ins",
        compact_every=10**9, cluster_by=["conv_id", "turn_idx"],
        target_file_rows=400, stats_columns=["ts"],
    )
    _apply(spark, job, pdf, 0)
    t.compact(spark)
    t.tag_snapshot("v1")
    t.create_branch("audit")

    snaps = t.inspect(spark, "snapshots").toPandas()
    assert list(snaps["kind"]) == ["create", "merge", "compact"]
    assert snaps["committed_at"].notna().all()
    assert snaps["snapshot_id"].is_monotonic_increasing

    files = t.inspect(spark, "files").toPandas()
    assert len(files) == len(t._files(t.current_snapshot()))
    base = files[files["layer"] == "base"]
    assert len(base) > 0 and base["key_min"].notna().all()
    assert base["col_stats"].notna().all()  # ts bounds recorded
    # metadata-table answer matches the engine's own planning
    assert (files["layer"] == "delta").sum() == 0

    mans = t.inspect(spark, "manifests").toPandas()
    assert mans["entry_count"].sum() == len(files)

    refs = t.inspect(spark, "refs").toPandas()
    byname = dict(zip(refs["name"], refs["type"]))
    assert byname.get("v1") == "tag" and byname.get("audit") == "branch"

    with pytest.raises(ValueError, match="unknown metadata table"):
        t.inspect(spark, "partitions")
