"""rewrite_manifests: consolidate the manifest list in pure metadata.

A table kept at compact_every=∞ (a cascade hub whose delta layer is the
changelog) accumulates one manifest per merge commit. The rewrite must:
fold the list without changing ANY data file, leave reads byte-identical,
leave the incremental changelog unaffected (no new paths → skipped by the
path diff), compose with later merges, and let expire_snapshots reclaim
the superseded manifest files.
"""

from __future__ import annotations

import os

import pandas as pd

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _build(spark, tmp_path, n_batches=5):
    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    job = IngestJob(path, str(tmp_path / "ctl"))
    table = LakehouseTable(path)
    lsn0 = 0
    for b in range(n_batches):
        pdf = generate_feed_pandas(FeedSpec(n_events=500, n_convs=40, seed=400 + b))
        pdf["lsn"] = pdf["lsn"] + lsn0
        job.apply_batch(spark, b, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))
        lsn0 = table.current_snapshot()["watermark_lsn"]
    return table, job


def _frame(df) -> pd.DataFrame:
    return df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_rewrite_consolidates_without_touching_data(spark, tmp_path):
    table, job = _build(spark, tmp_path, n_batches=5)
    snap0 = table.current_snapshot()
    n_manifests_before = len(snap0["manifests"])
    assert n_manifests_before >= 5  # one per merge commit + create-era
    files_before = sorted(e["path"] for e in table._files(snap0))
    state_before = _frame(table.read(spark))
    changes_before = _frame(table.read_changes(spark, 1))

    res = table.rewrite_manifests()
    assert res["skipped"] is False
    assert res["manifests_after"] < res["manifests_before"]

    snap1 = table.current_snapshot()
    assert snap1["kind"] == "rewrite_manifests"
    assert len(snap1["manifests"]) == res["manifests_after"] == 1
    # identical file inventory — same paths, same layer split, same depth
    assert sorted(e["path"] for e in table._files(snap1)) == files_before
    assert table.delta_depth(snap1) == table.delta_depth(snap0)
    pd.testing.assert_frame_equal(_frame(table.read(spark)), state_before)
    # changelog from a pre-rewrite cursor: the rewrite contributes nothing
    pd.testing.assert_frame_equal(_frame(table.read_changes(spark, 1)), changes_before)

    # second rewrite is a no-op
    assert table.rewrite_manifests()["skipped"] is True

    # a later merge composes: consolidated refs carry + one new delta manifest
    pdf = generate_feed_pandas(FeedSpec(n_events=300, n_convs=40, seed=499))
    pdf["lsn"] = pdf["lsn"] + snap1["watermark_lsn"]
    job.apply_batch(spark, 99, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))
    snap2 = table.current_snapshot()
    assert snap2["kind"] == "merge"
    assert len(snap2["manifests"]) == 2


def test_rewrite_target_splits_by_layer_and_bucket(spark, tmp_path):
    table, _ = _build(spark, tmp_path, n_batches=10)
    total = len(table._files(table.current_snapshot()))
    per = max(1, total // 3)
    res = table.rewrite_manifests(target_entries_per_manifest=per)
    assert res["skipped"] is False and res["manifests_after"] >= 3
    snap = table.current_snapshot()
    for m in snap["manifests"]:
        entries = table._manifest_entries(m["name"])
        # grouping key is (layer, bucket, path): each manifest's entries are
        # sorted, so bucket-pruned reads touch the fewest manifests
        keys = [(e.get("layer", ""), e["bucket"], e["path"]) for e in entries]
        assert keys == sorted(keys)


def test_expire_reclaims_superseded_manifests(spark, tmp_path):
    table, _ = _build(spark, tmp_path, n_batches=4)
    old_names = {m["name"] for m in table.current_snapshot()["manifests"]}
    table.rewrite_manifests()
    state = _frame(table.read(spark))
    res = table.expire_snapshots(keep_last=1)
    assert res["removed_manifests"] >= len(old_names) - 0  # superseded gone
    on_disk = {f for f in os.listdir(table.meta_dir) if f.startswith("manifest-")}
    assert not (old_names & on_disk)
    table._manifest_cache.clear()
    pd.testing.assert_frame_equal(_frame(table.read(spark)), state)
