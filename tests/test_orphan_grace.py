"""`expire_snapshots(orphan_grace_seconds=...)`: unreferenced data files
younger than the grace survive GC (an in-flight writer's tmp/pre-commit
files are unreferenced by definition — Iceberg's remove_orphan_files
`older_than` guard), while aged orphans and expired history are removed and
every referenced file stays readable."""

from __future__ import annotations

import os
import time

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _apply(spark, job, table, batch_id, seed):
    pdf = generate_feed_pandas(FeedSpec(n_events=300, n_convs=20, seed=seed))
    pdf["lsn"] = pdf["lsn"] + (
        LakehouseTable(table).current_snapshot()["watermark_lsn"] or 0
    )
    job.apply_batch(
        spark, batch_id, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA)
    )


def _plant(path: str, age_seconds: float) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"PAR1 fake orphan PAR1")
    old = time.time() - age_seconds
    os.utime(path, (old, old))
    return path


def test_orphan_grace_spares_young_unreferenced_files(spark, tmp_path):
    t = str(tmp_path / "t")
    LakehouseTable(t).create(TRANSCRIPT_SCHEMA, n_buckets=2, compact_every=10**9)
    job = IngestJob(t, str(tmp_path / "ctl"))
    for b in range(3):
        _apply(spark, job, t, b, seed=930 + b)
    before = LakehouseTable(t).read(spark).count()

    # a "crashed writer" young tmp file and an aged one; plus an aged orphan
    # posing as a renamed-but-never-committed snapshot dir
    young = _plant(os.path.join(t, "data", ".tmp-s99-aaaa", "part-0.parquet"), 5)
    aged = _plant(os.path.join(t, "data", ".tmp-s98-bbbb", "part-0.parquet"), 7200)
    aged2 = _plant(os.path.join(t, "data", "s9999", "_bucket=0", "p.parquet"), 7200)

    res = LakehouseTable(t).expire_snapshots(
        keep_last=100, orphan_grace_seconds=600
    )
    assert os.path.exists(young), "in-grace orphan must survive"
    assert not os.path.exists(aged) and not os.path.exists(aged2)
    assert res["orphans_in_grace"] >= 1
    assert res["removed_snapshots"] == 0  # keep_last=100 kept all history
    assert LakehouseTable(t).read(spark).count() == before

    # grace elapsed (simulated by backdating): the survivor goes too
    old = time.time() - 7200
    os.utime(young, (old, old))
    LakehouseTable(t).expire_snapshots(keep_last=100, orphan_grace_seconds=600)
    assert not os.path.exists(young)
    assert LakehouseTable(t).read(spark).count() == before


def test_grace_covers_metadata_too(spark, tmp_path):
    """Review finding: the grace must spare an in-flight commit's MANIFEST
    (written before its snapshot json) — deleting it would leave the
    landed commit permanently unreadable."""
    t = str(tmp_path / "t")
    LakehouseTable(t).create(TRANSCRIPT_SCHEMA, n_buckets=2, compact_every=10**9)
    job = IngestJob(t, str(tmp_path / "ctl"))
    _apply(spark, job, t, 0, seed=935)
    meta = LakehouseTable(t).meta_dir

    inflight = os.path.join(meta, "manifest-99999999-deadbeef.json")
    with open(inflight, "w") as f:
        f.write("[]")
    res = LakehouseTable(t).expire_snapshots(
        keep_last=100, orphan_grace_seconds=600
    )
    assert os.path.exists(inflight), "young unreferenced manifest must survive"
    assert res["orphans_in_grace"] >= 1

    old = time.time() - 7200
    os.utime(inflight, (old, old))
    LakehouseTable(t).expire_snapshots(keep_last=100, orphan_grace_seconds=600)
    assert not os.path.exists(inflight)


def test_grace_protects_spared_snapshots_whole_closure(spark, tmp_path):
    """Review finding: the grace must be per-COMMIT, not per-file — a
    stalled writer's data files and manifests can be arbitrarily older
    than its snapshot json, so a young (in-grace) snapshot must pull its
    whole reference closure into the live sets, or one expire run keeps
    the snapshot while deleting what it references."""
    t = str(tmp_path / "t")
    LakehouseTable(t).create(TRANSCRIPT_SCHEMA, n_buckets=2, compact_every=10**9)
    job = IngestJob(t, str(tmp_path / "ctl"))
    for b in range(3):
        _apply(spark, job, t, b, seed=936 + b)
    tbl = LakehouseTable(t)
    expired_sid = tbl.history()[1]["snapshot_id"]  # will fall out of keep_last=1
    expired_rows = tbl.read(spark, snapshot_id=expired_sid).count()

    # age every data file and manifest far past the grace; snapshot jsons
    # stay young (the stalled-writer shape)
    old = time.time() - 7200
    for root, _dirs, files in os.walk(os.path.join(t, "data")):
        for f in files:
            os.utime(os.path.join(root, f), (old, old))
    for f in os.listdir(tbl.meta_dir):
        if f.startswith("manifest-"):
            os.utime(os.path.join(tbl.meta_dir, f), (old, old))

    res = tbl.expire_snapshots(keep_last=1, orphan_grace_seconds=600)
    assert res["removed_snapshots"] == 0 and res["orphans_in_grace"] >= 1
    # the spared snapshot's whole closure survived: it is still READABLE
    assert LakehouseTable(t).read(spark, snapshot_id=expired_sid).count() == expired_rows

    # grace elapsed for the snapshot json too → the commit expires whole
    for f in os.listdir(tbl.meta_dir):
        if f.startswith("snapshot-"):
            os.utime(os.path.join(tbl.meta_dir, f), (old, old))
    res2 = LakehouseTable(t).expire_snapshots(keep_last=1, orphan_grace_seconds=600)
    assert res2["removed_snapshots"] >= 1


def test_default_grace_zero_preserves_r3_semantics(spark, tmp_path):
    t = str(tmp_path / "t")
    LakehouseTable(t).create(TRANSCRIPT_SCHEMA, n_buckets=2, compact_every=10**9)
    job = IngestJob(t, str(tmp_path / "ctl"))
    for b in range(2):
        _apply(spark, job, t, b, seed=940 + b)
    fresh = _plant(os.path.join(t, "data", ".tmp-s77-cccc", "part-0.parquet"), 0)
    res = LakehouseTable(t).expire_snapshots(keep_last=100)
    assert not os.path.exists(fresh)  # grace 0: immediate cleanup, as before
    assert res["orphans_in_grace"] == 0
