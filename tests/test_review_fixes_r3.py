"""Round-3 review-finding regressions: GC vs staged ancestry, cross-ref
schema-id collisions, pruning-key mismatch, cherry-pick idempotency across
compaction."""

from __future__ import annotations

import pandas as pd
import pytest

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _feed(n, seed, base=0):
    pdf = generate_feed_pandas(FeedSpec(n_events=n, n_convs=40, seed=seed))
    pdf["lsn"] = pdf["lsn"] + base
    return pdf


def _apply(spark, job, pdf, bid):
    return job.apply_batch(
        spark, bid, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA)
    )


def test_expire_keeps_staged_ancestry_so_publish_survives_gc(spark, tmp_path):
    """A branch that staged SEVERAL batches must stay publishable after
    expire_snapshots: the staged middle snapshots are ancestry fast_forward
    walks and the audit's changelog window — GC must keep the whole
    head→fork segment, not just the head."""
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    main_job = IngestJob(path, str(tmp_path / "ctl"))
    b0 = _feed(1_000, 121)
    _apply(spark, main_job, b0, 0)
    published = tbl.current_snapshot()["snapshot_id"]

    tbl.create_branch("audit")
    stage = IngestJob(path, str(tmp_path / "ctl-s"), ref="audit")
    hi = int(b0["lsn"].max())
    batches = []
    for i in range(3):  # three staged, unpublished batches
        b = _feed(400, 122 + i, base=hi)
        hi = int(b["lsn"].max())
        batches.append(b)
        _apply(spark, stage, b, 1 + i)

    out = tbl.expire_snapshots(keep_last=1)
    # the staged chain survived in full
    branch = LakehouseTable(path, ref="audit")
    staged_ids = [s["snapshot_id"] for s in branch.history()]
    assert all(sid in out["kept"] for sid in staged_ids[-4:])  # fork + 3 staged

    # the staged changelog is still readable and the publish still works
    assert branch.read_changes(spark, from_snapshot_id=published).count() > 0
    assert tbl.fast_forward("audit")["skipped"] is False
    expected = reduce_feed(pd.concat([b0, *batches], ignore_index=True))
    actual = (
        tbl.read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert actual["text"].tolist() == expected["text"].tolist()


def test_concurrent_ddl_on_branch_and_main_never_collides(spark, tmp_path):
    """add_column on a branch and on main must write DIFFERENT
    schema-<id>.json files (table-global schema ids) — per-chain ids would
    let the second writer overwrite the first's file and re-label its
    column."""
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4)
    tbl.create_branch("audit")
    branch = LakehouseTable(path, ref="audit")

    r1 = branch.apply_ddl([{"action": "add_column", "name": "rating", "type": "int"}])
    r2 = tbl.apply_ddl([{"action": "add_column", "name": "score", "type": "int"}])
    assert r1["schema_id"] != r2["schema_id"]
    # each ref still sees ITS column under ITS name
    assert "rating" in branch.schema_struct().fieldNames()
    assert "score" in tbl.schema_struct().fieldNames()
    assert "score" not in branch.schema_struct().fieldNames()
    assert "rating" not in tbl.schema_struct().fieldNames()


def test_point_read_on_non_key_cluster_column_is_correct(spark, tmp_path):
    """cluster_by on a column other than conv_id must NOT key-range-prune a
    conv_id point read (the stats are of the wrong column); the read stays
    bucket-pruned and exact."""
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(
        TRANSCRIPT_SCHEMA, n_buckets=2, compact_every=10**9,
        cluster_by=["text"], target_file_rows=400,
    )
    job = IngestJob(path, str(tmp_path / "ctl"))
    b0 = _feed(3_000, 131)
    _apply(spark, job, b0, 0)
    tbl.compact(spark)
    victim = b0["conv_id"].iloc[0]
    got = (
        tbl.read(spark, conv_ids=[victim]).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    full = reduce_feed(b0)
    want = full[full["conv_id"] == victim].reset_index(drop=True)
    assert got["text"].tolist() == want["text"].tolist()


def test_cherry_pick_idempotent_across_compaction(spark, tmp_path):
    """Re-picking after compaction folded the picked files must skip, not
    re-layer stale deltas."""
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    main_job = IngestJob(path, str(tmp_path / "ctl"))
    b0 = _feed(1_500, 141)
    _apply(spark, main_job, b0, 0)

    tbl.create_branch("audit")
    stage = IngestJob(path, str(tmp_path / "ctl-s"), ref="audit")
    hi = int(b0["lsn"].max())
    b1 = _feed(600, 142, base=hi)
    _apply(spark, stage, b1, 1)
    staged_id = LakehouseTable(path, ref="audit").current_snapshot()["snapshot_id"]
    _apply(spark, main_job, _feed(600, 143, base=hi + 600), 2)  # diverge

    assert tbl.cherry_pick(staged_id)["skipped"] is False
    before = (
        tbl.read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    tbl.compact(spark)  # folds the picked delta files out of the head
    assert tbl.cherry_pick(staged_id)["skipped"] is True
    after = (
        tbl.read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)


def test_cherry_pick_refuses_divergent_ddl_field_ids(spark, tmp_path):
    """A field id bound to two different columns on two refs must refuse a
    cross-ref cherry-pick instead of decoding one column as the other."""
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    main_job = IngestJob(path, str(tmp_path / "ctl"))
    b0 = _feed(800, 151)
    _apply(spark, main_job, b0, 0)

    tbl.create_branch("audit")
    branch = LakehouseTable(path, ref="audit")
    branch.apply_ddl([{"action": "add_column", "name": "rating", "type": "int"}])
    tbl.apply_ddl([{"action": "add_column", "name": "score", "type": "int"}])

    stage = IngestJob(path, str(tmp_path / "ctl-s"), ref="audit")
    hi = int(b0["lsn"].max())
    b1 = _feed(400, 152, base=hi)
    b1["payload"] = b1["payload"].str.replace("}", ',"rating":5}', regex=False)
    _apply(spark, stage, b1, 1)
    staged_id = branch.current_snapshot()["snapshot_id"]

    with pytest.raises(ValueError, match="divergent DDL"):
        tbl.cherry_pick(staged_id)
