"""Write-audit-publish branches (Iceberg branch refs / WAP workflow).

A streaming job lands batches on a staging branch; main readers and
changelog tailers see NOTHING until an audit passes and `fast_forward`
publishes (one ancestor-checked hint rename). A failed audit resets the
branch — the bad snapshots never enter the published parent chain, so the
main changelog never emits their deltas, and GC reclaims their files.
Snapshot ids are table-global so branch and main commits never collide on
filenames (reference: data_pipeline's applier has no staging story — abort
discards the batch file; WAP gives the same discard at TABLE granularity,
SURVEY.md §2 T11 error handling, Iceberg-style)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import CommitConflictError, LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _feed(n_events, seed, lsn_base=0):
    pdf = generate_feed_pandas(FeedSpec(n_events=n_events, n_convs=40, seed=seed))
    pdf["lsn"] = pdf["lsn"] + lsn_base
    return pdf


def _apply(spark, job, pdf, batch_id):
    return job.apply_batch(
        spark, batch_id, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA)
    )


def _texts(df) -> list[str]:
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)["text"]
        .tolist()
    )


def test_wap_stage_audit_publish(spark, tmp_path):
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4)
    main_job = IngestJob(path, str(tmp_path / "ctl-main"))
    b0 = _feed(2_000, seed=11)
    _apply(spark, main_job, b0, 0)
    published = tbl.current_snapshot()["snapshot_id"]

    tbl.create_branch("audit")
    assert tbl.branches() == {"audit": published}
    stage_job = IngestJob(path, str(tmp_path / "ctl-stage"), ref="audit")
    b1 = _feed(1_500, seed=12, lsn_base=int(b0["lsn"].max()))
    _apply(spark, stage_job, b1, 1)

    # staged rows are invisible on main, visible on the branch
    main_texts = _texts(tbl.read(spark))
    assert main_texts == reduce_feed(b0)["text"].tolist()
    branch = LakehouseTable(path, ref="audit")
    both = reduce_feed(pd.concat([b0, b1], ignore_index=True))
    assert _texts(branch.read(spark)) == both["text"].tolist()
    # main changelog has no staged deltas yet
    assert tbl.read_changes(spark, from_snapshot_id=published).count() == 0

    # audit on the branch handle, then publish: one hint swing
    assert branch.verify_against(spark, branch.read(spark))["ok"]
    res = tbl.fast_forward("audit")
    assert res["skipped"] is False and res["published_from"] == published
    assert _texts(tbl.read(spark)) == both["text"].tolist()
    # the published changelog now emits exactly the staged batch's deltas
    chg = tbl.read_changes(spark, from_snapshot_id=published)
    assert chg.count() > 0 and set(
        r["_batch_id"] for r in chg.select("_batch_id").distinct().collect()
    ) == {1}
    # idempotent re-publish
    assert tbl.fast_forward("audit")["skipped"] is True


def test_wap_failed_audit_reset_discards_and_gc(spark, tmp_path):
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    main_job = IngestJob(path, str(tmp_path / "ctl-main"))
    b0 = _feed(2_000, seed=21)
    _apply(spark, main_job, b0, 0)
    good = tbl.current_snapshot()["snapshot_id"]

    tbl.create_branch("audit")
    branch = LakehouseTable(path, ref="audit")
    stage_job = IngestJob(path, str(tmp_path / "ctl-stage"), ref="audit")

    # stage a poisoned batch, audit "fails", reset the branch
    bad = _feed(800, seed=22, lsn_base=int(b0["lsn"].max()))
    bad["payload"] = bad["payload"].str.replace("turn", "POISON", regex=False)
    _apply(spark, stage_job, bad, 1)
    bad_head = branch.current_snapshot()["snapshot_id"]
    bad_files = {e["path"] for e in branch.files()}
    branch.reset_branch(good)
    assert branch.current_snapshot()["snapshot_id"] == good

    # corrected batch RE-USES batch_id 1 (redelivery after the reset point
    # applies — the restored head's progress predates it) and allocates a
    # fresh snapshot id above the abandoned one
    fix = _feed(800, seed=23, lsn_base=int(b0["lsn"].max()))
    res = _apply(spark, stage_job, fix, 1)
    assert not res.get("skipped")
    assert branch.current_snapshot()["snapshot_id"] > bad_head

    tbl.fast_forward("audit")
    texts = _texts(tbl.read(spark))
    assert texts == reduce_feed(pd.concat([b0, fix], ignore_index=True))["text"].tolist()
    assert not any("POISON" in t for t in texts if t)
    # the main changelog across the whole retained chain never saw POISON
    chg = tbl.read_changes(spark, from_snapshot_id=good).toPandas()
    assert not chg["text"].fillna("").str.contains("POISON").any()

    # GC: the abandoned snapshot is unreachable from any ref → its snapshot
    # json and its delta files go; both ref heads survive
    gone = tbl.expire_snapshots(keep_last=1)
    assert bad_head not in gone["kept"]
    with pytest.raises(FileNotFoundError):
        tbl.snapshot_by_id(bad_head)
    live = {e["path"] for e in tbl.files()} | {e["path"] for e in branch.files()}
    for p in bad_files - live:
        assert not os.path.exists(os.path.join(path, p))
    assert branch.current_snapshot()["snapshot_id"] == tbl.current_snapshot()["snapshot_id"]


def test_branch_main_ids_never_collide_and_divergence_detected(spark, tmp_path):
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4)
    main_job = IngestJob(path, str(tmp_path / "ctl-main"))
    b0 = _feed(1_000, seed=31)
    _apply(spark, main_job, b0, 0)
    tbl.create_branch("audit")
    stage_job = IngestJob(path, str(tmp_path / "ctl-stage"), ref="audit")

    # interleave commits on both refs; ids must stay globally unique
    hi = int(b0["lsn"].max())
    _apply(spark, stage_job, _feed(500, seed=32, lsn_base=hi), 1)
    _apply(spark, main_job, _feed(500, seed=33, lsn_base=hi), 1)
    _apply(spark, stage_job, _feed(500, seed=34, lsn_base=hi + 500), 2)
    ids = sorted(
        int(f[len("snapshot-"):-len(".json")])
        for f in os.listdir(os.path.join(path, "_meta"))
        if f.startswith("snapshot-")
    )
    assert len(ids) == len(set(ids)) == 5  # create + b0 + 2 staged + 1 main
    # main advanced past the fork → publish must refuse, not clobber
    with pytest.raises(CommitConflictError):
        tbl.fast_forward("audit")


def test_branch_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    tbl = LakehouseTable(path)
    tbl.create(TRANSCRIPT_SCHEMA, n_buckets=4)
    with pytest.raises(ValueError):
        LakehouseTable(path, ref="bad/name")
    with pytest.raises(ValueError):
        LakehouseTable(str(tmp_path / "other"), ref="b").create(TRANSCRIPT_SCHEMA)
    tbl.create_branch("audit")
    with pytest.raises(ValueError):
        tbl.create_branch("audit")
    with pytest.raises(KeyError):
        tbl.drop_branch("nope")
    with pytest.raises(KeyError):
        LakehouseTable(path, ref="nope").current_snapshot()
    with pytest.raises(ValueError):
        tbl.reset_branch(0)  # main handle must stay append-only
    assert tbl.fast_forward("audit")["skipped"] is True  # equal heads
    assert tbl.drop_branch("audit")["branch"] == "audit"
    assert tbl.branches() == {}
