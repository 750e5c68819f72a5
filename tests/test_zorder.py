"""Z-order clustering (cluster_order='zorder') — Delta OPTIMIZE ZORDER BY /
Iceberg z-sort-order analog over the engine's cluster_by columns.

The sort order only changes the LAYOUT of compacted base files; stats
recording and pruning read the written files' parquet footers either way, so
these tests pin (a) the Morton encoding itself against a Python oracle,
(b) read equality zorder vs linear (layout can never change results),
(c) the point of the feature: a predicate on the SECOND cluster column
prunes files under zorder where lexicographic order leaves every file
spanning that column's full range, and (d) validation + DDL degradation.
"""

from __future__ import annotations

import datetime
import json

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.plans.table_format import (
    LakehouseTable,
    _zorder_expr,
)
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def _py_morton(vals, bounds):
    """16-bit power-of-two-normalized BIT-interleaved Morton key — the
    Python oracle for _zorder_expr's hex string (cells via clamp + shift,
    z bits round-robin MSB-first across columns)."""
    cells = []
    for v, (lo, hi) in zip(vals, bounds):
        v = lo if v is None else min(max(v, lo), hi)
        sb = max((hi - lo).bit_length(), 1)
        s = (v - lo) >> (sb - 16) if sb > 16 else (v - lo) << (16 - sb)
        cells.append(s)
    n = len(cells)
    out = 0
    for p in range(16 * n):
        b = 15 - (p // n)
        out = (out << 1) | ((cells[p % n] >> b) & 1)
    return out.to_bytes(2 * n, "big")


def test_zorder_expr_matches_python_morton(spark):
    bounds = [(-(1 << 40), 1 << 40), (-100, 1 << 33)]
    rows = [
        (a, b)
        for a in (-(1 << 62), -7, -1, 0, 1, 255, 65_535, (1 << 40) + 3)
        for b in (-100, 0, 99, 1 << 33, (1 << 34))
    ]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z",
        _zorder_expr(
            [("a", "bigint", *bounds[0]), ("b", "bigint", *bounds[1])]
        ),
    )
    got = sorted((r.a, r.b, r.z) for r in df.collect())
    for a, b, z in got:
        assert bytes.fromhex(z) == _py_morton([a, b], bounds), (a, b)
    # ordering by the hex string == ordering by the python key (+tiebreak)
    by_z = [(r.a, r.b) for r in df.orderBy("z", "a", "b").collect()]
    want = sorted(rows, key=lambda t: (_py_morton(list(t), bounds), t))
    assert by_z == want

    # null sorts into cell 0 of its column, does not void the other
    df2 = spark.createDataFrame(
        [(None, 5), (0, 5), (None, 7)], "a long, b long"
    ).withColumn(
        "z", _zorder_expr([("a", "bigint", 0, 10), ("b", "bigint", 0, 10)])
    )
    got2 = [(r.a, r.b) for r in df2.orderBy("z").collect()]
    assert got2 == [(None, 5), (0, 5), (None, 7)]


def test_zorder_create_validation(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="linear|zorder"):
        t.create(TRANSCRIPT_SCHEMA, cluster_order="hilbert")
    with pytest.raises(ValueError, match=">= 2"):
        t.create(TRANSCRIPT_SCHEMA, cluster_by=["ts"], cluster_order="zorder")
    with pytest.raises(ValueError, match="integral/timestamp"):
        t.create(
            TRANSCRIPT_SCHEMA, cluster_by=["conv_id", "ts"], cluster_order="zorder"
        )
    # timestamp + int is the supported shape
    LakehouseTable(str(tmp_path / "ok")).create(
        TRANSCRIPT_SCHEMA, cluster_by=["ts", "turn_idx"], cluster_order="zorder"
    )


def _twin_tables(spark, tmp_path, pdf):
    out = {}
    for name, order in (("lin", "linear"), ("zor", "zorder")):
        path = str(tmp_path / name)
        LakehouseTable(path).create(
            TRANSCRIPT_SCHEMA,
            n_buckets=2,
            compact_every=10**9,
            cluster_by=["ts", "turn_idx"],
            cluster_order=order,
            target_file_rows=500,
            stats_columns=["ts", "turn_idx"],
        )
        job = IngestJob(path, str(tmp_path / f"ctl-{name}"))
        # two ingest+compact cycles: the FIRST base write sorts linear and
        # records the bounds the z normalization needs; the second compaction
        # (rewriting every bucket, since every bucket has new deltas) lays
        # the whole table out z-ordered
        half = len(pdf) // 2
        job.apply_batch(
            spark, 0, spark.createDataFrame(pdf.iloc[:half], schema=CHANGE_EVENT_SCHEMA)
        )
        t = LakehouseTable(path)
        t.compact(spark)
        job.apply_batch(
            spark, 1, spark.createDataFrame(pdf.iloc[half:], schema=CHANGE_EVENT_SCHEMA)
        )
        t = LakehouseTable(path)
        t.compact(spark)
        out[name] = t
    return out["lin"], out["zor"]


def _frame(df) -> pd.DataFrame:
    return df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_zorder_reads_equal_linear_and_second_column_prunes(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=12_000, n_convs=300, seed=11))
    lin, zor = _twin_tables(spark, tmp_path, pdf)

    # layout never changes results: full reads and filtered reads equal
    pd.testing.assert_frame_equal(_frame(lin.read(spark)), _frame(zor.read(spark)))
    where = [("turn_idx", ">=", 2), ("turn_idx", "<=", 4)]
    got = _frame(zor.read(spark, where=where))
    pd.testing.assert_frame_equal(
        got,
        _frame(
            zor.read(spark).where((F.col("turn_idx") >= 2) & (F.col("turn_idx") <= 4))
        ),
    )
    pd.testing.assert_frame_equal(got, _frame(lin.read(spark, where=where)))

    # the point: under linear (ts, turn_idx) order every file spans the full
    # turn_idx range, so a narrow turn_idx window prunes ~nothing; under
    # zorder the same window skips files (compact hyper-rectangles)
    nfiles = lambda t: len(
        [e for e in t._files(t.current_snapshot()) if e.get("layer") == "base"]
    )
    assert nfiles(zor) >= 4, "need several files per bucket for the test to bite"
    plan_lin = lin.plan_scan(where=where)
    plan_zor = zor.plan_scan(where=where)
    assert plan_zor["files_pruned"] > plan_lin["files_pruned"]
    assert plan_zor["files_pruned"] > 0

    # and the leading ts window still prunes under zorder too
    thr = datetime.datetime(2026, 1, 1) + datetime.timedelta(
        seconds=int(pdf["lsn"].max() * 0.9)
    )
    assert zor.plan_scan(where=[("ts", ">=", thr)])["files_pruned"] > 0
    pd.testing.assert_frame_equal(
        _frame(zor.read(spark, where=[("ts", ">=", thr)])),
        _frame(lin.read(spark, where=[("ts", ">=", thr)])),
    )


def test_zorder_degrades_to_linear_when_columns_drop(spark, tmp_path):
    """A DDL that drops one z column leaves < 2 — compaction must fall back
    to the linear sort (layout choice, never a failure) and reads stay
    exact."""
    pdf = generate_feed_pandas(FeedSpec(n_events=4_000, n_convs=120, seed=5))
    path = str(tmp_path / "deg")
    LakehouseTable(path).create(
        TRANSCRIPT_SCHEMA,
        n_buckets=2,
        compact_every=10**9,
        cluster_by=["ts", "turn_idx"],
        cluster_order="zorder",
        target_file_rows=500,
        stats_columns=["turn_idx"],
    )
    job = IngestJob(path, str(tmp_path / "ctl-deg"))
    half = len(pdf) // 2
    job.apply_batch(
        spark, 0, spark.createDataFrame(pdf.iloc[:half], schema=CHANGE_EVENT_SCHEMA)
    )
    t = LakehouseTable(path)
    t.compact(spark)

    ddl = pd.DataFrame(
        {
            "lsn": [int(pdf["lsn"].max()) + 1],
            "op": ["DDL"],
            "ts": [pd.Timestamp("2026-06-01")],
            "conv_id": [None],
            "turn_idx": [None],
            "payload": [json.dumps({"action": "drop_column", "name": "ts"})],
        }
    )
    job.apply_batch(spark, 1, spark.createDataFrame(ddl, schema=CHANGE_EVENT_SCHEMA))
    rest = pdf.iloc[half:].copy()
    rest["payload"] = rest["payload"].map(
        lambda p: json.dumps({k: v for k, v in json.loads(p).items() if k != "ts"})
        if isinstance(p, str)
        else p
    )
    job.apply_batch(
        spark, 2, spark.createDataFrame(rest, schema=CHANGE_EVENT_SCHEMA)
    )
    t = LakehouseTable(path)
    assert (t.current_snapshot().get("cluster_by") or []) == ["turn_idx"]
    t.compact(spark)  # sorts linear now; must not raise
    # contents still exact vs an unclustered twin fed the same stream
    path2 = str(tmp_path / "ctrl")
    LakehouseTable(path2).create(TRANSCRIPT_SCHEMA, n_buckets=2, compact_every=10**9)
    job2 = IngestJob(path2, str(tmp_path / "ctl-ctrl"))
    job2.apply_batch(
        spark, 0, spark.createDataFrame(pdf.iloc[:half], schema=CHANGE_EVENT_SCHEMA)
    )
    job2.apply_batch(spark, 1, spark.createDataFrame(ddl, schema=CHANGE_EVENT_SCHEMA))
    job2.apply_batch(
        spark, 2, spark.createDataFrame(rest, schema=CHANGE_EVENT_SCHEMA)
    )
    pd.testing.assert_frame_equal(
        _frame(t.read(spark)), _frame(LakehouseTable(path2).read(spark))
    )


# ---------------------------------------------------------------- recluster


def _stale_bounds_ztable(spark, tmp_path, name="stale"):
    """A z table whose final layout was normalized against STALE bounds —
    the post-backfill scenario recluster exists for: batch 0 covers a tiny
    leading ts slice and its compaction records those narrow bounds; batch 1
    extends ts ~100x beyond them, so the second compaction's z-sort clamps
    almost every row to the ts edge cell and the layout degenerates to
    turn-major (ts pruning gets nothing)."""
    path = str(tmp_path / name)
    LakehouseTable(path).create(
        TRANSCRIPT_SCHEMA,
        n_buckets=2,
        compact_every=10**9,
        cluster_by=["ts", "turn_idx"],
        cluster_order="zorder",
        target_file_rows=400,
        stats_columns=["ts", "turn_idx"],
    )
    job = IngestJob(path, str(tmp_path / f"ctl-{name}"))
    first = generate_feed_pandas(FeedSpec(n_events=200, n_convs=40, seed=7))
    job.apply_batch(
        spark, 0, spark.createDataFrame(first, schema=CHANGE_EVENT_SCHEMA)
    )
    t = LakehouseTable(path)
    t.compact(spark)  # records bounds covering ~200 s of ts
    rest = generate_feed_pandas(
        FeedSpec(n_events=12_000, n_convs=300, seed=8)
    )
    rest["lsn"] = rest["lsn"] + 200
    rest["ts"] = rest["ts"] + pd.Timedelta(seconds=200)
    job.apply_batch(
        spark, 1, spark.createDataFrame(rest, schema=CHANGE_EVENT_SCHEMA)
    )
    t = LakehouseTable(path)
    t.compact(spark)  # z-sorts against the STALE (batch-0) bounds
    return LakehouseTable(path)


def test_recluster_recovers_pruning_after_bounds_widen(spark, tmp_path):
    t = _stale_bounds_ztable(spark, tmp_path)
    before_full = _frame(t.read(spark))
    lo, hi = t.read(spark).agg(F.min("ts"), F.max("ts")).first()
    thr = hi - datetime.timedelta(seconds=int((hi - lo).total_seconds() * 0.05))
    where = [("ts", ">=", thr)]
    pruned_before = t.plan_scan(where=where)["files_pruned"]

    res = t.recluster(spark)
    assert res["skipped"] is False
    assert t.current_snapshot()["kind"] == "recluster"

    # layout-only: contents identical, full and filtered
    pd.testing.assert_frame_equal(before_full, _frame(t.read(spark)))
    pd.testing.assert_frame_equal(
        _frame(t.read(spark, where=where)),
        _frame(t.read(spark).where(F.col("ts") >= F.lit(thr))),
    )
    # the point: the trailing ts window now skips files it couldn't before
    # (the stale-bounds layout clamped ~98% of rows into the ts edge cell)
    plan = t.plan_scan(where=where)
    assert plan["files_pruned"] > pruned_before
    assert plan["files_pruned"] > 0


def test_recluster_is_layout_only_to_changelog_consumers(spark, tmp_path):
    t = _stale_bounds_ztable(spark, tmp_path, name="chlog")
    frm = t.current_snapshot()["snapshot_id"]
    assert t.recluster(spark)["skipped"] is False
    to = t.current_snapshot()["snapshot_id"]
    # incremental consumers crossing the recluster window see NO changes
    assert t.read_changes(spark, frm, to).count() == 0
    assert t.net_changes(spark, frm, to).count() == 0


def test_recluster_runs_without_deltas_and_folds_pending_ones(spark, tmp_path):
    t = _stale_bounds_ztable(spark, tmp_path, name="fold")
    # zero pending deltas: compact skips, recluster does not
    assert t.compact(spark)["skipped"] is True
    assert t.recluster(spark)["skipped"] is False

    # with pending deltas it folds them exactly like compact (tombstones
    # dropped, delta stack cleared) — one rewrite, not recluster-then-compact
    job = IngestJob(t.path, t.path + "-ctl2")
    upd = generate_feed_pandas(FeedSpec(n_events=500, n_convs=40, seed=9))
    upd["lsn"] = upd["lsn"] + 50_000
    job.apply_batch(spark, 5, spark.createDataFrame(upd, schema=CHANGE_EVENT_SCHEMA))
    t = LakehouseTable(t.path)
    want = _frame(t.read(spark))
    assert t.delta_depth(t.current_snapshot())
    assert t.recluster(spark)["skipped"] is False
    assert not t.delta_depth(t.current_snapshot())
    pd.testing.assert_frame_equal(want, _frame(t.read(spark)))


def test_recluster_refuses_during_spec_migration(spark, tmp_path):
    t = _stale_bounds_ztable(spark, tmp_path, name="mix")
    t.evolve_bucket_spec(spark, 4)
    res = t.recluster(spark)
    assert res["skipped"] is True and res["reason"] == "mixed_spec"
