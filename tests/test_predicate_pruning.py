"""Predicate file skipping over manifest column stats — read(where=...).

Tables created with stats_columns record per-file min/max bounds (keyed by
field id) whenever base files are written; read(where=[(col, op, val), ...])
then skips base files whose bounds can't match — but ONLY in buckets with no
live delta stack (a delta can move a key's current image into the predicate
range, so those buckets always read fully), and the exact row filter is
always applied after reconcile. These tests pin:

  (a) pruning fires on a ts-clustered table and the pruned read equals the
      unpruned filtered read;
  (b) soundness under post-compaction updates that move rows INTO the
      predicate range (the delta-protection rule), checked against the
      pandas sequential-apply oracle;
  (c) stats survive column rename (field-id keying) and type widen;
  (d) predicate validation errors.
"""

from __future__ import annotations

import datetime
import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob

BASE_TS = datetime.datetime(2026, 1, 1)


def _mk(spark, tmp_path, name, **create_kw):
    path = str(tmp_path / name)
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, **create_kw)
    return path, IngestJob(path, str(tmp_path / f"ctl-{name}"))


def _apply(spark, job, pdf, batch_id=0):
    job.apply_batch(spark, batch_id, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA))


def _frame(df) -> pd.DataFrame:
    return df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _ts_table(spark, tmp_path, name, pdf):
    path, job = _mk(
        spark, tmp_path, name,
        n_buckets=4, compact_every=10**9,
        cluster_by=["ts"], target_file_rows=400,
        stats_columns=["ts", "turn_idx"],
    )
    _apply(spark, job, pdf)
    return LakehouseTable(path), job


def test_ts_range_read_prunes_and_matches(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=12_000, n_convs=150, seed=7))
    t, _job = _ts_table(spark, tmp_path, "t1", pdf)

    # pre-compaction: everything is delta — no pruning, but where= is exact
    thr = BASE_TS + datetime.timedelta(seconds=int(pdf["lsn"].max() * 0.9))
    where = [("ts", ">=", thr)]
    assert t.plan_scan(where=where)["files_pruned"] == 0
    pd.testing.assert_frame_equal(
        _frame(t.read(spark, where=where)),
        _frame(t.read(spark).where(F.col("ts") >= F.lit(thr))),
    )

    t.compact(spark)
    base = [e for e in t._files(t.current_snapshot()) if e.get("layer") == "base"]
    assert all(e.get("col_stats") for e in base), "compacted bases must carry bounds"

    plan = t.plan_scan(where=where)
    assert plan["buckets_with_deltas"] == 0
    assert plan["files_pruned"] > 0, "ts-clustered files must skip on a ts range"
    # a 10%-of-range predicate should skip a meaningful share of files
    # (boundary files overlap, so not a strict per-bucket count)
    assert plan["files_pruned"] >= plan["files_total"] // 3
    pd.testing.assert_frame_equal(
        _frame(t.read(spark, where=where)),
        _frame(t.read(spark).where(F.col("ts") >= F.lit(thr))),
    )

    # a column without recorded stats residual-filters but never prunes
    role_where = [("role", "=", "user")]
    assert t.plan_scan(where=role_where)["files_pruned"] == 0
    pd.testing.assert_frame_equal(
        _frame(t.read(spark, where=role_where)),
        _frame(t.read(spark).where(F.col("role") == "user")),
    )

    # conjunction: both predicates applied, pruning at least as strong
    both = where + [("turn_idx", ">=", 0)]
    pd.testing.assert_frame_equal(
        _frame(t.read(spark, where=both)),
        _frame(t.read(spark).where((F.col("ts") >= F.lit(thr)) & (F.col("turn_idx") >= 0))),
    )


def test_where_sound_under_post_compaction_updates(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=8_000, n_convs=120, seed=11))
    t, job = _ts_table(spark, tmp_path, "t2", pdf)
    t.compact(spark)

    # move a handful of LIVE rows forward in time, far beyond every base
    # file's recorded ts bound — their buckets grow delta stacks
    live = reduce_feed(pdf)
    victims = list(live[["conv_id", "turn_idx"]].itertuples(index=False))[:6]
    hi_lsn = int(pdf["lsn"].max())
    future = datetime.datetime(2027, 6, 1)
    rows = []
    for i, (cid, tix) in enumerate(victims):
        ts = future + datetime.timedelta(seconds=i)
        rows.append(
            {
                "lsn": hi_lsn + 1 + i,
                "op": "U",
                "ts": ts,
                "conv_id": cid,
                "turn_idx": int(tix),
                "payload": json.dumps(
                    {"role": "assistant", "text": f"moved-{i}", "tool": None,
                     "ts": ts.strftime("%Y-%m-%dT%H:%M:%S")}
                ),
            }
        )
    churn = pd.DataFrame(rows)
    _apply(spark, job, churn, batch_id=1)

    where = [("ts", ">=", future)]
    plan = t.plan_scan(where=where)
    assert plan["buckets_with_deltas"] >= 1

    # every base file's bounds exclude the range, yet the moved rows MUST
    # surface — their buckets are delta-protected from pruning
    got = _frame(t.read(spark, where=where))
    oracle = reduce_feed(pd.concat([pdf, churn], ignore_index=True))
    exp = (
        oracle[pd.to_datetime(oracle["ts"]) >= future][["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(victims)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], exp, check_dtype=False
    )

    # buckets untouched by the churn still prune
    if plan["buckets_with_deltas"] < 4:
        assert plan["files_pruned"] > 0

    # after compaction the moved rows live in base files with 2027 bounds:
    # pruning resumes everywhere and the result is unchanged
    t.compact(spark)
    plan2 = t.plan_scan(where=where)
    assert plan2["buckets_with_deltas"] == 0 and plan2["files_pruned"] > 0
    pd.testing.assert_frame_equal(
        _frame(t.read(spark, where=where))[["conv_id", "turn_idx", "text"]],
        exp,
        check_dtype=False,
    )


def test_stats_survive_rename_and_widen(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=6_000, n_convs=100, seed=13))
    t, job = _ts_table(spark, tmp_path, "t3", pdf)
    t.compact(spark)

    t.apply_ddl([{"action": "rename_column", "old": "ts", "new": "event_ts"}])
    thr = BASE_TS + datetime.timedelta(seconds=int(pdf["lsn"].max() * 0.85))
    where = [("event_ts", ">=", thr)]
    # files written pre-rename prune under the NEW name (field-id keyed)
    assert t.plan_scan(where=where)["files_pruned"] > 0
    pd.testing.assert_frame_equal(
        _frame(t.read(spark, where=where)),
        _frame(t.read(spark).where(F.col("event_ts") >= F.lit(thr))),
    )
    with pytest.raises(KeyError):
        t.read(spark, where=[("ts", ">=", thr)])  # old name is gone

    # stats keep RECORDING after the rename (stats_columns still says "ts")
    churn = generate_feed_pandas(FeedSpec(n_events=2_000, n_convs=100, seed=17))
    churn["lsn"] = churn["lsn"] + int(pdf["lsn"].max())
    _apply(spark, job, churn, batch_id=1)
    t.compact(spark)
    fid = next(
        f["id"] for f in t._load_schema(t.current_snapshot()["schema_id"])["fields"]
        if f["name"] == "event_ts"
    )
    base = [e for e in t._files(t.current_snapshot()) if e.get("layer") == "base"]
    assert base and all(str(fid) in (e.get("col_stats") or {}) for e in base)

    # widen turn_idx int→long: older int bounds still compare
    t.apply_ddl([{"action": "widen_type", "name": "turn_idx", "to": "long"}])
    pd.testing.assert_frame_equal(
        _frame(t.read(spark, where=[("turn_idx", "<", 2)])),
        _frame(t.read(spark).where(F.col("turn_idx") < 2)),
    )


def test_predicate_validation(spark, tmp_path):
    pdf = generate_feed_pandas(FeedSpec(n_events=500, n_convs=20, seed=3))
    t, _job = _ts_table(spark, tmp_path, "t4", pdf)
    with pytest.raises(ValueError, match="unsupported predicate op"):
        t.read(spark, where=[("ts", "!=", BASE_TS)])
    with pytest.raises(KeyError, match="no such column"):
        t.read(spark, where=[("nope", "=", 1)])
    with pytest.raises(ValueError, match="never matches"):
        t.read(spark, where=[("role", "=", None)])
