"""purge_keys — the compliance (right-to-be-forgotten) op: physical removal
of whole conversations from the table AND all retained history, verified by
a distributed scan over every parquet file left on disk.

Pins:
  (a) end-to-end: after purging a subset of conv_ids from an ingested +
      updated + partially-deleted table, (1) the table equals the oracle
      minus the purged conversations, (2) NO parquet file under the table
      holds a purged conv_id (raw file scan, independent of the engine's
      own verify), (3) history collapsed to the purge point;
  (b) pre-existing uncompacted tombstones: a conv deleted via the feed but
      never compacted still has its TEXT in the base file — purge must
      physically remove it even though the logical read shows zero rows;
  (c) refusal matrix: branch handle, live branch, tags without
      force_drop_tags (and the forced path drops them);
  (d) downstream: a changelog cursor below the purge point raises
      CursorExpiredError, and a fresh bootstrap converges without the
      purged docs.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import (
    CursorExpiredError,
    LakehouseTable,
)
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob

KEY = ["conv_id", "turn_idx"]


def _mk(spark, tmp_path, name, **kw):
    path = str(tmp_path / name)
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4, **kw)
    return LakehouseTable(path), IngestJob(path, str(tmp_path / f"ctl-{name}"))


def _apply(spark, job, pdf, batch_id):
    job.apply_batch(
        spark, batch_id, spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA)
    )


def _raw_conv_ids_on_disk(table_path: str) -> set[str]:
    """Every conv_id in every parquet file under the table — pyarrow,
    independent of the engine's read path AND of its spark-side verify."""
    out: set[str] = set()
    for root, _d, fs in os.walk(os.path.join(table_path, "data")):
        for f in fs:
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f), columns=["conv_id"])
                out.update(t.column("conv_id").to_pylist())
    return out


def _feed(n, seed, n_convs=30):
    return generate_feed_pandas(
        FeedSpec(n_events=n, n_convs=n_convs, seed=seed, p_update=0.3,
                 p_delete=0.05)
    )


def test_purge_end_to_end(spark, tmp_path):
    tbl, job = _mk(spark, tmp_path, "t")
    pdf = _feed(3_000, seed=91)
    for i, lo in enumerate(range(0, 3_000, 1_000)):
        _apply(spark, job, pdf.iloc[lo:lo + 1_000], i)

    expected = reduce_feed(pdf)
    all_convs = sorted(expected["conv_id"].unique())
    purged = all_convs[::4]  # every 4th conversation
    assert purged and _raw_conv_ids_on_disk(tbl.path) & set(purged)

    report = tbl.purge_keys(spark, purged)
    assert report["rows_deleted"] > 0
    assert report["verify"]["residual_rows"] == 0
    assert report["verify"]["files_scanned"] > 0

    # (2) independent raw scan: the text is GONE from disk
    assert not (_raw_conv_ids_on_disk(tbl.path) & set(purged))

    # (1) survivors untouched, byte-for-byte
    got = (
        tbl.read(spark)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    want = (
        expected[~expected["conv_id"].isin(purged)][["conv_id", "turn_idx", "text"]]
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # (3) history collapsed to the purge point
    assert len(tbl.history()) == 1

    # idempotent: purging again is a no-op that still verifies clean
    again = tbl.purge_keys(spark, purged)
    assert again["rows_deleted"] == 0
    assert again["verify"]["residual_rows"] == 0


def test_purge_reaches_tombstoned_but_uncompacted_text(spark, tmp_path):
    """A conv deleted via the feed reads as gone, but with compact_every
    high its text still sits in the base file under a MOR tombstone —
    the exact case where 'DELETE ran' is NOT 'the data is gone'."""
    tbl, job = _mk(spark, tmp_path, "t2", compact_every=10**9)
    pdf = _feed(1_500, seed=92)
    _apply(spark, job, pdf, 0)
    victim = sorted(reduce_feed(pdf)["conv_id"].unique())[0]

    # feed-level delete of every live turn of the victim
    live = reduce_feed(pdf)
    vic = live[live["conv_id"] == victim]
    max_lsn = int(pdf["lsn"].max())
    tomb = pd.DataFrame({
        "lsn": range(max_lsn + 1, max_lsn + 1 + len(vic)),
        "op": "D",
        "ts": pdf["ts"].iloc[0],
        "conv_id": vic["conv_id"].values,
        "turn_idx": vic["turn_idx"].values,
        "payload": None,
    })[list(pdf.columns)]
    _apply(spark, job, tomb, 1)

    assert tbl.read(spark).where(F.col("conv_id") == victim).count() == 0
    assert victim in _raw_conv_ids_on_disk(tbl.path)  # ...but the text remains

    report = tbl.purge_keys(spark, [victim])
    assert report["rows_deleted"] == 0  # logically already gone
    assert victim not in _raw_conv_ids_on_disk(tbl.path)  # now physically gone


def test_purge_refusals_and_forced_tags(spark, tmp_path):
    tbl, job = _mk(spark, tmp_path, "t3")
    pdf = _feed(800, seed=93)
    _apply(spark, job, pdf, 0)
    conv = sorted(reduce_feed(pdf)["conv_id"].unique())[0]

    with pytest.raises(ValueError, match="at least one conv_id"):
        tbl.purge_keys(spark, [])

    tbl.create_branch("staging")
    with pytest.raises(ValueError, match="branch"):
        LakehouseTable(tbl.path, ref="staging").purge_keys(spark, [conv])
    with pytest.raises(ValueError, match="branches"):
        tbl.purge_keys(spark, [conv])
    tbl.drop_branch("staging")

    tbl.tag_snapshot("corpus-v1")
    with pytest.raises(ValueError, match="tags"):
        tbl.purge_keys(spark, [conv])
    report = tbl.purge_keys(spark, [conv], force_drop_tags=True)
    assert report["dropped_tags"] == ["corpus-v1"]
    assert conv not in _raw_conv_ids_on_disk(tbl.path)


def test_purge_expires_downstream_cursors_to_rebootstrap(spark, tmp_path):
    from data_pipeline_spark.operators.corpus import assemble_conversations

    tbl, job = _mk(spark, tmp_path, "t4")
    pdf = _feed(1_200, seed=94)
    _apply(spark, job, pdf, 0)

    # a consumer with a durable cursor at the pre-purge snapshot
    import json as _json
    cursor_path = str(tmp_path / "cursor.json")
    with open(cursor_path, "w") as f:
        _json.dump({"snapshot_id": tbl.current_snapshot()["snapshot_id"]}, f)
    _apply(spark, job, _feed(400, seed=95), 1)

    purged = sorted(reduce_feed(pdf)["conv_id"].unique())[:3]
    tbl.purge_keys(spark, purged)

    with pytest.raises(CursorExpiredError):
        tbl.tail_changes(spark, cursor_path)

    # re-bootstrap: a full read sees no purged docs
    docs = assemble_conversations(tbl.read(spark))
    assert docs.where(F.col("conv_id").isin(purged)).count() == 0


@pytest.mark.slow
def test_purge_cascades_to_corpus_view(spark, tmp_path):
    """A compliance purge is only complete when DOWNSTREAM engine tables
    purge too: the corpus view's own retained history keeps the assembled
    doc text after the upstream purge. The view reuses the
    (conv_id, turn_idx=0) key, so purge_keys applies to it directly —
    this pins the full cascade: upstream purge → view converges (expired
    cursor → re-bootstrap) → view purge → both tables physically clean."""
    from data_pipeline_spark.streaming.corpus_view import CorpusViewJob

    tbl, job = _mk(spark, tmp_path, "t5")
    pdf = _feed(1_200, seed=96)
    _apply(spark, job, pdf, 0)

    view_path = str(tmp_path / "view")
    CorpusViewJob.create_view_table(view_path, n_buckets=4)
    view = CorpusViewJob(tbl.path, view_path, str(tmp_path / "vctl"))
    cursor = str(tmp_path / "vcursor.json")
    view.run_until_caught_up(spark, cursor)

    purged = sorted(reduce_feed(pdf)["conv_id"].unique())[:3]
    assert set(purged) & _raw_conv_ids_on_disk(view_path)

    tbl.purge_keys(spark, purged)

    # the view's cursor predates the purge point → expired → resync (a
    # fresh cursor would NOT do: the retained changelog starts above the
    # purge fold and never emits D for the purged conversations)
    with pytest.raises(CursorExpiredError):
        view.poll_once(spark, cursor)
    out = view.resync(spark, cursor)
    assert out["mode"] == "resync"
    vt = LakehouseTable(view_path)
    assert vt.read(spark).where(F.col("conv_id").isin(purged)).count() == 0
    # and the resync'd cursor tails normally again
    assert view.poll_once(spark, cursor)["applied"] is False

    # ...but the view's HISTORY still holds the text until it purges too
    assert set(purged) & _raw_conv_ids_on_disk(view_path)
    report = vt.purge_keys(spark, purged)
    assert report["verify"]["residual_rows"] == 0
    assert not (set(purged) & _raw_conv_ids_on_disk(view_path))
