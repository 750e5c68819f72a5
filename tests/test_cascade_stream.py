"""Live replication chaining: CascadeJob tails an upstream table's delta
layer and keeps a downstream table identical — including incremental
catch-up of NEW upstream commits from the same checkpoint, crash/resume of
the cascade itself, and a two-edge chain A → B → C.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql.streaming import StreamingQueryException

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed, generate_feed_pandas
from data_pipeline_spark.streaming.cascade import CascadeJob
from data_pipeline_spark.streaming.ingest import IngestJob


def _mk_upstream(spark, tmp_path, name, n_events=6_000, seed=31):
    feed = str(tmp_path / f"feed-{name}")
    generate_feed(feed, FeedSpec(n_events=n_events, n_convs=120, seed=seed, chunk_size=2_000))
    path = str(tmp_path / name)
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    IngestJob(path, str(tmp_path / f"ctl-{name}")).run_to_completion(
        spark, feed, str(tmp_path / f"cp-{name}"), max_files_per_trigger=1
    )
    return path


def _mk_empty(tmp_path, name):
    path = str(tmp_path / name)
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    return path


def _state(spark, path):
    return (
        LakehouseTable(path)
        .read(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_cascade_catchup_and_incremental(spark, tmp_path):
    """Drain the retained changelog into B; then commit MORE upstream
    batches and re-run from the SAME checkpoint — only the new deltas flow,
    and B tracks A after each round."""
    a = _mk_upstream(spark, tmp_path, "a")
    b = _mk_empty(tmp_path, "b")
    edge = CascadeJob(a, b, str(tmp_path / "ctl-edge"))
    ckpt = str(tmp_path / "cp-edge")

    edge.run_to_completion(spark, ckpt)
    pd.testing.assert_frame_equal(_state(spark, a), _state(spark, b))
    assert len(_state(spark, b)) > 0

    # new upstream activity: a second feed segment (LSNs continue past A's
    # watermark — the generator restarts at 0, which the recovery filter
    # would rightly drop) applied to A as a direct batch
    feed2 = generate_feed_pandas(FeedSpec(n_events=4_000, n_convs=120, seed=77))
    feed2["lsn"] = feed2["lsn"] + LakehouseTable(a).current_snapshot()["watermark_lsn"]
    IngestJob(a, str(tmp_path / "ctl-a")).apply_batch(
        spark, 99, spark.createDataFrame(feed2, schema=CHANGE_EVENT_SCHEMA)
    )
    control_files_before = len(
        [r for r in (tmp_path / "ctl-edge").iterdir() if r.suffix == ".parquet"]
    )

    edge.run_to_completion(spark, ckpt)  # same checkpoint: incremental
    pd.testing.assert_frame_equal(_state(spark, a), _state(spark, b))
    control_files_after = len(
        [r for r in (tmp_path / "ctl-edge").iterdir() if r.suffix == ".parquet"]
    )
    assert control_files_after > control_files_before  # new batches applied


def test_cascade_crash_resume_idempotent(spark, tmp_path):
    """Kill the cascade after one micro-batch; resume from the checkpoint.
    Re-delivered rows are LWW no-ops, replayed batch_ids are skipped — B
    still converges to A exactly.

    maxFilesPerTrigger=4 also makes this the ordering regression test: the
    file source batches the backlog by mtime, not upstream commit order, so
    later micro-batches carry older LSNs — the edge must NOT let the
    downstream watermark filter eat them (caught live: 195 rows lost when
    apply ran with enforce_watermark=True)."""
    a = _mk_upstream(spark, tmp_path, "a3", seed=5)
    b = _mk_empty(tmp_path, "b3")
    edge = CascadeJob(a, b, str(tmp_path / "ctl-e3"))
    ckpt = str(tmp_path / "cp-e3")

    q = edge.start(
        spark, ckpt, available_now=True, max_files_per_trigger=4, fail_after_batches=1
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()

    edge.run_to_completion(spark, ckpt)
    pd.testing.assert_frame_equal(_state(spark, a), _state(spark, b))


def test_cascade_two_edge_chain(spark, tmp_path):
    """A → B → C: the downstream table is itself MOR, so ITS delta layer is
    a changelog too — replication trees compose edge by edge."""
    a = _mk_upstream(spark, tmp_path, "a4", seed=13)
    b = str(tmp_path / "b4")
    LakehouseTable(b).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    c = _mk_empty(tmp_path, "c4")

    CascadeJob(a, b, str(tmp_path / "ctl-ab")).run_to_completion(
        spark, str(tmp_path / "cp-ab")
    )
    CascadeJob(b, c, str(tmp_path / "ctl-bc")).run_to_completion(
        spark, str(tmp_path / "cp-bc")
    )
    pd.testing.assert_frame_equal(_state(spark, a), _state(spark, c))


def test_cascade_refuses_schema_drift(spark, tmp_path):
    a = _mk_upstream(spark, tmp_path, "a5", n_events=1_000, seed=3)
    b = _mk_empty(tmp_path, "b5")
    LakehouseTable(b).apply_ddl([{"action": "rename_column", "old": "text", "new": "body"}])
    with pytest.raises(ValueError, match="schema drift"):
        CascadeJob(a, b, str(tmp_path / "ctl-e5")).start(spark, str(tmp_path / "cp-e5"))
