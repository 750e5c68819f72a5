"""CDC cascade (the K1 producer's payload builder, end-to-end): a table's
changelog re-published as a change-event feed must drive a downstream table
to the IDENTICAL state — A → read_changes → changes_to_feed → (Kafka wire
hop) → decode → apply → B, with B == A. This is the reference topology of
chained replication targets (SURVEY.md §2 K1/S4): every downstream consumer
sees table A's changes exactly like a source feed.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed
from data_pipeline_spark.sources.kafka import (
    changes_to_feed,
    decode_kafka_envelope,
    encode_kafka_envelope,
)
from data_pipeline_spark.streaming.ingest import IngestJob


def _ingest(spark, tmp_path, name, **create_kw):
    feed = str(tmp_path / f"feed-{name}")
    generate_feed(feed, FeedSpec(n_events=6_000, n_convs=120, seed=21, chunk_size=2_000))
    path = str(tmp_path / name)
    LakehouseTable(path).create(
        TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9, **create_kw
    )
    job = IngestJob(path, str(tmp_path / f"ctl-{name}"))
    job.run_to_completion(spark, feed, str(tmp_path / f"cp-{name}"), max_files_per_trigger=1)
    return LakehouseTable(path)


def _table_state(spark, tbl):
    return (
        tbl.read(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_cascade_feed_schema_is_change_event_schema(spark, tmp_path):
    tbl_a = _ingest(spark, tmp_path, "a")
    cascade = changes_to_feed(tbl_a.read_changes(spark, 0))
    assert [(f.name, f.dataType.simpleString()) for f in cascade.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in CHANGE_EVENT_SCHEMA.fields
    ]
    pdf = cascade.toPandas()
    # deletes cascade as tombstones with a null payload
    assert (pdf["op"] == "D").any()
    assert pdf.loc[pdf["op"] == "D", "payload"].isna().all()
    assert pdf.loc[pdf["op"] != "D", "payload"].notna().all()
    # engine columns never leak into payloads
    assert not pdf.loc[pdf["op"] != "D", "payload"].str.contains("_snapshot_id|_batch_id|_change_op|_set_mask").any()


def test_cascade_applies_to_identical_table(spark, tmp_path):
    """Direct cascade: apply A's republished changelog to empty B; B == A."""
    tbl_a = _ingest(spark, tmp_path, "a2")
    cascade = changes_to_feed(tbl_a.read_changes(spark, 0))

    b = str(tmp_path / "b2")
    LakehouseTable(b).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    IngestJob(b, str(tmp_path / "ctl-b2")).apply_batch(spark, 0, cascade)

    pd.testing.assert_frame_equal(
        _table_state(spark, tbl_a), _table_state(spark, LakehouseTable(b))
    )


def test_cascade_through_kafka_wire_hop(spark, tmp_path):
    """Full topology: changelog → feed → Kafka envelope → broker metadata →
    decode → apply. The downstream table matches A through the whole hop."""
    tbl_a = _ingest(spark, tmp_path, "a3")
    wired = encode_kafka_envelope(changes_to_feed(tbl_a.read_changes(spark, 0))).select(
        "key", "value",
        F.lit("cascade").alias("topic"), F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"), F.lit(0).alias("timestampType"),
    )
    via_kafka = decode_kafka_envelope(wired)

    b = str(tmp_path / "b3")
    LakehouseTable(b).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    IngestJob(b, str(tmp_path / "ctl-b3")).apply_batch(spark, 0, via_kafka)

    pd.testing.assert_frame_equal(
        _table_state(spark, tbl_a), _table_state(spark, LakehouseTable(b))
    )


def test_cascade_incremental_batches_match(spark, tmp_path):
    """Replaying the changelog batch-by-batch (one downstream apply per
    upstream snapshot, as a streaming consumer would) also converges to A —
    and the downstream recovery filter tolerates a re-delivered batch."""
    tbl_a = _ingest(spark, tmp_path, "a4")
    changes = tbl_a.read_changes(spark, 0)
    snapshot_ids = sorted(
        r["_snapshot_id"] for r in changes.select("_snapshot_id").distinct().collect()
    )
    assert len(snapshot_ids) >= 3  # multi-batch upstream history

    b = str(tmp_path / "b4")
    LakehouseTable(b).create(TRANSCRIPT_SCHEMA, n_buckets=4)
    job_b = IngestJob(b, str(tmp_path / "ctl-b4"))
    for i, sid in enumerate(snapshot_ids):
        batch = changes_to_feed(changes.filter(F.col("_snapshot_id") == sid))
        job_b.apply_batch(spark, i, batch)
    # duplicate delivery of the final batch must be a no-op (idempotent apply)
    job_b.apply_batch(
        spark,
        len(snapshot_ids) - 1,
        changes_to_feed(changes.filter(F.col("_snapshot_id") == snapshot_ids[-1])),
    )

    pd.testing.assert_frame_equal(
        _table_state(spark, tbl_a), _table_state(spark, LakehouseTable(b))
    )


def test_cascade_rejects_partial_image_changelog(spark, tmp_path):
    """to_json can't encode _set_mask's set-to-null vs unset distinction —
    republishing a partial-mode changelog must raise, not corrupt."""
    tbl_a = _ingest(spark, tmp_path, "a5", update_mode="partial")
    with pytest.raises(ValueError, match="_set_mask"):
        changes_to_feed(tbl_a.read_changes(spark, 0))
