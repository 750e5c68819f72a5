"""Kafka transport (VERDICT r2 #7): the swap is code, not a comment.

No broker or kafka jar exists in the sandbox, so the tests pin everything
short of the socket: the envelope codec round-trips change events through
Kafka's wire schema losslessly (batch DataFrames with KAFKA_WIRE_SCHEMA),
and the factory provably constructs a ``format("kafka")`` plan (the load
fails with the data-source-not-found error naming kafka — i.e. the option
surface reached the real Kafka source lookup)."""

from __future__ import annotations

import pandas as pd
import pytest

from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    decode_kafka_envelope,
    encode_kafka_envelope,
    read_kafka_feed_stream,
)


def test_envelope_roundtrip_lossless(spark):
    """encode → (wire) → decode reproduces the feed exactly, including DDL
    rows (null conv_id/turn_idx/ts), null payloads on deletes, and µs
    timestamps."""
    feed = generate_feed_pandas(
        FeedSpec(n_events=2_000, n_convs=50, seed=3, with_ddl=True)
    )
    events = spark.createDataFrame(feed, schema=CHANGE_EVENT_SCHEMA)
    wire = encode_kafka_envelope(events)
    assert [f.name for f in wire.schema.fields] == ["key", "value"]
    assert all(f.dataType.simpleString() == "binary" for f in wire.schema.fields)

    # simulate the broker hop: add Kafka's metadata columns
    from pyspark.sql import functions as F

    wired = wire.select(
        "key", "value",
        F.lit("transcripts").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    back = (
        decode_kafka_envelope(wired)
        .toPandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    orig = feed.sort_values("lsn").reset_index(drop=True)
    assert back["lsn"].tolist() == orig["lsn"].tolist()
    assert back["op"].tolist() == orig["op"].tolist()
    assert back["conv_id"].fillna("∅").tolist() == orig["conv_id"].fillna("∅").tolist()
    assert (
        back["turn_idx"].fillna(-1).astype(int).tolist()
        == orig["turn_idx"].fillna(-1).astype(int).tolist()
    )
    assert back["payload"].fillna("∅").tolist() == orig["payload"].fillna("∅").tolist()
    pd.testing.assert_series_equal(back["ts"], orig["ts"], check_names=False)


def test_decoded_schema_matches_change_event_schema(spark):
    empty = spark.createDataFrame([], KAFKA_WIRE_SCHEMA)
    out = decode_kafka_envelope(empty)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in CHANGE_EVENT_SCHEMA.fields
    ]


def test_decode_then_engine_merge_equals_file_transport(spark, tmp_path):
    """The decoded Kafka stream feeds the SAME apply path as the file
    transport: batch-apply the decoded events and compare final table state
    against applying the original feed directly."""
    from data_pipeline_spark.plans.table_format import LakehouseTable
    from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
    from data_pipeline_spark.streaming.ingest import IngestJob
    from pyspark.sql import functions as F

    feed = generate_feed_pandas(FeedSpec(n_events=3_000, n_convs=60, seed=9))
    events = spark.createDataFrame(feed, schema=CHANGE_EVENT_SCHEMA)
    wired = encode_kafka_envelope(events).select(
        "key", "value",
        F.lit("t").alias("topic"), F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"), F.lit(0).alias("timestampType"),
    )
    via_kafka = decode_kafka_envelope(wired)

    results = {}
    for name, src in (("file", events), ("kafka", via_kafka)):
        path = str(tmp_path / name)
        LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4)
        IngestJob(path, str(tmp_path / f"ctl-{name}")).apply_batch(spark, 0, src)
        results[name] = (
            LakehouseTable(path).read(spark).toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(results["file"], results["kafka"])


def test_reader_factory_builds_kafka_source_plan(spark):
    """Without the kafka jar the factory must fail AT SOURCE LOOKUP with an
    error naming the kafka data source — proof the options reach a real
    ``format("kafka")`` reader (not a stub that would silently no-op)."""
    with pytest.raises(Exception) as ei:
        read_kafka_feed_stream(spark, "broker:9092", "transcripts",
                               max_offsets_per_trigger=10_000)
    msg = str(ei.value)
    assert "kafka" in msg.lower()
    assert "FAILED_TO_FIND" in msg.upper().replace(" ", "_") or "find" in msg.lower()
