"""Custom stateful streaming operator (applyInPandasWithState): running
per-conversation rollups with state carried across micro-batches and the
checkpoint. Final emission per key must equal the batch aggregation."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from data_pipeline_spark.sources.feed import (
    FeedSpec,
    generate_feed,
    read_feed_batch,
    read_feed_stream,
)
from data_pipeline_spark.streaming.stateful import conv_activity_stream


def test_stateful_conv_activity_matches_batch(spark, tmp_path):
    feed = str(tmp_path / "feed")
    generate_feed(feed, FeedSpec(n_events=8_000, n_convs=120, seed=21, chunk_size=2_000))

    q = (
        conv_activity_stream(read_feed_stream(spark, feed, max_files_per_trigger=1))
        .writeStream.format("memory")
        .queryName("conv_activity")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM conv_activity").toPandas()
    # multiple emissions per conv (one per batch it appeared in, state
    # accumulating): the final one is the row with max events per conv
    final = emitted.sort_values("events").groupby("conv_id").last().reset_index()

    batch = (
        read_feed_batch(spark, feed)
        .where(F.col("op") != "DDL")
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("events"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deletes"),
            F.max("lsn").alias("max_lsn"),
            F.countDistinct("turn_idx").alias("n_turns"),
        )
        .toPandas()
    )
    f = final.sort_values("conv_id").reset_index(drop=True)
    b = batch.sort_values("conv_id").reset_index(drop=True)
    assert len(f) == len(b)
    for col in ["events", "deletes", "max_lsn", "n_turns"]:
        assert f[col].astype("int64").tolist() == b[col].astype("int64").tolist(), col
    # state really accumulated across micro-batches: some conv appears in
    # multiple batches, so emissions > distinct convs
    assert len(emitted) > len(final)
