"""Event-time windowed aggregation over the change feed (streaming coverage).

The engine's core path deliberately has NO stateful operator (SURVEY.md §2.2
— all state lives in the table + control table, late events are safe by
LWW). This test demonstrates the complementary monitoring surface: a
watermarked tumbling-window count over the feed (ops/minute), the kind of
stream the audit dashboard would consume. Verified against the equivalent
batch aggregation.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark.sources.feed import (
    FeedSpec,
    generate_feed,
    read_feed_batch,
    read_feed_stream,
)


def test_windowed_op_counts_stream_equals_batch(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    generate_feed(feed_dir, FeedSpec(n_events=6_000, n_convs=100, seed=42, chunk_size=2_000))

    def windowed(df):
        return (
            df.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 minute").alias("w"), F.col("op"))
            .agg(F.count("*").alias("n"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                "op",
                "n",
            )
        )

    out_dir = str(tmp_path / "out")
    q = (
        windowed(read_feed_stream(spark, feed_dir, max_files_per_trigger=1))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # append mode emits only windows closed by the watermark; the batch
    # equivalent must be filtered the same way for comparison
    streamed = spark.read.parquet(out_dir).toPandas()
    batch = windowed(read_feed_batch(spark, feed_dir)).toPandas()
    assert len(streamed) > 0
    merged = streamed.merge(batch, on=["win_start", "op"], suffixes=("_s", "_b"))
    assert (merged["n_s"] == merged["n_b"]).all()
    # every streamed window matches a batch window exactly
    assert len(merged) == len(streamed)
