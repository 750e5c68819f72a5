"""Change-feed sources: deterministic generator + batch/stream readers."""

from data_pipeline_spark.sources.feed import (  # noqa: F401
    FeedSpec,
    generate_feed,
    generate_feed_pandas,
    read_feed_batch,
    read_feed_stream,
)
