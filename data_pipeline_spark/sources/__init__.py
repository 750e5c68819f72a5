"""Change-feed sources: deterministic generator + batch/stream readers +
the Kafka production transport (factories + envelope codec)."""

from data_pipeline_spark.sources.feed import (  # noqa: F401
    FeedSpec,
    generate_feed,
    generate_feed_pandas,
    read_feed_batch,
    read_feed_stream,
)
from data_pipeline_spark.sources.kafka import (  # noqa: F401
    changes_to_feed,
    decode_kafka_envelope,
    encode_kafka_envelope,
    read_kafka_feed_stream,
    write_kafka_feed_stream,
)
