"""Structured Streaming ingest: micro-batch apply loop + control table."""

from data_pipeline_spark.streaming.ingest import IngestJob  # noqa: F401
