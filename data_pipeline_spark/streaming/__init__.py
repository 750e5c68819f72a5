"""Structured Streaming ingest: micro-batch apply loop + control table."""

from data_pipeline_spark.streaming.cascade import CascadeJob  # noqa: F401
from data_pipeline_spark.streaming.ingest import IngestJob  # noqa: F401
