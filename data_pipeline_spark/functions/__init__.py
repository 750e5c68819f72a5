"""Columnar change-record decode (vectorized, never per-row Python UDFs)."""

from data_pipeline_spark.functions.decode import (  # noqa: F401
    decode_events,
    decode_events_sql,
)
