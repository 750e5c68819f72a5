"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real engine lives in ``data_pipeline_spark``; the query registry is
``data_pipeline_spark.driver_queries`` (one entry per implemented operator
from SURVEY.md §2, plus the training-data-pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: last-writer-wins dedup over
    the events change-feed analog (the engine's core operator, SURVEY.md §2
    T5/W1)."""
    return driver_queries.Q["lww_latest_by_user"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(driver_queries.Q)


def oracle_sql() -> dict[str, str]:
    return dict(driver_queries.SQL)
