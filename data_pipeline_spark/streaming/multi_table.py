"""Multi-table CDC ingest: one change feed carrying many tables' events.

The reference replicates a registered SET of tables per pipeline, with an
allowlist held in the `source_system_profile` audit table (reference:
data_pipeline/audit/ + extractor table-list setup — SURVEY.md §2 T2, §3).
Here: the feed carries a `table_name` column (the Oracle/MSSQL log tags every
change with its table); routing is a filter per registered table, the
allowlist an `isin` prune that Catalyst pushes into the feed scan.

LSNs are global across tables (like Oracle SCN), so each table's watermark
filter and LWW ordering remain correct on its filtered slice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA
from data_pipeline_spark.streaming.ingest import IngestJob

MULTI_EVENT_SCHEMA = T.StructType(
    [T.StructField("table_name", T.StringType(), False)] + CHANGE_EVENT_SCHEMA.fields
)


class MultiTableIngestJob:
    def __init__(
        self,
        tables: dict[str, str],  # table_name -> LakehouseTable path
        control_root: str,
        active: set[str] | None = None,  # allowlist (T2); default: all registered
        **ingest_kwargs,
    ):
        self.active = set(active) if active is not None else set(tables)
        # ddl_fast_scan off: each sub-job sees a table_name-FILTERED slice
        # of the batch, but the driver-side file scan reads whole chunk
        # files — it would pick up other tables' DDL. The Spark probe
        # applies the filter correctly.
        ingest_kwargs.setdefault("ddl_fast_scan", False)
        self.jobs = {
            name: IngestJob(path, os.path.join(control_root, name), **ingest_kwargs)
            for name, path in tables.items()
            if name in self.active
        }

    def apply_batch(self, spark: SparkSession, batch_id: int, raw: DataFrame) -> dict:
        # allowlist prune first: unregistered/inactive tables never leave the scan
        raw = raw.where(F.col("table_name").isin(*self.active))
        results = {}
        for name, job in self.jobs.items():
            sub = raw.where(F.col("table_name") == name).drop("table_name")
            results[name] = job.apply_batch(spark, batch_id, sub)
        return results

    def run_to_completion(
        self,
        spark: SparkSession,
        feed_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 8,
    ) -> None:
        stream = (
            spark.readStream.schema(MULTI_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(feed_dir)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df.sparkSession, int(bid), df)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
