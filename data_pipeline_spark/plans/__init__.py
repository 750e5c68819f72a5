"""Lakehouse table format: COW snapshots, schema evolution, commit log."""

from data_pipeline_spark.plans.table_format import LakehouseTable  # noqa: F401
