"""Core relational operators: last-writer-wins dedup and MERGE apply."""

from data_pipeline_spark.operators.lww import lww_dedup, op_rank_expr  # noqa: F401
from data_pipeline_spark.operators.merge import merge_changeset  # noqa: F401
