"""Operator library: reference-parity CDC pipeline + relational and
LLM-pipeline operators, all expressed as DataFrame transformations."""

from aws_glue_data_lake_spark.operators.cdc import (
    CDCResult,
    drop_columns,
    full_load,
    get_partition_cols,
    has_op_col,
    incremental_merge,
    latest_per_key,
    remove_deletes,
)

__all__ = [
    "CDCResult",
    "drop_columns",
    "full_load",
    "get_partition_cols",
    "has_op_col",
    "incremental_merge",
    "latest_per_key",
    "remove_deletes",
]
