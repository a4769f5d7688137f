"""Operator query builders.

Each module registers named queries into a shared registry via
``flink_sql_toolkit_spark.operators.registry``. The driver contract
(`__spark_entry__.py`) exposes the merged registry.
"""

from flink_sql_toolkit_spark.operators.registry import ORACLES, QUERIES, register

# importing the package registers every query module, so QUERIES /
# ORACLES are complete regardless of what the caller imports next
from flink_sql_toolkit_spark.operators import (  # noqa: E402,F401
    asof,
    dedup,
    dialect_queries,
    functions_battery,
    match_recognize,
    multimodal,
    relational,
    similarity,
    textstats,
    tvf,
)

__all__ = ["QUERIES", "ORACLES", "register"]
