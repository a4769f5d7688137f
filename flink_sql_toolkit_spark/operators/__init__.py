"""Operator query builders.

Each module registers named queries into a shared registry via
``flink_sql_toolkit_spark.operators.registry``. The driver contract
(`__spark_entry__.py`) exposes the merged registry.
"""

from flink_sql_toolkit_spark.operators.registry import ORACLES, QUERIES, register

__all__ = ["QUERIES", "ORACLES", "register"]
