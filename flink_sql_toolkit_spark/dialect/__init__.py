"""Flink-SQL dialect layer: statement splitting + SQL rewriting.

The reference declares a Flink SQL surface (grammar + completion +
snippet + 725-line corpus — SURVEY.md §2) and ships raw statements to
a gateway. Here the dialect layer is real: it splits scripts, rewrites
Flink-only constructs into Spark SQL, and classifies statements for
the engine's dispatcher.
"""

from flink_sql_toolkit_spark.dialect.splitter import split_statements, strip_leading_comments
from flink_sql_toolkit_spark.dialect.rewriter import rewrite

__all__ = ["split_statements", "strip_leading_comments", "rewrite"]
