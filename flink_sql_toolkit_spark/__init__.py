"""flink_sql_toolkit_spark — a PySpark-native analytics engine with the
query/data-processing surface of DafaWiratama/flink-sql-toolkit.

The reference (see SURVEY.md) is a VS Code client for a Flink SQL
Gateway; its capabilities are (a) the Flink SQL dialect surface it
declares and (b) the gateway execution lifecycle it drives. This
package re-expresses both Spark-first:

- ``Engine`` / ``Session`` / ``Operation`` — gateway-shaped API over
  ``SparkSession`` with token-paged results
  (reference: src/flinkClient.ts:144-172, src/sessionManager.ts).
- ``dialect`` — quote/comment-aware statement splitting and
  Flink-SQL → Spark-SQL rewriting (window TVFs, function shims,
  1-based indexing) (reference: syntaxes/flink.tmLanguage.json,
  test/syntax-test.fsql).
- ``sources`` — ``CREATE TABLE ... WITH('connector'=...)`` DDL →
  Spark readers/writers (reference: test/syntax-test.fsql:626-720).
- ``streaming`` — window TVFs, watermarks, job registry, paged
  streaming result buffer (reference: src/notebookController.ts).
- ``operators`` — relational query builders plus LLM-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal).
"""

from flink_sql_toolkit_spark.session import build_spark, get_spark
from flink_sql_toolkit_spark.tables import TPCH_TABLES, load_table, register_tables

__version__ = "0.1.0"

__all__ = [
    "build_spark",
    "get_spark",
    "load_table",
    "register_tables",
    "TPCH_TABLES",
]
