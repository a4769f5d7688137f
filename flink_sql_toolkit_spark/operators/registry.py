"""Query registry shared by all operator modules.

A query is a ``(spark, sf_dir) -> DataFrame`` builder; its oracle is
the equivalent ANSI SQL string DuckDB runs on the same parquet tables
(driver correctness gate, `__spark_entry__.py`). Column names must
match between the two — the driver sorts columns by name and hashes
values.

Determinism contract for oracle-checked queries:

- Aggregations over DOUBLE columns are computed through exact
  ``DECIMAL(18,4)`` casts (decimal addition is associative — immune to
  Spark's/DuckDB's differing reduction orders), with the final value
  cast back to DOUBLE by the identical formula on both sides.
- ``AVG``/``STDDEV`` over doubles are spelled out from exact decimal
  sufficient statistics (sum, sum-of-squares, count) so both engines
  execute the same IEEE double expression on identical inputs.
- Window/top-k/LIMIT queries always order by a key suffix that makes
  the ordering total (ties broken), since row selection must agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query builder (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
