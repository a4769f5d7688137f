"""SparkSession construction tuned for the engine.

Local-mode defaults match the test/bench environment (local[N], one
JVM); the conf set is chosen to behave identically on a real cluster:
AQE on (runtime re-plan, skew-join handling), UTC session timezone
(Flink TIMESTAMP is wall-clock; the driver's DuckDB oracle is naive
UTC), Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def build_spark(
    app_name: str = "flink_sql_toolkit_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falls back to
    ``local[*]``) so tests and bench share one code path.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, tables.py converts to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Flink TIME columns map to Spark 4.1's TimeType (see compat.py)
        .config("spark.sql.timeType.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_spark() -> SparkSession:
    """Return the active session or build one with defaults."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_spark()
