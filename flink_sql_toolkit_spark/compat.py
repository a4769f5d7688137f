"""Version-feature detection for the underlying PySpark build.

The engine targets PySpark >= 4.1 but degrades gracefully on older
builds. The one feature gated here today is the TIME type
(SPARK-51162 family): Spark 4.1 ships ``TimeType`` behind the
``spark.sql.timeType.enabled`` SQL conf; without it, Flink ``TIME``
columns fall back to their ISO-8601 string form (the engine's
pre-4.1 documented mapping).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

try:  # Spark >= 4.1
    from pyspark.sql.types import TimeType  # noqa: F401

    SUPPORTS_TIME_TYPE = True
except ImportError:  # pragma: no cover — container ships 4.1.2
    SUPPORTS_TIME_TYPE = False

TIME_TYPE_CONF = "spark.sql.timeType.enabled"


def ensure_time_type(spark: SparkSession) -> bool:
    """Enable the TIME type on ``spark`` if this build supports it.

    It is a runtime SQL conf (session-scoped), so this also covers
    externally supplied sessions (the driver's verify harness builds
    its own). Returns whether TIME is usable on the session.
    """
    if not SUPPORTS_TIME_TYPE:
        return False
    try:
        spark.conf.set(TIME_TYPE_CONF, "true")
        return True
    except Exception:  # noqa: BLE001 — read-only conf on some builds
        return False
