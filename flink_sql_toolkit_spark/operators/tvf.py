"""Window TVFs (SURVEY.md §2.6): TUMBLE / HOP / SESSION / CUMULATE.

The reference's streaming centerpiece (test/syntax-test.fsql:199-239,
snippets/flink.code-snippets:45-68). Spark-first mapping:

- TUMBLE  → ``F.window(ts, size)``
- HOP     → ``F.window(ts, size, slide)``
- SESSION → ``F.session_window(ts, gap)``
- CUMULATE → no native equivalent: each row is exploded into its
  covering cumulative windows (⌈max/step⌉ of them), then tumble-
  grouped — works identically in batch and streaming, and the explode
  factor is a small constant so it scales linearly.

All four builders work on both batch and streaming frames (same
functions API); the registered queries run batch over ``events`` so
the DuckDB oracle can check them. Oracles reconstruct the windows
with epoch arithmetic / gaps-and-islands SQL.

Timestamps here use whole-second window boundaries; event_time has
microsecond precision, which both engines preserve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.operators.registry import register
from flink_sql_toolkit_spark.operators.relational import VAL_DEC
from flink_sql_toolkit_spark.tables import load_table


def tumble(df: DataFrame, ts_col: str, size: str) -> DataFrame:
    """TUMBLE(TABLE t, DESCRIPTOR(ts), size) → window() + start/end cols."""
    return df.withColumn("w", F.window(ts_col, size)).select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "*"
    ).drop("w")


def hop(df: DataFrame, ts_col: str, slide: str, size: str) -> DataFrame:
    return df.withColumn("w", F.window(ts_col, size, slide)).select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "*"
    ).drop("w")


def session(df: DataFrame, ts_col: str, gap: str) -> DataFrame:
    return df.withColumn("w", F.session_window(ts_col, gap)).select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "*"
    ).drop("w")


def cumulate(df: DataFrame, ts_col: str, step_s: int, max_s: int) -> DataFrame:
    """CUMULATE(TABLE t, DESCRIPTOR(ts), step, max).

    A row at time t inside max-window [W, W+max) belongs to every
    cumulative window [W, W+k*step) with k*step > (t - W). Explode
    each row into those windows; window_start = W, window_end =
    W + k*step. Constant fan-out ≤ max/step keeps this linear.
    """
    if max_s % step_s != 0:
        raise ValueError("CUMULATE requires max % step == 0")
    nk = max_s // step_s
    epoch = F.unix_timestamp(F.col(ts_col))
    wstart = (F.floor(epoch / max_s) * max_s).cast("long")
    offset = epoch - wstart
    ks = F.sequence((F.floor(offset / step_s) + 1).cast("int"), F.lit(nk))
    return (
        df.withColumn("_wstart", wstart)
        .withColumn("_k", F.explode(ks))
        .withColumn("window_start", F.timestamp_seconds(F.col("_wstart")))
        .withColumn(
            "window_end", F.timestamp_seconds(F.col("_wstart") + F.col("_k") * step_s)
        )
        .drop("_wstart", "_k")
    )


# =====================================================================
# Registered batch queries over `events` with DuckDB oracles
# =====================================================================


@register(
    "tvf_tumble",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) * 1000000) AS window_start,
           make_timestamp((CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) + 60) * 1000000) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def tvf_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE 1-minute windows (syntax-test.fsql:199-208)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        tumble(ev, "ts", "1 minute")
        .groupBy("window_start", "window_end", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # (8,4) input → (18,4) long-backed sum buffer (2.16× on
            # the isolated sum stage vs the (28,4) BigDecimal path;
            # see the width notes above relational.revenue_col —
            # bit-identical, cap 18× the observed value max)
            F.sum(F.col("value").cast(VAL_DEC)).cast("double").alias("total_value"),
        )
    )


@register(
    "tvf_hop_cumulate_session",
    # HOP, CUMULATE and SESSION windows tagged onto one
    # (variant, k, window_start, window_end, n_events, v) schema — one
    # driver entry proves the three non-tumbling window TVFs (k is the
    # session's user_id; NULL for the keyless hop/cumulate variants)
    oracle="""
    WITH k AS (SELECT UNNEST(range(0, 5)) AS i),
    hop_exploded AS (
      SELECT make_timestamp(CAST((floor((epoch(ts) - i * 60) / 300) * 300) + i * 60 AS BIGINT) * 1000000) AS window_start,
             e.*
      FROM events e CROSS JOIN k
      WHERE epoch(ts) >= (floor((epoch(ts) - i * 60) / 300) * 300) + i * 60
    ),
    cum_exploded AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000) AS window_start,
             make_timestamp((CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) + k.i * 900) * 1000000) AS window_end,
             e.*
      FROM events e
      CROSS JOIN (SELECT UNNEST(range(1, 5)) AS i) k
      WHERE floor(epoch(ts) / 3600) * 3600 + k.i * 900 > epoch(ts)
    )
    SELECT 'hop' AS variant, CAST(NULL AS BIGINT) AS k, window_start,
           window_start + INTERVAL 300 SECOND AS window_end,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS v
    FROM hop_exploded
    GROUP BY window_start
    UNION ALL
    SELECT 'cumulate', CAST(NULL AS BIGINT), window_start, window_end,
           COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
    FROM cum_exploded
    GROUP BY window_start, window_end
    UNION ALL
    SELECT 'session', user_id,
           MIN(ts),
           MAX(ts) + INTERVAL 600 SECOND,
           COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
    FROM (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM (
        SELECT user_id, ts, value,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 600
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      )
    )
    GROUP BY user_id, sess_id
    """,
)
def tvf_hop_cumulate_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP size=5min slide=1min (syntax-test.fsql:210-218; Spark's
    window(ts, size, slide) assigns each row to its size/slide
    covering windows — same explode Flink does) + CUMULATE step=15min
    max=1h (:231-239) + SESSION gap=10min per user (`tvf_session`,
    :220-229 — gaps-and-islands oracle), tagged and concatenated."""
    ev = load_table(spark, sf_dir, "events")
    nul = F.lit(None).cast("bigint")
    hopped = (
        hop(ev, "ts", "1 minute", "5 minutes")
        .groupBy("window_start", "window_end")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("double").alias("v"),
        )
        .select(
            F.lit("hop").alias("variant"), nul.alias("k"),
            "window_start", "window_end", "n_events", "v",
        )
    )
    cumulated = (
        cumulate(ev, "ts", 900, 3600)
        .groupBy("window_start", "window_end")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(VAL_DEC)).cast("double").alias("v"),
        )
        .select(
            F.lit("cumulate").alias("variant"), nul.alias("k"),
            "window_start", "window_end", "n_events", "v",
        )
    )
    sessions = tvf_session(spark, sf_dir).select(
        F.lit("session").alias("variant"),
        F.col("user_id").alias("k"),
        "window_start",
        "window_end",
        "n_events",
        F.col("total_value").alias("v"),
    )
    return hopped.unionByName(cumulated).unionByName(sessions)


def tvf_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION gap=10min per user (syntax-test.fsql:220-229).

    session_window merges rows closer than the gap; window_end is
    last-event + gap, matching Flink session semantics. The oracle
    reconstructs sessions with gaps-and-islands SQL.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(VAL_DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


