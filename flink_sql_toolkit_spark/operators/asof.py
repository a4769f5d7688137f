"""Temporal (as-of) join — ``FOR SYSTEM_TIME AS OF`` (SURVEY.md §2.4).

The reference corpus declares temporal joins against versioned tables
(test/syntax-test.fsql:158-162) and lookup joins (:507-510). Spark
has no native as-of join; the batch mapping is:

    equi-join on keys + version-time range predicate
    → ROW_NUMBER() = 1 picking the latest version per probe row

Scale shape: one shuffle of each side on the join key, then a window
on the probe's unique key. When versions-per-key is bounded (the
normal dim-table case) the join fan-out is bounded; a broadcast of
the build side avoids the fact-side shuffle entirely for dim-sized
version tables. Streaming lookup joins map to stream-static joins
refreshed per micro-batch (engine handles those via connector views).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pyspark.sql import SparkSession

from flink_sql_toolkit_spark.operators.registry import register
from flink_sql_toolkit_spark.tables import load_table


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: Column,
    version_order: list[Column],
    probe_unique: list[str],
    how: str = "left",
) -> DataFrame:
    """Join each probe row to the single latest build row.

    ``on`` must include the as-of range predicate (e.g.
    ``build.ts <= probe.ts``); ``version_order`` is the build-side
    version ordering (latest first wins); ``probe_unique`` are probe
    columns forming a unique key (the window partition).
    """
    joined = probe.join(build, on, how)
    w = W.partitionBy(*probe_unique).orderBy(*version_order)
    return joined.withColumn("_asof_rn", F.row_number().over(w)).filter(
        F.col("_asof_rn") == 1
    ).drop("_asof_rn")


def asof_prev_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self as-of: each order paired with the customer's most recent
    earlier order.

    A self as-of over one table is exactly ``lag()`` over
    (key, version-order) — one shuffle on o_custkey, linear work,
    no fan-out. The generic ``asof_join`` (join + row_number prune)
    is reserved for the genuine two-table versioned-dim shape
    (``asof_lookup_latest_order``): there the bounded
    versions-per-key keeps join fan-out safe, whereas a self-join
    here would be O(orders-per-customer²) per key — a scale-killer
    on a skewed customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lag("o_totalprice").over(w).alias("prev_totalprice"),
    )


def asof_lookup_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup-join shape (``FOR SYSTEM_TIME AS OF proc_time``): each
    event looks up the latest order version for its user. All order
    versions precede the event times in the fixtures, so 'latest as
    of event time' = 'latest overall' — which the oracle can state
    independently. Build side broadcast: no event-stream shuffle."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    probe = events
    build = orders.select(
        F.col("o_custkey").alias("b_custkey"),
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("b_orderdate"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )
    on = (probe.user_id == build.b_custkey) & (build.b_orderdate <= probe.ts)
    out = asof_join(
        probe,
        F.broadcast(build),
        on,
        version_order=[F.desc("b_orderdate"), F.desc("latest_orderkey")],
        probe_unique=["event_id"],
    )
    return out.select(
        "event_id", "user_id", "latest_orderkey", "latest_totalprice"
    )


@register(
    "asof_family",
    # the self as-of join and the lookup join normalized onto one
    # (variant, k1, k2, ref_key, v) schema — one driver entry proves
    # both temporal-join shapes; each branch keeps its own plan
    oracle="""
    SELECT 'prev' AS variant, o_orderkey AS k1, o_custkey AS k2,
           LAG(o_orderkey)   OVER w AS ref_key,
           LAG(o_totalprice) OVER w AS v
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    UNION ALL
    SELECT 'lookup', e.event_id, e.user_id, l.o_orderkey, l.o_totalprice
    FROM events e
    LEFT JOIN (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) l ON l.o_custkey = e.user_id AND l.rn = 1
    """,
)
def asof_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both temporal-join shapes (`asof_prev_order` self as-of,
    `asof_lookup_latest_order` lookup join), tagged and concatenated
    (SURVEY §2.4: FOR SYSTEM_TIME AS OF)."""
    prev = asof_prev_order(spark, sf_dir).select(
        F.lit("prev").alias("variant"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("k2"),
        F.col("prev_orderkey").alias("ref_key"),
        F.col("prev_totalprice").alias("v"),
    )
    lookup = asof_lookup_latest_order(spark, sf_dir).select(
        F.lit("lookup").alias("variant"),
        F.col("event_id").alias("k1"),
        F.col("user_id").alias("k2"),
        F.col("latest_orderkey").alias("ref_key"),
        F.col("latest_totalprice").alias("v"),
    )
    return prev.unionByName(lookup)
