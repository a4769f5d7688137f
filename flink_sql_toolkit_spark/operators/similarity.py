"""Similarity search over embedding columns (100 TB north star).

- ``sim_topk_bruteforce``: exact cosine top-k — the correctness
  baseline. Query set broadcast against the corpus; one pass, no
  driver collection. O(|Q|·N) — fine when |Q| is small or as the
  per-bucket kernel below.
- ``sim_lsh_bucketed``: the scale path — sign-bit LSH buckets from
  fixed anchor hyperplanes; each query only scans its own bucket
  (expected N/2^bits of the corpus). Anchors here are deterministic
  corpus vectors so the DuckDB oracle reproduces the bucketing; in
  production they'd be random Gaussian planes broadcast to executors.
- ``sim_embedding_neardup``: near-duplicate pairs (cosine ≥ 0.99)
  inside LSH buckets — embedding-space dedup without O(n²).

Determinism: dot products are left-to-right folds over the same float
values in both engines (Spark ``F.aggregate`` / DuckDB ``list_sum``
over a comprehension), elements cast to double before multiply.

Measured: at dim=64 the JVM ``F.aggregate`` fold beats a
numpy-vectorized pandas UDF (0.82 s vs 0.99 s for 78k dots at sf0.1,
local[32]) — Arrow transfer overhead exceeds the vectorization win.
For high-dim embeddings (≥512) revisit with the pandas kernel.

Vectors are unit-normalized (FIXTURES.md) so dot product == cosine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.operators.registry import register
from flink_sql_toolkit_spark.tables import load_table

N_ANCHORS = 4  # → 16 buckets; production: 12-16 bits
QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 are the query vectors
TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product, elements cast to double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_sql(a: str, b: str) -> str:
    """DuckDB mirror: list_sum folds left-to-right like F.aggregate."""
    return (
        f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"FOR i IN range(1, len({a}) + 1)])"
    )


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_dot_sql('q.qv', 'e.embedding')} AS cosine
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rn FROM ranked
    WHERE rn <= {TOP_K}
    ORDER BY query_id, rn
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set over the corpus.

    The corpus never shuffles — queries are broadcast, scoring is
    map-side, and the only shuffle is the window top-k on query_id
    (|Q|·N rows pre-filtered to k per query by the window). This is
    the plan shape that survives a 100 TB corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qv"), F.col("embedding")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("query_id", "rn")
    )


ANCHORS_SQL = f"SELECT vec_id AS aid, embedding AS av FROM embeddings WHERE vec_id < {N_ANCHORS}"

BUCKET_SQL = f"""
    buckets AS (
      SELECT e.vec_id, e.embedding,
             array_to_string(list(CASE WHEN {_dot_sql('e.embedding', 'a.av')} >= 0
                                       THEN '1' ELSE '0' END ORDER BY a.aid), '') AS bucket
      FROM embeddings e CROSS JOIN ({ANCHORS_SQL}) a
      GROUP BY e.vec_id, e.embedding
    )
"""


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id → sign-bit bucket string from the anchor hyperplanes."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("aid"), F.col("embedding").alias("av")
    )
    return (
        emb.crossJoin(F.broadcast(anchors))
        .select(
            "vec_id",
            "embedding",
            "aid",
            F.when(dot(F.col("embedding"), F.col("av")) >= 0, "1").otherwise("0").alias("bit"),
        )
        .groupBy("vec_id", "embedding")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("aid", "bit"))), lambda e: e["bit"]
                ),
            ).alias("bucket")
        )
    )


@register(
    "sim_lsh_bucketed",
    oracle=f"""
    WITH {BUCKET_SQL},
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM buckets
          WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             {_dot_sql('q.qv', 'b.embedding')} AS cosine
      FROM q JOIN buckets b ON b.bucket = q.bucket AND b.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rn FROM ranked
    WHERE rn <= {TOP_K}
    ORDER BY query_id, rn
    """,
)
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: score only within the query's LSH bucket.

    The bucket join is an equi-join on the bucket key — shuffle
    partitions by bucket, each query scans ~N/2^bits vectors. Recall
    is tunable with multi-probe (flip one bit) or more tables; the
    exact kernel within a bucket is sim_topk_bruteforce's.
    """
    buckets = lsh_buckets(spark, sf_dir)
    q = buckets.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    scored = (
        buckets.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qv"), F.col("embedding")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("query_id", "rn")
    )


@register(
    "sim_embedding_neardup",
    oracle=f"""
    WITH {BUCKET_SQL}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_dot_sql('a.embedding', 'b.embedding')} AS cosine
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_dot_sql('a.embedding', 'b.embedding')} >= 0.99
    ORDER BY vec_a, vec_b
    """,
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets.

    Same-bucket self-join (equi on bucket) keeps the pair count near
    linear; the 0.99 threshold is exact cosine on the surviving pairs.
    """
    buckets = lsh_buckets(spark, sf_dir)
    a = buckets.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket"
    )
    b = buckets.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", dot(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= 0.99)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )
