"""Generate sf1/sf2-scale fixtures from the driver's sf0.1 parquet
(VERDICT r11 ask #1 — scale rehearsal inputs).

The driver's testdata tops out at sf0.1 (600k lineitem); every 100-TB
plan claim rested on plans measured there. This tool scales each
table K× by replication with per-replica key shifting, preserving:

- schema (derived from the source parquet, never re-declared),
- referential integrity (replica i's orders reference replica i's
  customers: every foreign key shifts by the same per-table stride),
- value distributions (non-key columns are carried verbatim;
  documents get a per-replica prefix so exact-dedup doesn't collapse
  the corpus to 1/K, which ALSO makes every doc a member of a
  K-member near-duplicate cluster — deliberately adversarial for the
  LSH bucket caps; embeddings are perturbed per (replica, position)
  so replicas are near- but not exact-duplicates in cosine space).

The explode(sequence(0, K-1)) + shift pass is shuffle-free: a row's
replicas never leave its partition; the only exchange is the final
repartition that lays out N output files so downstream scans
parallelize (the sf0.1 fixtures are single-row-group — fine for
correctness, wrong for a scan-parallelism rehearsal).

Usage: python tools/make_scale_fixtures.py [sf1] [sf2] ...
Writes to <repo>/.scale/<sf>/ (gitignored).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
BASE_SF = 0.1

# per-table key stride — far above any key the sf0.1 data contains,
# so replica key ranges never collide
STRIDES = {
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "c_custkey": 10_000_000,
    "o_custkey": 10_000_000,
    "s_suppkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "p_partkey": 10_000_000,
    "l_partkey": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
    "event_id": 1_000_000_000,
    "user_id": 10_000_000,
}

COPY_AS_IS = ("region", "nation")
SCALED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _replicate(df: DataFrame, k: int) -> DataFrame:
    """K copies per row, `_r` = replica index, keys shifted below."""
    rep = df.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    for col in df.columns:
        if col in STRIDES:
            rep = rep.withColumn(
                col, F.col(col) + F.col("_r").cast("long") * STRIDES[col]
            )
    return rep


def scale_table(spark: SparkSession, name: str, k: int, out_dir: Path) -> int:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    # events.ts is TIMESTAMP(NANOS) in the driver fixtures → arrives
    # as long under nanosAsLong; write micros timestamps out so the
    # scaled fixtures read plainly (load_table's long→micros shim
    # no-ops on them)
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() == "long":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name in COPY_AS_IS or k == 1:
        rep = df
    else:
        rep = _replicate(df, k)
        if name == "documents":
            # distinct content per replica (exact-dedup must not see
            # the whole corpus as duplicates), while keeping replicas
            # NEAR-duplicates of each other — worst-case clustering
            # pressure for MinHash/SimHash bucket caps
            rep = rep.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.lit("replica"),
                        F.col("_r").cast("string"),
                        F.lit(" "),
                        F.col("text"),
                    )
                ),
            )
            # …and ONE giant boilerplate template cluster: 1/3 of the
            # replica rows become the same fixed text — ~15k docs at
            # sf1, ~30k at sf2, both past LSH_BUCKET_CAP (10,000) —
            # so the template-cluster side output actually ENGAGES at
            # scale (the 100-TB hazard is exactly this: nav pages /
            # cookie banners forming quadratic buckets). Identical
            # text ⇒ identical signatures ⇒ one flagged bucket per
            # band, zero pair expansion.
            template = (
                "this website uses cookies to improve your experience "
                "please accept our terms of service and privacy policy "
                "to continue browsing all rights reserved contact us"
            )
            rep = rep.withColumn(
                "text",
                F.when(
                    (F.col("_r") > 0) & (F.col("doc_id") % 3 == 0),
                    F.lit(template),
                ).otherwise(F.col("text")),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if name == "embeddings":
            # position-dependent perturbation: replicas stay close in
            # cosine space (near-dup stress) but are not EXACT cosine
            # duplicates (a pure scalar multiple would be)
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: (
                        x
                        + F.col("_r").cast("float")
                        * 0.002
                        * ((j * 2654435761 % 7).cast("float") - 3.0)
                    ).cast("float"),
                ),
            )
        rep = rep.drop("_r")
    # multi-file layout: ~500k rows per output file, ≥ k files for the
    # big tables so a scan fans out
    n_rows = rep.count()
    files = max(1, min(32, n_rows // 500_000 + 1))
    out = str(out_dir / f"{name}.parquet")
    rep.repartition(files).write.mode("overwrite").parquet(out)
    return n_rows


def main() -> None:
    targets = sys.argv[1:] or ["sf1", "sf2"]
    repo = Path(__file__).resolve().parent.parent
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-fixtures")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    for sf_name in targets:
        sf = float(sf_name.removeprefix("sf"))
        k = round(sf / BASE_SF)
        out_dir = repo / ".scale" / sf_name
        out_dir.mkdir(parents=True, exist_ok=True)
        print(f"== {sf_name}: k={k} -> {out_dir}")
        only = os.environ.get("SCALE_TABLES", "")
        tables = (
            tuple(only.split(",")) if only else COPY_AS_IS + SCALED
        )
        for t in tables:
            t0 = time.time()
            n = scale_table(spark, t, k, out_dir)
            print(f"  {t:<12} {n:>12,} rows  {time.time()-t0:5.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
