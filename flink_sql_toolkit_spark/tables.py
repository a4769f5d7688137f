"""Test-table loading + registration (TESTDATA.md star schema).

Tables are the driver's parquet fixtures: TPC-H-ish star schema plus
``events`` (stream), ``documents`` / ``embeddings`` (LLM-pipeline).
Loaded lazily with ``spark.read.parquet`` — Catalyst handles column
pruning / predicate pushdown into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Set here (not only in build_spark) because the driver's verify
    # harness supplies its own SparkSession; it's a runtime SQL conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Parquet TIMESTAMP(NANOS) columns arrive as long (see session.py
    # nanosAsLong conf); convert to Spark's micros timestamps. Integer
    # `div` — ns since 1970 exceeds double's 2^53 exact range.
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() == "long":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view; return the frames.

    Temp-view registration keeps everything declarative — queries over
    the views get full pushdown/pruning, identical to reading the
    parquet directly.
    """
    frames: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        frames[name] = df
    return frames
