from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_sql_toolkit_spark.session import build_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _drop_routed_views():
    """Tests that call the streaming SQL rewriters directly (no Engine
    Operation to drop their views on cancel) leak `_over_out_*` /
    `_dedup_out_*` temp views into the session-scoped Spark fixture,
    tripping test_stateful's no-catalog-leak assertion in full-suite
    order (VERDICT r8 ask #1). Drop them after every test. Guarded on
    an ALREADY-ACTIVE session so pure-parser tests don't force Spark
    startup."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        return
    for t in s.catalog.listTables():
        if t.name.startswith(("_over_out_", "_dedup_out_")):
            s.catalog.dropTempView(t.name)
