"""TIME type end-to-end: Flink TIME(p) columns on Spark 4.1's native
TimeType (spark.sql.timeType.enabled — see compat.py).

The reference dialect declares TIME as a first-class type
(syntaxes/flink.tmLanguage.json types section; test/syntax-test.fsql:411
uses a TIME cast). Pre-4.1 Spark had no TimeType, so earlier rounds
mapped TIME to its ISO string form; this suite pins the native path.
"""

from __future__ import annotations

from datetime import time

import pytest

from flink_sql_toolkit_spark.compat import SUPPORTS_TIME_TYPE
from flink_sql_toolkit_spark.engine import Engine
from flink_sql_toolkit_spark.sources.ddl import flink_type_to_spark

pytestmark = pytest.mark.skipif(
    not SUPPORTS_TIME_TYPE, reason="PySpark build without TimeType"
)


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def session(engine):
    s = engine.open_session("time-test")
    yield s
    s.close()


def test_ddl_type_mapping():
    # Flink TIME defaults to second precision; Spark caps at micros
    assert flink_type_to_spark("TIME") == "time(0)"
    assert flink_type_to_spark("TIME(3)") == "time(3)"
    assert flink_type_to_spark("TIME(9)") == "time(6)"
    assert flink_type_to_spark("ARRAY<TIME(3)>") == "array<time(3)>"


def test_time_literal_and_functions(session):
    op = session.execute_statement(
        "SELECT TIME '12:34:56' AS t, HOUR(TIME '12:34:56') AS h,"
        " MINUTE(TIME '12:34:56') AS m, EXTRACT(HOUR FROM TIME '12:34:56') AS eh,"
        " CAST('01:02:03.5' AS TIME(3)) AS frac"
    )
    page = op.fetch()
    assert page["data"][0][:4] == [time(12, 34, 56), 12, 34, 12]
    assert page["data"][0][4] == time(1, 2, 3, 500000)


def test_time_comparison_and_aggregates(session):
    op = session.execute_statement(
        "SELECT MIN(t) AS mn, MAX(t) AS mx,"
        " MAX(t) > TIME '12:00:00' AS pm"
        " FROM (VALUES (TIME '01:00:00'), (TIME '23:30:00')) AS v(t)"
    )
    assert op.fetch()["data"] == [[time(1, 0), time(23, 30), True]]


def test_niladic_current_time_rewrites(session):
    # Flink's LOCALTIME / CURRENT_TIME keywords (no parens) — Spark
    # only has the function form; the rewriter bridges both
    op = session.execute_statement("SELECT LOCALTIME AS lt, CURRENT_TIME AS ct")
    row = op.fetch()["data"][0]
    assert isinstance(row[0], time) and isinstance(row[1], time)
    # CURRENT_TIMESTAMP must NOT be clobbered by the CURRENT_TIME rewrite
    op2 = session.execute_statement("SELECT CURRENT_TIMESTAMP AS ts")
    assert not isinstance(op2.fetch()["data"][0][0], time)


def test_time_column_filesystem_roundtrip(session, tmp_path):
    session.execute_statement("SET 'execution.runtime-mode'='batch'")
    session.execute_statement(
        f"""CREATE TABLE t_sched (
            id INT,
            open_at TIME(0),
            close_at TIME(3)
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{tmp_path}/sched',
            'format' = 'parquet'
        )"""
    )
    session.execute_statement(
        "INSERT INTO t_sched VALUES"
        " (1, TIME '09:00:00', TIME '17:30:00.250'),"
        " (2, TIME '08:15:00', TIME '16:00:00')"
    )
    page = session.execute_statement(
        "SELECT id, open_at, close_at FROM t_sched ORDER BY id"
    ).fetch()
    assert page["data"] == [
        [1, time(9, 0), time(17, 30, 0, 250000)],
        [2, time(8, 15), time(16, 0)],
    ]
    # DESCRIBE reports the Flink-shaped TIME(p) name
    desc = session.execute_statement("DESCRIBE t_sched").fetch()["data"]
    types = {r[0]: r[1] for r in desc}
    assert types["open_at"] == "TIME(0)"
    assert types["close_at"] == "TIME(3)"


def test_avro_time_roundtrip():
    from flink_sql_toolkit_spark.sources.avro_codec import (
        avro_schema_for_columns,
        decode_record,
        encode_record,
    )
    from flink_sql_toolkit_spark.sources.ddl import Column

    cols = [
        Column("t_ms", flink_type_to_spark("TIME(3)")),
        Column("t_us", flink_type_to_spark("TIME(6)")),
    ]
    sch = avro_schema_for_columns(cols)
    lts = [f["type"][1]["logicalType"] for f in sch["fields"]]
    assert lts == ["time-millis", "time-micros"]
    payload = encode_record(
        {"t_ms": time(12, 34, 56, 789000), "t_us": time(1, 2, 3, 456789)}, sch
    )
    out = decode_record(payload, sch)
    assert out == {
        "t_ms": time(12, 34, 56, 789000),
        "t_us": time(1, 2, 3, 456789),
    }


def test_datagen_generates_time_and_date(session):
    """datagen fills TIME/DATE columns with deterministic wall-clock
    values instead of NULLs (Flink's datagen generates every declared
    type — syntax-test.fsql datagen section)."""
    from datetime import date

    session.execute_statement("SET 'execution.runtime-mode'='batch'")
    session.execute_statement(
        """CREATE TABLE dg_t (id BIGINT, t TIME(0), d DATE)
        WITH ('connector'='datagen', 'number-of-rows'='3')"""
    )
    rows = session.execute_statement("SELECT * FROM dg_t ORDER BY id").fetch()["data"]
    assert [r[0] for r in rows] == [0, 1, 2]
    assert rows[1][1] == time(2, 2, 2)
    assert rows[1][2] == date(2024, 1, 4)
    assert all(r[1] is not None and r[2] is not None for r in rows)
