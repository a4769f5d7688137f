"""Streaming window-TVF aggregation → APPEND sink (r12).

Flink's canonical pattern `INSERT INTO sink SELECT window_start,
agg(...) FROM TABLE(TUMBLE(...)) GROUP BY window_start` previously
failed on append sinks: the TVF rewrite groups by the EXTRACTED
window_start column, which Spark's append-mode checker does not
recognize as a windowed aggregation. The engine now retries the
statement with the struct-keeping rewrite (GROUP BY gains the
window() struct — identical groups, append-legal); interactive
SELECTs keep the update-mode route unchanged.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest

from flink_sql_toolkit_spark.dialect.rewriter import rewrite
from flink_sql_toolkit_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def session(engine):
    s = engine.open_session("tvf-append")
    yield s
    s.close()


def test_struct_rewrite_shapes():
    q = (
        "SELECT window_start AS ws, COUNT(*) AS c FROM "
        "TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '10' SECOND)) "
        "GROUP BY window_start"
    )
    default = rewrite(q)
    struct = rewrite(q, tvf_group_struct=True)
    assert "EXCEPT(_w)" in default and "GROUP BY window_start" in default
    assert "EXCEPT" not in struct and struct.rstrip().endswith(", _w")
    # ordinal GROUP BYs keep their positions (append, not prepend)
    q2 = (
        "SELECT window_start, COUNT(*) FROM "
        "TABLE(HOP(TABLE t, DESCRIPTOR(ts), INTERVAL '5' MINUTE, "
        "INTERVAL '10' MINUTE)) GROUP BY 1 HAVING COUNT(*) > 2"
    )
    s2 = rewrite(q2, tvf_group_struct=True)
    assert "GROUP BY 1, _w HAVING" in s2
    # non-TVF statements are untouched by the flag
    assert rewrite("SELECT a FROM t GROUP BY a", tvf_group_struct=True) == (
        "SELECT a FROM t GROUP BY a"
    )


def test_tumble_tvf_insert_into_append_sink(session, tmp_path):
    spark = session.spark
    src, sink = f"{tmp_path}/src", f"{tmp_path}/sink"

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    # two closed windows once the watermark passes (the 2-minute row
    # pushes it far beyond both)
    rows = [(ts(1), 1), (ts(2), 1), (ts(11), 1),
            (dt.datetime(2024, 1, 1, 0, 2, 0), 1)]
    spark.createDataFrame(rows, "ts timestamp, n int").coalesce(1).write.parquet(src)

    session.execute_statement(
        f"""CREATE TABLE ta_src (ts TIMESTAMP(3), n INT,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
        WITH ('connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    session.execute_statement(
        f"""CREATE TABLE ta_sink (wstart TIMESTAMP(3), cnt BIGINT) WITH (
        'connector'='filesystem', 'path'='{sink}', 'format'='parquet')"""
    )
    op = session.execute_statement(
        "INSERT INTO ta_sink SELECT window_start AS wstart, COUNT(*) AS cnt "
        "FROM TABLE(TUMBLE(TABLE ta_src, DESCRIPTOR(ts), INTERVAL '10' SECOND)) "
        "GROUP BY window_start"
    )
    assert op.job_id, "streaming TVF INSERT must start a job"
    try:
        deadline, got = time.time() + 120, []
        while time.time() < deadline:
            try:
                got = spark.read.parquet(sink).collect()
            except Exception:
                got = []
            if len(got) >= 2:
                break
            time.sleep(1.0)
        by_start = {r.wstart: r.cnt for r in got}
        assert by_start.get(ts(0)) == 2, by_start
        assert by_start.get(ts(10)) == 1, by_start
    finally:
        session.execute_statement(f"STOP JOB '{op.job_id}'")
