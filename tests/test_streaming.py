"""Streaming semantics tests: file-stream sources, windowed aggs
through the engine, watermark wiring (SURVEY.md §5.4)."""

from __future__ import annotations

import time

import pytest

from flink_sql_toolkit_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def session(engine):
    s = engine.open_session("stream-test")
    yield s
    s.close()


def test_filesystem_stream_tumble_agg(session, sf_dir):
    """A filesystem source consumed as a stream must produce the same
    windowed totals as the batch read once fully processed."""
    session.execute_statement(
        f"""
        CREATE TABLE fs_orders (
          o_orderkey BIGINT,
          o_totalprice DOUBLE,
          o_orderdate TIMESTAMP_LTZ(6)
        ) WITH ('connector'='filesystem', 'path'='{sf_dir}/orders.parquet', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        "SELECT window_start, COUNT(*) AS n FROM "
        "TABLE(TUMBLE(TABLE fs_orders, DESCRIPTOR(o_orderdate), INTERVAL '365' DAY)) "
        "GROUP BY window_start"
    )
    assert op.status == "RUNNING"
    total, token = 0, 0
    seen: dict = {}
    deadline = time.time() + 60
    while time.time() < deadline:
        page = op.fetch(token)
        token = page["nextResultToken"]
        for w, n in page["data"]:
            seen[w] = n  # update-mode: later pages revise windows
        if sum(seen.values()) >= 1500:
            break
        time.sleep(0.5)
    op.cancel()
    assert sum(seen.values()) == 1500  # all orders in exactly one window


def test_watermark_reaches_the_plan(session):
    session.execute_statement(
        """
        CREATE TABLE wm_src (
          v BIGINT,
          ts TIMESTAMP_LTZ(3) METADATA FROM 'timestamp',
          WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
        ) WITH ('connector'='datagen', 'rows-per-second'='10')
        """
    )
    df = session.spark.table("wm_src")
    analyzed = str(df._jdf.queryExecution().analyzed())
    assert "EventTimeWatermark" in analyzed
    assert "10 seconds" in analyzed


def test_stop_all_jobs_on_close(engine, sf_dir):
    s = engine.open_session("closing")
    s.execute_statement(
        "CREATE TABLE g (v BIGINT) WITH ('connector'='datagen', 'rows-per-second'='10')"
    )
    s.execute_statement("CREATE TABLE bh (v BIGINT) WITH ('connector'='blackhole')")
    op = s.execute_statement("INSERT INTO bh SELECT v FROM g")
    assert any(j.status == "RUNNING" for j in s.jobs.list())
    s.close()
    deadline = time.time() + 10
    while time.time() < deadline and any(j.status == "RUNNING" for j in s.jobs.list()):
        time.sleep(0.2)
    assert all(j.status != "RUNNING" for j in s.jobs.list())


def test_stream_static_lookup_join(session, sf_dir, tmp_path):
    """Lookup-join shape (§2.4): a file stream enriched against a
    static dim via plain SQL through the engine — Spark's
    stream-static join re-reads the dim per micro-batch, which is
    exactly Flink's processing-time lookup join semantics."""
    session.spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation_dim")
    session.execute_statement(
        f"""
        CREATE TABLE supp_stream (s_suppkey BIGINT, s_name STRING, s_nationkey INT)
        WITH ('connector'='filesystem', 'path'='{sf_dir}/supplier.parquet', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        "SELECT s.s_name, n.n_name FROM supp_stream s "
        "JOIN nation_dim n ON s.s_nationkey = n.n_nationkey"
    )
    assert op.status == "RUNNING"
    got, token = [], 0
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 10:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(page["data"])
        time.sleep(0.5)
    op.cancel()
    assert len(got) == 10  # every supplier enriched exactly once
    assert all(r[1] is not None for r in got)


def test_hint_stripping_through_engine(session):
    # Flink-only hints must not break Spark; join hints pass through
    page = session.execute_statement(
        "SELECT /*+ OPTIONS('a'='b'), MINI_BATCH('enabled'='true') */ 1 AS x"
    ).fetch()
    assert page["data"] == [[1]]
    page = session.execute_statement(
        "SELECT /*+ BROADCAST(t) */ * FROM (SELECT 2 AS y) t"
    ).fetch()
    assert page["data"] == [[2]]
