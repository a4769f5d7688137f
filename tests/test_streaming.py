"""Streaming semantics tests: file-stream sources, windowed aggs
through the engine, watermark wiring (SURVEY.md §5.4)."""

from __future__ import annotations

from fastwrite import write_rows

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


def test_source_watermark_reaches_the_plan(session):
    """WATERMARK FOR ts AS SOURCE_WATERMARK() (connector-provided
    watermark, tmLanguage.json:467) maps to a zero-delay Spark
    watermark — the tightest sound bound, per SURVEY §2.11."""
    session.execute_statement(
        """
        CREATE TABLE wm_src2 (
          v BIGINT,
          ts TIMESTAMP_LTZ(3) METADATA FROM 'timestamp',
          WATERMARK FOR ts AS SOURCE_WATERMARK()
        ) WITH ('connector'='datagen', 'rows-per-second'='10')
        """
    )
    df = session.spark.table("wm_src2")
    analyzed = str(df._jdf.queryExecution().analyzed())
    assert "EventTimeWatermark" in analyzed
    assert "0 seconds" in analyzed


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


def test_late_data_side_output(spark, tmp_path):
    """Rows older than the event-time watermark land in the late
    side output instead of being silently dropped (streaming/late.py
    — SURVEY §2.11's declared gap). Two single-file micro-batches:
    batch 1 advances the watermark; batch 2 carries one row behind it
    and one ahead of it."""
    import os
    import shutil
    from datetime import datetime

    from flink_sql_toolkit_spark.streaming.late import start_with_late_split

    src = tmp_path / "src"
    src.mkdir()

    def drop_file(rows, name, mtime):
        stage = tmp_path / f"stage_{name}"
        write_rows(str(stage), rows, "id long, ts timestamp")
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        dest = src / f"{name}.parquet"
        shutil.copy(part, dest)
        os.utime(dest, (mtime, mtime))

    t = lambda m: datetime(2026, 1, 1, 10, m)  # noqa: E731
    # batch 1: max event time 10:10 -> watermark after batch = 10:05
    drop_file([(1, t(0)), (2, t(10))], "b1", 1_000_000)
    # batch 2: id 3 at 10:02 is behind the 10:05 watermark -> late
    drop_file([(3, t(2)), (4, t(30))], "b2", 1_000_100)

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    on_rows, late_rows = [], []
    query, split = start_with_late_split(
        stream,
        "ts",
        "5 minutes",
        on_time=lambda df, _b: on_rows.extend(r.id for r in df.collect()),
        late=lambda df, _b: late_rows.extend(r.id for r in df.collect()),
        trigger={"availableNow": True},
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert query.awaitTermination(120)
    assert split.batches == 2
    assert sorted(late_rows) == [3]
    assert sorted(on_rows) == [1, 2, 4]


def test_late_split_watermark_reconstruction():
    """The split reproduces Spark's watermark update rule from
    progress metadata: running max of per-batch event-time max minus
    the delay, monotonic, and never behind the reported watermark."""
    from datetime import datetime, timezone

    from flink_sql_toolkit_spark.streaming.late import LateDataSplit, _parse_interval

    class FakeQuery:
        def __init__(self):
            self.lastProgress = None

    q = FakeQuery()
    split = LateDataSplit("ts", "1 hour 30 minutes", lambda *_: None, lambda *_: None)
    split.attach(q)
    assert _parse_interval("1 hour 30 minutes").total_seconds() == 5400
    assert split.current_watermark() is None  # no batch completed yet

    utc = timezone.utc
    q.lastProgress = {"eventTime": {"max": "2026-01-01T12:00:00.000Z",
                                    "watermark": "1970-01-01T00:00:00.000Z"}}
    assert split.current_watermark() == datetime(2026, 1, 1, 10, 30, tzinfo=utc)

    # an out-of-order batch (older max) must not regress the watermark
    q.lastProgress = {"eventTime": {"max": "2026-01-01T09:00:00.000Z"}}
    assert split.current_watermark() == datetime(2026, 1, 1, 10, 30, tzinfo=utc)

    # a reported watermark ahead of the reconstruction (checkpoint
    # restart: the restored watermark pre-dates any observed batch) wins
    q.lastProgress = {"eventTime": {"watermark": "2026-01-01T11:00:00.000Z"}}
    assert split.current_watermark() == datetime(2026, 1, 1, 11, 0, tzinfo=utc)


def test_job_detail(session):
    """jobs.detail(job_id): the GET /jobs/{id} analogue — status +
    StreamingQueryProgress metadata for a named continuous INSERT."""
    session.execute_statement(
        "CREATE TABLE det_src (v BIGINT) WITH ('connector'='datagen', 'rows-per-second'='50')"
    )
    session.execute_statement(
        "CREATE TABLE det_sink (v BIGINT) WITH ('connector'='blackhole')"
    )
    op = session.execute_statement("INSERT INTO det_sink SELECT v FROM det_src")
    try:
        d = session.jobs.detail(op.job_id)
        assert d["jobID"] == op.job_id
        assert d["status"] == "RUNNING"
        assert d["exception"] is None
        deadline = time.time() + 30
        while time.time() < deadline and session.jobs.detail(op.job_id)["lastProgress"] is None:
            time.sleep(0.5)
        progress = session.jobs.detail(op.job_id)["lastProgress"]
        assert progress and "batchId" in progress
    finally:
        session.jobs.stop(op.job_id)
    with pytest.raises(LookupError):
        session.jobs.detail("nope")


# -- ring buffer boundedness (VERDICT r4 ask #1) ----------------------


def test_buffer_append_batch_total_accounting():
    from flink_sql_toolkit_spark.streaming.buffer import PAYLOAD, StreamResultBuffer

    buf = StreamResultBuffer(max_rows=10)
    # A 5000-row batch of which only the trailing 10 were materialized.
    tail = [[i] for i in range(4990, 5000)]
    buf.append_batch(tail, total=5000)
    page = buf.fetch(0)
    assert page["resultType"] == PAYLOAD
    assert page["data"] == tail
    assert page["offset"] == 4990
    assert page["totalRows"] == 5000
    assert page["nextResultToken"] == 5000
    # A following small batch keeps token arithmetic exact.
    buf.append_batch([[5000], [5001]])
    page = buf.fetch(5000)
    assert page["data"] == [[5000], [5001]]
    assert page["nextResultToken"] == 5002
    assert page["totalRows"] == 5002


def test_buffer_sequential_tokens_no_duplicates():
    """The reference's streaming poll loop increments its token by one
    per poll (src/notebookController.ts:221-246) instead of following
    nextResultToken — the real gateway numbers pages sequentially. A
    request for last_token+1 is served as 'the next page', never as a
    near-full ring re-read of duplicates (r11 conformance fix)."""
    from flink_sql_toolkit_spark.streaming.buffer import EOS, StreamResultBuffer

    buf = StreamResultBuffer(max_rows=1000)
    buf.append_batch([[i] for i in range(100)])
    seen = []
    page = buf.fetch(0)
    seen.extend(r[0] for r in page["data"])
    # the client now polls 1, 2, 3, … as new batches arrive
    buf.append_batch([[i] for i in range(100, 150)])
    page = buf.fetch(1)
    seen.extend(r[0] for r in page["data"])
    assert page["data"] == [[i] for i in range(100, 150)]  # only the new rows
    buf.append_batch([[150]])
    page = buf.fetch(2)
    seen.extend(r[0] for r in page["data"])
    assert seen == list(range(151))  # every row exactly once
    # an empty sequential poll, then EOS once finished
    page = buf.fetch(3)
    assert page["data"] == []
    buf.finish()
    assert buf.fetch(4)["resultType"] == EOS


def test_buffer_same_token_retry_reserves_page():
    from flink_sql_toolkit_spark.streaming.buffer import StreamResultBuffer

    buf = StreamResultBuffer(max_rows=1000)
    buf.append_batch([[i] for i in range(10)])
    buf.fetch(0)
    buf.append_batch([[i] for i in range(10, 20)])
    first = buf.fetch(1)["data"]
    assert first == [[i] for i in range(10, 20)]
    # a retry of the SAME token re-serves that page (plus anything newer)
    retry = buf.fetch(1)["data"]
    assert retry[: len(first)] == first


def test_buffer_absolute_tokens_still_served():
    """nextResultToken-following clients keep the absolute semantics:
    token 0 is always the current ring, and explicit absolute positions
    (not last+1) are honored."""
    from flink_sql_toolkit_spark.streaming.buffer import StreamResultBuffer

    buf = StreamResultBuffer(max_rows=10)
    buf.append_batch([[i] for i in range(5)])
    t = buf.fetch(0)["nextResultToken"]
    buf.append_batch([[i] for i in range(5, 8)])
    page = buf.fetch(t)
    assert page["data"] == [[5], [6], [7]]
    # token 0 after other fetches: the whole ring again
    assert [r[0] for r in buf.fetch(0)["data"]] == list(range(8))
    # explicit absolute re-read from position 6
    assert buf.fetch(6)["data"] == [[6], [7]]


def test_foreach_batch_bounds_driver_materialization(spark, monkeypatch):
    """A catch-up micro-batch larger than the ring must never collect
    more than ``max_rows`` rows to the driver."""
    from flink_sql_toolkit_spark.streaming.buffer import StreamResultBuffer

    buf = StreamResultBuffer(max_rows=100)
    materialized = []
    orig = StreamResultBuffer.append_batch

    def spy(self, rows, total=None):
        materialized.append(len(rows))
        return orig(self, rows, total=total)

    monkeypatch.setattr(StreamResultBuffer, "append_batch", spy)
    backlog = spark.range(0, 5000).selectExpr("id AS v")
    buf.foreach_batch(backlog, 0)
    assert materialized == [100]  # tail only, never the full batch
    page = buf.fetch(0)
    assert len(page["data"]) == 100
    assert page["data"][0] == [4900] and page["data"][-1] == [4999]
    assert page["offset"] == 4900
    assert page["totalRows"] == 5000

    # Restart-backlog then steady state: a second normal-sized batch
    # appends after the backlog with exact tokens.
    small = spark.range(5000, 5005).selectExpr("id AS v")
    buf.foreach_batch(small, 1)
    assert materialized == [100, 5]
    page = buf.fetch(page["nextResultToken"])
    assert [r[0] for r in page["data"]] == [5000, 5001, 5002, 5003, 5004]
    assert page["totalRows"] == 5005

    # Empty batch is a no-op.
    buf.foreach_batch(spark.range(0, 0).selectExpr("id AS v"), 2)
    assert materialized == [100, 5]


def test_streaming_match_recognize_sql(session, tmp_path, spark):
    """The corpus MATCH_RECOGNIZE statement shape over a STREAMING
    table routes to the stateful cross-batch operator and pages
    results through the ring buffer."""
    rows = [
        (1, 1, "view"), (1, 2, "view"), (1, 3, "purchase"),
        (1, 4, "view"), (1, 5, "purchase"),
        (2, 1, "purchase"),  # no A before → no match
    ]
    write_rows(f"{tmp_path}/mrstream", rows, "user_id long, seq long, event_type string")
    session.execute_statement(
        f"""
        CREATE TABLE mr_stream (
          user_id BIGINT, seq BIGINT, event_type STRING
        ) WITH ('connector'='filesystem', 'path'='{tmp_path}/mrstream', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        """
        SELECT * FROM mr_stream
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY seq
            MEASURES FIRST(A.seq) AS start_seq,
                     LAST(B.seq) AS end_seq,
                     COUNT(A.*) AS n_before
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE A AS event_type <> 'purchase',
                   B AS event_type = 'purchase'
        )
        """
    )
    assert op.status == "RUNNING"
    got, token = [], 0
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 2:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(tuple(r) for r in page["data"])
        time.sleep(0.5)
    op.cancel()
    assert sorted(got) == [(1, 1, 3, 2), (1, 4, 5, 1)]


def test_changelog_result_mode(session, tmp_path):
    """`SET 'sql-client.execution.result-mode'='changelog'`: streaming
    aggregate results carry their RowKind in a leading `op` column —
    +I on a key's first value, then a -U(old)/+U(new) retraction pair
    on each update-mode re-emission (Flink's changelog view)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "clog"
    d.mkdir()
    pq.write_table(
        pa.table({"k": ["a", "a", "b"], "v": [1, 2, 10]}), d / "f1.parquet"
    )
    session.execute_statement("SET 'sql-client.execution.result-mode'='changelog'")
    session.execute_statement(
        f"""CREATE TABLE clog_src (k STRING, v BIGINT)
        WITH ('connector'='filesystem', 'path'='{d}', 'format'='parquet')"""
    )
    op = session.execute_statement("SELECT k, SUM(v) AS s FROM clog_src GROUP BY k")
    assert op.status == "RUNNING"
    assert [c["name"] for c in op._columns] == ["op", "k", "s"]

    got, token = [], 0

    def poll_until(pred, timeout=60):
        nonlocal token
        deadline = time.time() + timeout
        while time.time() < deadline and not pred():
            page = op.fetch(token)
            token = page["nextResultToken"]
            got.extend(page["data"])
            time.sleep(0.3)

    poll_until(lambda: len(got) >= 2)
    assert sorted(got) == [["+I", "a", 3], ["+I", "b", 10]]

    # second micro-batch updates key 'a' only → retraction pair
    pq.write_table(pa.table({"k": ["a"], "v": [4]}), d / "f2.parquet")
    poll_until(lambda: len(got) >= 4)
    op.cancel()
    assert got[2:] == [["-U", "a", 3], ["+U", "a", 7]]


def test_changelog_append_only_all_inserts(session, sf_dir):
    """With no aggregation the stream is insert-only: every changelog
    row is +I (Flink renders an append stream the same way)."""
    session.execute_statement("SET 'sql-client.execution.result-mode'='changelog'")
    session.execute_statement(
        f"""CREATE TABLE clog_nation (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING)
        WITH ('connector'='filesystem', 'path'='{sf_dir}/nation.parquet', 'format'='parquet')"""
    )
    op = session.execute_statement("SELECT n_name FROM clog_nation")
    got, token = [], 0
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 25:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(page["data"])
        time.sleep(0.3)
    op.cancel()
    assert len(got) == 25
    assert {r[0] for r in got} == {"+I"}


def test_changelog_buffer_key_eviction_unit():
    """The changelog key map is an LRU: past `max_keys` an evicted
    key's next update degrades to +I (no stale retraction), and the
    eviction is counted for observability."""
    from flink_sql_toolkit_spark.streaming.buffer import ChangelogResultBuffer

    buf = ChangelogResultBuffer(key_positions=[0], max_keys=2)

    class FakeBatch:
        def __init__(self, rows):
            self.rows = rows

        def persist(self):
            return self

        def unpersist(self):
            return self

        def count(self):
            return len(self.rows)

        def tail(self, n):
            return self.rows[-n:]

    buf.foreach_batch(FakeBatch([["a", 1], ["b", 2], ["c", 3]]), 0)
    assert buf.evicted_keys == 1  # 'a' fell out of the 2-key LRU
    buf.foreach_batch(FakeBatch([["a", 9], ["c", 4]]), 1)
    page = buf.fetch(0)
    assert page["data"][:3] == [["+I", "a", 1], ["+I", "b", 2], ["+I", "c", 3]]
    # 'a' was evicted → re-inserts (+I, no -U); 'c' stayed → pair
    assert page["data"][3:] == [
        ["+I", "a", 9],
        ["-U", "c", 3],
        ["+U", "c", 4],
    ]


def test_changelog_buffer_tail_skip_invalidates_unit():
    """Rows dropped by the tail(max_rows) cap must not leave the key
    map holding pre-skip values: a later update for a skipped key
    would emit a -U carrying a stale value (ADVICE r6). On a skip the
    map is invalidated (degrades to +I re-inserts — never a wrong
    retraction) and the skip is counted for observability."""
    from flink_sql_toolkit_spark.streaming.buffer import ChangelogResultBuffer

    buf = ChangelogResultBuffer(key_positions=[0], max_rows=2)

    class FakeBatch:
        def __init__(self, rows):
            self.rows = rows

        def persist(self):
            return self

        def unpersist(self):
            return self

        def count(self):
            return len(self.rows)

        def tail(self, n):
            return self.rows[-n:]

    buf.foreach_batch(FakeBatch([["a", 1], ["b", 2]]), 0)
    assert buf.skipped_rows == 0
    # batch of 3 with cap 2: ["a", 9] is tail-skipped — the map's
    # a=1 entry must not survive to retract against
    buf.foreach_batch(FakeBatch([["a", 9], ["b", 5], ["c", 3]]), 1)
    assert buf.skipped_rows == 1
    page = buf.fetch(0)
    ops = [r[:1] + r[1:] for r in page["data"]]
    # 'b' updated post-invalidation → +I re-insert, NOT -U b,2 / +U b,5
    assert ["+I", "b", 5] in ops
    assert ["-U", "b", 2] not in ops
    assert page["skippedRows"] == 1
    # invalidation is counted separately from LRU eviction (review r7)
    assert page["invalidatedKeys"] == 2 and page["evictedKeys"] == 0
    # a later 'a' update must not pair against the stale a=1 either
    buf2 = ChangelogResultBuffer(key_positions=[0], max_rows=2)
    buf2.foreach_batch(FakeBatch([["a", 1], ["b", 2]]), 0)
    buf2.foreach_batch(FakeBatch([["a", 9], ["x", 1], ["y", 1]]), 1)
    buf2.foreach_batch(FakeBatch([["a", 7]]), 2)
    rows = buf2.fetch(0)["data"]
    assert ["-U", "a", 1] not in rows  # stale retraction never emitted


def test_streaming_match_recognize_sql_all_rows(session, tmp_path, spark):
    """ALL ROWS PER MATCH over a STREAMING table routes to the
    stateful operator's per-row expansion (r6; previously a typed
    rejection) — every matched input row pages out with its RUNNING
    measures."""
    rows = [(1, 1, "view"), (1, 2, "view"), (1, 3, "purchase")]
    write_rows(f"{tmp_path}/mrall", rows, "user_id long, seq long, event_type string")
    session.execute_statement(
        f"""
        CREATE TABLE mr_all_stream (
          user_id BIGINT, seq BIGINT, event_type STRING
        ) WITH ('connector'='filesystem', 'path'='{tmp_path}/mrall', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        """
        SELECT user_id, seq, n FROM mr_all_stream
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY seq
            MEASURES COUNT(A.*) AS n
            ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE A AS event_type = 'view',
                   B AS event_type = 'purchase'
        )
        """
    )
    assert op.status == "RUNNING"
    got, token = [], 0
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 3:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(tuple(r) for r in page["data"])
        time.sleep(0.5)
    op.cancel()
    assert sorted(got) == [(1, 1, 1), (1, 2, 2), (1, 3, 2)]


def test_grouping_key_positions_plan_shapes(spark):
    """Key derivation for the changelog pairing: plain and aliased
    grouping columns map to root-output positions; dropped or partial
    keys and expression groupings return None (append-only +I view —
    a partial key would pair a retraction against a different key)."""
    from flink_sql_toolkit_spark.streaming.buffer import grouping_key_positions

    df = spark.createDataFrame([(1, 2, 10)], "a long, b long, v long")
    df.createOrReplaceTempView("gkp")

    cases = [
        ("SELECT a, SUM(v) AS s FROM gkp GROUP BY a", [0]),
        ("SELECT SUM(v) AS s, a FROM gkp GROUP BY a", [1]),
        ("SELECT a AS aa, SUM(v) AS s FROM gkp GROUP BY a", [0]),
        ("SELECT a, b, SUM(v) AS s FROM gkp GROUP BY a, b", [0, 1]),
        # key column dropped → None (can't pair retractions)
        ("SELECT SUM(v) AS s FROM gkp GROUP BY a", None),
        # PARTIAL key visible → None, not [0] (two keys sharing `a`
        # must not retract each other)
        ("SELECT a, SUM(v) AS s FROM gkp GROUP BY a, b", None),
        # expression grouping → None
        ("SELECT a % 2 AS m, SUM(v) AS s FROM gkp GROUP BY a % 2", None),
        # no aggregate → None
        ("SELECT a, v FROM gkp", None),
    ]
    for sql, want in cases:
        assert grouping_key_positions(spark.sql(sql)) == want, sql

    # the common streaming shape — window TVF aggregate — maps its
    # window_start grouping column through the dialect rewrite
    import datetime as dt

    from flink_sql_toolkit_spark.dialect import rewrite

    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 5)], "k long, ts timestamp, v long"
    ).createOrReplaceTempView("gkp_ev")
    tvf = rewrite(
        "SELECT window_start, COUNT(*) AS n FROM "
        "TABLE(TUMBLE(TABLE gkp_ev, DESCRIPTOR(ts), INTERVAL '1' HOUR)) "
        "GROUP BY window_start"
    )
    assert grouping_key_positions(spark.sql(tvf)) == [0]


def test_changelog_buffer_replay_property():
    """Property: replaying a changelog (+I inserts, -U/+U pairs onto
    the previous value) reconstructs exactly the last-value-per-key
    table, for arbitrary update sequences — the invariant Flink's
    changelog result mode guarantees."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_sql_toolkit_spark.streaming.buffer import ChangelogResultBuffer

    class FakeBatch:
        def __init__(self, rows):
            self.rows = rows

        def persist(self):
            return self

        def unpersist(self):
            return self

        def count(self):
            return len(self.rows)

        def tail(self, n):
            return self.rows[-n:]

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.tuples(st.integers(0, 5), st.integers(0, 100)), max_size=6
            ),
            max_size=6,
        )
    )
    def check(batches):
        buf = ChangelogResultBuffer(key_positions=[0], max_rows=10_000)
        expected = {}
        for batch in batches:
            # update-mode semantics: one row per key per micro-batch
            # (last value wins within the batch)
            dedup = {}
            for k, v in batch:
                dedup[k] = v
            expected.update(dedup)
            buf.foreach_batch(FakeBatch([[k, v] for k, v in dedup.items()]), 0)
        # replay the visible changelog
        replayed = {}
        pending_retract = None
        for op, k, v in buf.fetch(0)["data"]:
            if op == "+I":
                assert k not in replayed
                replayed[k] = v
            elif op == "-U":
                assert replayed.get(k) == v
                pending_retract = k
            else:
                assert op == "+U" and pending_retract == k
                replayed[k] = v
                pending_retract = None
        assert replayed == expected

    check()


def test_streaming_dedup_sql_recipe(session, tmp_path, spark):
    """The canonical Flink dedup recipe — ROW_NUMBER() OVER
    (PARTITION BY k ORDER BY ts) = 1 in a subquery — over a STREAMING
    table routes to the stateful dedup operator (keep-first) instead
    of a typed rejection; DESC (keep-last) stays a typed error."""
    import pytest as _pytest

    rows = [
        (1, dt_ts(0), "a"), (1, dt_ts(1), "dup-a"),
        (2, dt_ts(2), "b"), (1, dt_ts(3), "dup-a2"),
    ]
    write_rows(f"{tmp_path}/dsql", rows, "k long, ts timestamp, v string")
    session.execute_statement(
        f"""CREATE TABLE dsql_src (k BIGINT, ts TIMESTAMP, v STRING)
        WITH ('connector'='filesystem', 'path'='{tmp_path}/dsql',
              'format'='parquet')"""
    )
    op = session.execute_statement(
        "SELECT k, v FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts) AS rn FROM dsql_src) WHERE rn = 1"
    )
    assert op.status == "RUNNING"
    got, token = [], 0
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 2:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(tuple(r) for r in page["data"])
        time.sleep(0.5)
    op.cancel()
    assert sorted(got) == [(1, "a"), (2, "b")]  # first arrival per key

    with _pytest.raises(NotImplementedError, match="keep-first"):
        session.execute_statement(
            "SELECT k, v FROM (SELECT *, ROW_NUMBER() OVER "
            "(PARTITION BY k ORDER BY ts DESC) AS rn FROM dsql_src) "
            "WHERE rn = 1"
        )

    # alias-qualified outer references keep resolving through the view
    op2 = session.execute_statement(
        "SELECT d.k, d.v FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts) AS rn FROM dsql_src) d WHERE rn = 1"
    )
    got2, token2 = [], 0
    deadline = time.time() + 60
    while time.time() < deadline and len(got2) < 2:
        page = op2.fetch(token2)
        token2 = page["nextResultToken"]
        got2.extend(tuple(r) for r in page["data"])
        time.sleep(0.5)
    op2.cancel()
    assert sorted(got2) == [(1, "a"), (2, "b")]


def dt_ts(s):
    import datetime

    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_streaming_first_n_sql_recipe(session, tmp_path, spark):
    """rn <= N (N>1) over a streaming table: first-N-per-key with a
    one-counter state, spanning micro-batches."""
    rows1 = [(1, dt_ts(0), "a1"), (1, dt_ts(1), "a2"), (2, dt_ts(2), "b1")]
    rows2 = [(1, dt_ts(3), "a3"), (1, dt_ts(4), "a4"), (2, dt_ts(5), "b2")]
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "fnsql"
    d.mkdir()

    def write(rows, name):
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "v": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            d / name,
        )

    write(rows1, "b0.parquet")
    session.execute_statement(
        f"""CREATE TABLE fn_src (k BIGINT, ts TIMESTAMP, v STRING)
        WITH ('connector'='filesystem', 'path'='{d}', 'format'='parquet')"""
    )
    op = session.execute_statement(
        "SELECT k, v FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts) AS rn FROM fn_src) WHERE rn <= 3"
    )
    got, token = [], 0
    deadline = time.time() + 30
    while time.time() < deadline and len(got) < 3:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(tuple(r) for r in page["data"])
        time.sleep(0.5)
    # second batch: key 1 already emitted 2 → only a3 passes (cap 3)
    write(rows2, "b1.parquet")
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 5:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(tuple(r) for r in page["data"])
        time.sleep(0.5)
    op.cancel()
    assert sorted(got) == [
        (1, "a1"), (1, "a2"), (1, "a3"), (2, "b1"), (2, "b2")
    ]


def test_ops_passthrough_buffer_tail_skip_counted():
    """The __op passthrough buffer (keep-last changelog route) counts
    tail-cap drops — a silently vanished -U would corrupt a client's
    collapsed view (review r7)."""
    from flink_sql_toolkit_spark.streaming.buffer import OpsPassthroughBuffer

    class FakeBatch:
        def __init__(self, rows):
            self.rows = rows

        def persist(self):
            return self

        def unpersist(self):
            return self

        def count(self):
            return len(self.rows)

        def tail(self, n):
            return self.rows[-n:]

    buf = OpsPassthroughBuffer(max_rows=2)
    buf.foreach_batch(FakeBatch([["-U", "a", 1], ["+U", "a", 2], ["+I", "b", 3]]), 0)
    page = buf.fetch(0)
    assert page["data"] == [["+U", "a", 2], ["+I", "b", 3]]
    assert page["skippedRows"] == 1
    # empty batch: no-op, no count drift
    buf.foreach_batch(FakeBatch([]), 1)
    assert buf.fetch(page["nextResultToken"])["skippedRows"] == 1


def test_dedup_router_reorder_gate_order_col_only(spark, tmp_path, monkeypatch):
    """The event-time re-buffer only engages when the dedup ORDER BY
    column IS the watermark column — gating by a different column
    would late-drop rows by one column while ranking by another
    (review r7)."""
    from datetime import datetime

    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )
    from flink_sql_toolkit_spark.streaming import stateful

    d = tmp_path / "gate_src"
    d.mkdir()
    spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 10, 0), 5)], "k long, ts timestamp, seq long"
    ).write.mode("overwrite").parquet(str(d))
    stream = (
        spark.readStream.schema("k long, ts timestamp, seq long")
        .parquet(str(d))
        .withWatermark("ts", "10 seconds")
    )
    stream.createOrReplaceTempView("gate_src")

    captured = {}
    real = stateful.streaming_first_n

    def spy(src, keys, order_by, n, **kw):
        captured["reorder_wm_col"] = kw.get("reorder_wm_col")
        return real(src, keys, order_by, n, **kw)

    monkeypatch.setattr(stateful, "streaming_first_n", spy)
    sql = (
        "SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY {o}) AS rn FROM gate_src) WHERE rn = 1"
    )
    assert rewrite_streaming_dedup_sql(spark, sql.format(o="ts")) is not None
    assert captured["reorder_wm_col"] == "ts"
    assert rewrite_streaming_dedup_sql(spark, sql.format(o="seq")) is not None
    assert captured["reorder_wm_col"] is None


def test_over_rows_output_name_collision_rejected(spark, tmp_path):
    """An input column named like a spec's output column (v_sum for
    SUM(v)) is a typed rejection — the vectorized named-column
    assignment would silently overwrite the passthrough data
    (review r7)."""
    from datetime import datetime

    from flink_sql_toolkit_spark.streaming.stateful import streaming_over_rows

    d = tmp_path / "coll_src"
    d.mkdir()
    spark.createDataFrame(
        [(1, datetime(2026, 1, 1), 2, 3)],
        "k long, ts timestamp, v long, v_sum long",
    ).write.mode("overwrite").parquet(str(d))
    stream = spark.readStream.schema(
        "k long, ts timestamp, v long, v_sum long"
    ).parquet(str(d))
    with pytest.raises(ValueError, match="collides"):
        streaming_over_rows(
            stream, ["k"], ["ts"], None, 2, agg_specs=[("sum", "v")]
        )


def test_dedup_desc_alias_star_case_insensitive(spark, tmp_path):
    """`SELECT D.*` over alias `d` must not prepend a second __op —
    Spark resolves aliases case-insensitively (review r7)."""
    from datetime import datetime

    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    d = tmp_path / "alias_src"
    d.mkdir()
    spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 10, 0), "x")], "k long, ts timestamp, v string"
    ).write.mode("overwrite").parquet(str(d))
    spark.readStream.schema("k long, ts timestamp, v string").parquet(
        str(d)
    ).createOrReplaceTempView("alias_src")
    sql = (
        "SELECT D.* FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts DESC) AS rn FROM alias_src) d "
        "WHERE rn = 1"
    )
    out = rewrite_streaming_dedup_sql(spark, sql, changelog=True)
    assert out is not None and "`__op`," not in out


# -- stream-stream interval joins (Flink SQL "interval join") ---------
#
# The batch interval-join shape is oracle-gated (join_theta_family);
# these verify the STREAMING path end-to-end through the engine: two
# watermarked file-stream tables, a time-bounded equi-join, Spark's
# native stream-stream join (update-mode start falls back to append in
# Operation._start_any). Reference surface: the interval-join grammar
# in syntaxes/flink.tmLanguage.json (BETWEEN ... AND over time attrs).


def _write_join_side(spark, tmp_path, name, schema, rows):
    d = tmp_path / name
    d.mkdir()
    stage = tmp_path / f"stage_{name}"
    write_rows(str(stage), rows, schema)
    import shutil

    part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
    shutil.copy(part, d / "data.parquet")
    return d


def test_stream_stream_interval_join_inner(session, tmp_path):
    """Inner interval join between two watermarked streams emits
    exactly the batch-equivalent matches."""
    from datetime import datetime

    t = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731
    odir = _write_join_side(
        session.spark, tmp_path, "ord",
        "o_id long, o_ts timestamp",
        [(1, t(10, 0)), (2, t(10, 5)), (3, t(10, 20))],
    )
    sdir = _write_join_side(
        session.spark, tmp_path, "shp",
        "s_oid long, s_ts timestamp",
        # ship 2 arrives 85 min after order 2 -> outside the 30-min
        # bound; ship 99 matches no order
        [(1, t(10, 10)), (2, t(11, 30)), (3, t(10, 25)), (99, t(10, 0))],
    )
    session.execute_statement(
        f"""
        CREATE TABLE ord_s (
          o_id BIGINT, o_ts TIMESTAMP_LTZ(3),
          WATERMARK FOR o_ts AS o_ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem', 'path'='{odir}', 'format'='parquet')
        """
    )
    session.execute_statement(
        f"""
        CREATE TABLE shp_s (
          s_oid BIGINT, s_ts TIMESTAMP_LTZ(3),
          WATERMARK FOR s_ts AS s_ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem', 'path'='{sdir}', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        "SELECT o.o_id, s.s_ts FROM ord_s o JOIN shp_s s "
        "ON o.o_id = s.s_oid "
        "AND s.s_ts BETWEEN o.o_ts AND o.o_ts + INTERVAL '30' MINUTE"
    )
    assert op.status == "RUNNING"
    got, token = [], 0
    deadline = time.time() + 90
    while time.time() < deadline and len(got) < 2:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(page["data"])
        time.sleep(0.5)
    op.cancel()
    assert sorted(r[0] for r in got) == [1, 3]


def test_stream_stream_interval_join_left_outer(session, tmp_path):
    """LEFT interval join: the unmatched left row null-pads once the
    watermark closes its join window (Flink's outer interval-join
    emission rule; Spark flushes it via a no-data micro-batch)."""
    from datetime import datetime

    t = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731
    # order 4 at 12:00 only pushes the orders-side watermark far
    # enough that orders 1-3's 30-min windows are all closed; its own
    # window is still open at cancel so it never emits.
    odir = _write_join_side(
        session.spark, tmp_path, "lord",
        "o_id long, o_ts timestamp",
        [(1, t(10, 0)), (2, t(10, 5)), (3, t(10, 20)), (4, t(12, 0))],
    )
    sdir = _write_join_side(
        session.spark, tmp_path, "lshp",
        "s_oid long, s_ts timestamp",
        # order 2 unmatched; ship at 11:00 pushes the ships-side
        # watermark past every closed window
        [(1, t(10, 10)), (3, t(10, 25)), (99, t(11, 0))],
    )
    session.execute_statement(
        f"""
        CREATE TABLE lord_s (
          o_id BIGINT, o_ts TIMESTAMP_LTZ(3),
          WATERMARK FOR o_ts AS o_ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem', 'path'='{odir}', 'format'='parquet')
        """
    )
    session.execute_statement(
        f"""
        CREATE TABLE lshp_s (
          s_oid BIGINT, s_ts TIMESTAMP_LTZ(3),
          WATERMARK FOR s_ts AS s_ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem', 'path'='{sdir}', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        "SELECT o.o_id, s.s_oid FROM lord_s o LEFT JOIN lshp_s s "
        "ON o.o_id = s.s_oid "
        "AND s.s_ts BETWEEN o.o_ts AND o.o_ts + INTERVAL '30' MINUTE"
    )
    assert op.status == "RUNNING"
    got, token = [], 0
    deadline = time.time() + 120
    while time.time() < deadline:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(page["data"])
        if len(got) >= 3:
            break
        time.sleep(0.5)
    op.cancel()
    by_id = {r[0]: r[1] for r in got}
    assert by_id.get(1) == 1 and by_id.get(3) == 3  # matched pairs
    assert 2 in by_id and by_id[2] is None  # null-padded unmatched


def test_stream_stream_window_join(session, tmp_path):
    """Flink's WINDOW JOIN: TUMBLE both sides, equi-join on
    (window_start, window_end, key) — rows pair only within the same
    tumbling window. Runs as a Spark stream-stream inner join over the
    TVF rewrite's window columns."""
    from datetime import datetime

    t = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: e731
    ldir = _write_join_side(
        session.spark, tmp_path, "wjl",
        "k long, ts timestamp, v string",
        # key 1 in the 10:00 window, key 1 again in 10:05, key 2 in 10:00
        [(1, t(10, 1), "l-a"), (1, t(10, 6), "l-b"), (2, t(10, 2), "l-c")],
    )
    rdir = _write_join_side(
        session.spark, tmp_path, "wjr",
        "k long, ts timestamp, w string",
        # key 1 matches in BOTH windows; key 2's right row is in the
        # NEXT window -> no pair; key 3 matches nothing
        [(1, t(10, 3), "r-a"), (1, t(10, 9), "r-b"), (2, t(10, 7), "r-c"),
         (3, t(10, 0), "r-d")],
    )
    session.execute_statement(
        f"""
        CREATE TABLE wjl_s (
          k BIGINT, ts TIMESTAMP_LTZ(3), v STRING,
          WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem', 'path'='{ldir}', 'format'='parquet')
        """
    )
    session.execute_statement(
        f"""
        CREATE TABLE wjr_s (
          k BIGINT, ts TIMESTAMP_LTZ(3), w STRING,
          WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem', 'path'='{rdir}', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        "SELECT L.k, L.v, R.w, L.window_start FROM "
        "(SELECT * FROM TABLE(TUMBLE(TABLE wjl_s, DESCRIPTOR(ts), INTERVAL '5' MINUTE))) L "
        "JOIN "
        "(SELECT * FROM TABLE(TUMBLE(TABLE wjr_s, DESCRIPTOR(ts), INTERVAL '5' MINUTE))) R "
        "ON L.window_start = R.window_start AND L.window_end = R.window_end "
        "AND L.k = R.k"
    )
    assert op.status == "RUNNING"
    got, token = [], 0
    deadline = time.time() + 90
    while time.time() < deadline and len(got) < 2:
        page = op.fetch(token)
        token = page["nextResultToken"]
        got.extend(page["data"])
        time.sleep(0.5)
    op.cancel()
    assert sorted((r[0], r[1], r[2]) for r in got) == [
        (1, "l-a", "r-a"),  # 10:00 window
        (1, "l-b", "r-b"),  # 10:05 window
    ]


def test_filesystem_stream_session_window_agg(session, sf_dir):
    """SESSION TVF on a stream: per-user gap-merged windows must agree
    with the batch session_window result once fully processed (the
    batch variant is oracle-gated in tvf_hop_cumulate_session; this
    pins the STREAMING route end-to-end)."""
    session.execute_statement(
        f"""
        CREATE TABLE fs_ev_sess (
          event_id BIGINT,
          user_id BIGINT,
          ts TIMESTAMP_LTZ(6),
          WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem', 'path'='{sf_dir}/events.parquet', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        "SELECT user_id, window_start, COUNT(*) AS n FROM "
        "TABLE(SESSION(TABLE fs_ev_sess PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) "
        "GROUP BY user_id, window_start"
    )
    assert op.status == "RUNNING"
    # watermarked session agg runs APPEND mode: each session emits
    # exactly once, FINALIZED, when the watermark passes its end —
    # Flink's own streaming session-window behavior. Sessions whose
    # last event lies within (gap + delay) of the stream's max
    # timestamp never finalize (the watermark stops at max_ts - 5 s),
    # so the assertion is exactness on every EMITTED session plus a
    # coverage floor, not set equality.
    seen: dict = {}
    token = 0
    quiet = 0
    deadline = time.time() + 120
    while time.time() < deadline and not (seen and quiet >= 10):
        page = op.fetch(token)
        token = page["nextResultToken"]
        if page["data"]:
            quiet = 0
            for u, w, n in page["data"]:
                assert (u, w) not in seen  # append mode: one final emit
                seen[(u, w)] = n
        else:
            quiet += 1
        time.sleep(0.5)
    op.cancel()
    batch = session.spark.sql(
        f"SELECT user_id, session_window(ts, '10 minutes').start AS ws, COUNT(*) AS n "
        f"FROM parquet.`{sf_dir}/events.parquet` GROUP BY user_id, session_window(ts, '10 minutes')"
    ).collect()
    want = {(r.user_id, r.ws): r.n for r in batch}
    assert seen  # the stream produced finalized sessions
    for key, n in seen.items():
        assert want.get(key) == n  # every emitted session is batch-exact
    assert len(seen) >= 0.9 * len(want)  # only the per-user tail is open


def test_filesystem_stream_cumulate_agg(session, sf_dir):
    """CUMULATE TVF on a stream (explode-based rewrite): expanding
    windows must converge to the batch result's totals."""
    session.execute_statement(
        f"""
        CREATE TABLE fs_ev_cum (
          event_id BIGINT,
          user_id BIGINT,
          ts TIMESTAMP_LTZ(6)
        ) WITH ('connector'='filesystem', 'path'='{sf_dir}/events.parquet', 'format'='parquet')
        """
    )
    # one week only: the paged streaming result keeps a 1000-row ring
    # (notebookController.ts:258-261 contract) and a single-file source
    # emits every slice in one micro-batch - the full month's ~1.5k
    # slices would out-run a 0.5 s poll loop by design, not by bug
    op = session.execute_statement(
        "SELECT window_start, window_end, COUNT(*) AS n FROM "
        "TABLE(CUMULATE(TABLE fs_ev_cum, DESCRIPTOR(ts), INTERVAL '15' MINUTE, INTERVAL '1' HOUR)) "
        "WHERE ts < TIMESTAMP '2024-01-08 00:00:00' "
        "GROUP BY window_start, window_end"
    )
    assert op.status == "RUNNING"
    from flink_sql_toolkit_spark.dialect.rewriter import rewrite

    batch_sql = rewrite(
        f"SELECT window_start, window_end, COUNT(*) AS n FROM "
        f"TABLE(CUMULATE(TABLE parquet.`{sf_dir}/events.parquet`, DESCRIPTOR(ts), "
        f"INTERVAL '15' MINUTE, INTERVAL '1' HOUR)) "
        f"WHERE ts < TIMESTAMP '2024-01-08 00:00:00' GROUP BY window_start, window_end"
    )
    want = {(r.window_start, r.window_end): r.n for r in session.spark.sql(batch_sql).collect()}
    seen: dict = {}
    token = 0
    deadline = time.time() + 90
    while time.time() < deadline:
        page = op.fetch(token)
        token = page["nextResultToken"]
        for ws, we, n in page["data"]:
            seen[(ws, we)] = n  # update mode: later pages revise
        if seen == want:
            break
        time.sleep(0.5)
    op.cancel()
    assert seen == want  # every cumulative slice converged to batch


def test_filesystem_stream_hop_agg(session, sf_dir):
    """HOP TVF on a stream (Spark expands sliding windows natively):
    totals converge to the batch result — completes streaming E2E
    coverage of all four window TVFs (TUMBLE/SESSION/CUMULATE/HOP)."""
    session.execute_statement(
        f"""
        CREATE TABLE fs_ev_hop (
          event_id BIGINT,
          user_id BIGINT,
          ts TIMESTAMP_LTZ(6)
        ) WITH ('connector'='filesystem', 'path'='{sf_dir}/events.parquet', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        "SELECT window_start, COUNT(*) AS n FROM "
        "TABLE(HOP(TABLE fs_ev_hop, DESCRIPTOR(ts), INTERVAL '1' HOUR, INTERVAL '2' HOUR)) "
        "WHERE ts < TIMESTAMP '2024-01-08 00:00:00' GROUP BY window_start"
    )
    assert op.status == "RUNNING"
    from flink_sql_toolkit_spark.dialect.rewriter import rewrite

    batch_sql = rewrite(
        f"SELECT window_start, COUNT(*) AS n FROM "
        f"TABLE(HOP(TABLE parquet.`{sf_dir}/events.parquet`, DESCRIPTOR(ts), "
        f"INTERVAL '1' HOUR, INTERVAL '2' HOUR)) "
        f"WHERE ts < TIMESTAMP '2024-01-08 00:00:00' GROUP BY window_start"
    )
    want = {(r.window_start,): r.n for r in session.spark.sql(batch_sql).collect()}
    seen: dict = {}
    token = 0
    deadline = time.time() + 90
    while time.time() < deadline:
        page = op.fetch(token)
        token = page["nextResultToken"]
        for ws, n in page["data"]:
            seen[(ws,)] = n  # update mode: later pages revise
        if seen == want:
            break
        time.sleep(0.5)
    op.cancel()
    assert seen == want  # every sliding window converged to batch


def test_filesystem_stream_session_window_time(session, sf_dir):
    """window_time in a streaming SESSION aggregation (r10: the fold
    handles it instead of bailing to the batch-only gaps-and-islands
    relation): the folded query runs on the stream and every emitted
    session carries window_time = window_end - 1 ms (FLIP-145)."""
    session.execute_statement(
        f"""
        CREATE TABLE fs_ev_wt (
          event_id BIGINT,
          user_id BIGINT,
          ts TIMESTAMP_LTZ(6),
          WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem', 'path'='{sf_dir}/events.parquet', 'format'='parquet')
        """
    )
    op = session.execute_statement(
        "SELECT user_id, window_end, window_time, COUNT(*) AS n FROM "
        "TABLE(SESSION(TABLE fs_ev_wt PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) "
        "GROUP BY user_id, window_start, window_end, window_time"
    )
    assert op.status == "RUNNING"
    rows, token = [], 0
    deadline = time.time() + 90
    while time.time() < deadline and len(rows) < 20:
        page = op.fetch(token)
        token = page["nextResultToken"]
        rows.extend(page["data"])
        time.sleep(0.5)
    op.cancel()
    assert rows, "streaming session agg with window_time emitted nothing"
    for _u, we, wt, _n in rows:
        assert (we - wt).total_seconds() == pytest.approx(0.001)


def test_buffer_contiguous_absolute_token_not_reinterpreted():
    """A token equal to the last served end (what nextResultToken
    followers send) is served absolutely even when it also happens to
    be last_token+1 — only tokens that would RE-serve rows take the
    sequential reading (review r11)."""
    from flink_sql_toolkit_spark.streaming.buffer import StreamResultBuffer

    buf = StreamResultBuffer(max_rows=1000)
    buf.append_batch([[0]])
    page = buf.fetch(0)
    assert page["nextResultToken"] == 1
    buf.append_batch([[1], [2]])
    # token 1 == last_token+1 AND == last served end: same rows under
    # either reading — must be the new rows, exactly once
    assert buf.fetch(1)["data"] == [[1], [2]]


def test_buffer_sequential_tokens_survive_stream_stall():
    """The reference loop increments its token on EVERY poll, empty
    ones included — during a stall the token outruns the data end, and
    rows arriving afterward must still be served (review r11 pass 2:
    a last_end bound on the sequential branch silently dropped them)."""
    from flink_sql_toolkit_spark.streaming.buffer import StreamResultBuffer

    buf = StreamResultBuffer(max_rows=1000)
    buf.append_batch([[0], [1], [2]])
    assert [r[0] for r in buf.fetch(0)["data"]] == [0, 1, 2]
    # idle polls while the source stalls: all empty, token keeps rising
    for t in (1, 2, 3, 4):
        assert buf.fetch(t)["data"] == []
    # the stall ends: two more rows arrive at absolute positions 3, 4
    buf.append_batch([[3], [4]])
    assert [r[0] for r in buf.fetch(5)["data"]] == [3, 4]
