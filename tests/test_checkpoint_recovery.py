"""Streaming checkpoint-recovery E2E (VERDICT r11 ask #2): STOP JOB
WITH SAVEPOINT must return resumable state, and re-running the same
statement with SET 'execution.savepoint.path' = <that path> must
resume it exactly-once — the thing a Flink user means by savepoint
(reference: test/syntax-test.fsql:559-560; Flink docs "Resuming from
Savepoints").

Two layers:
- source-progress recovery: a filesystem→filesystem INSERT stopped
  after file1 and resumed must NOT re-read file1 (the file source's
  seen-files log lives in the checkpoint) — the sink holds exactly
  source rows, no dupes, no loss.
- stateful-operator recovery: a watermarked TUMBLE aggregation whose
  windows are still OPEN at stop time must emit counts that include
  the pre-stop rows after resume — those partial counts exist only
  in the recovered state store.

All prior streaming tests ran within one query lifetime; these are
the first restart-crossing ones.
"""

from __future__ import annotations

from fastwrite import write_rows

import datetime as dt
import time

import pytest

from flink_sql_toolkit_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def session(engine):
    s = engine.open_session("ckpt-recovery")
    yield s
    s.close()


def _wait_sink_count(spark, path: str, want: int, timeout: float = 120.0) -> int:
    """Poll the sink until it holds `want` rows (or more — dupes must
    be visible, not masked) or the deadline passes."""
    deadline = time.time() + timeout
    n = -1
    while time.time() < deadline:
        try:
            n = spark.read.parquet(path).count()
        except Exception:  # sink not yet created / no committed batch
            n = -1
        if n >= want:
            return n
        time.sleep(1.0)
    return n


def _stop_with_savepoint(session, job_id: str) -> str:
    op = session.execute_statement(f"STOP JOB '{job_id}' WITH SAVEPOINT")
    page = op.fetch(0)
    return page["data"][0][0]


def test_insert_resume_from_savepoint_exactly_once(session, tmp_path):
    spark = session.spark
    src, sink = f"{tmp_path}/src", f"{tmp_path}/sink"
    rows1 = [(1, "a"), (2, "b"), (3, "c")]
    write_rows(src, rows1, "id long, v string", mode="append")

    session.execute_statement(
        f"""CREATE TABLE rec_src (id BIGINT, v STRING) WITH (
        'connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    session.execute_statement(
        f"""CREATE TABLE rec_sink (id BIGINT, v STRING) WITH (
        'connector'='filesystem', 'path'='{sink}', 'format'='parquet')"""
    )

    stmt = "INSERT INTO rec_sink SELECT id, v FROM rec_src"
    op1 = session.execute_statement(stmt)
    assert op1.job_id, "streaming INSERT must register a job"
    assert _wait_sink_count(spark, sink, 3) == 3

    savepoint = _stop_with_savepoint(session, op1.job_id)
    assert savepoint and savepoint != session.checkpoint_root, (
        "STOP JOB WITH SAVEPOINT must return the JOB's checkpoint, "
        "not the session root"
    )

    # new data lands while the job is down
    rows2 = [(4, "d"), (5, "e")]
    write_rows(src, rows2, "id long, v string", mode="append")

    session.execute_statement(
        f"SET 'execution.savepoint.path' = '{savepoint}'"
    )
    try:
        op2 = session.execute_statement(stmt)
        # Spark persists the query id IN the checkpoint metadata, so a
        # resumed job keeps its id — evidence the restart really did
        # attach to the savepoint rather than starting fresh
        assert op2.job_id == op1.job_id
        assert _wait_sink_count(spark, sink, 5) == 5
        # settle one extra trigger: a re-read of file1 would now be
        # landing — exactly-once means the count STAYS 5
        time.sleep(3)
        got = sorted(
            tuple(r) for r in spark.read.parquet(sink).collect()
        )
        assert got == sorted(rows1 + rows2), got
        session.execute_statement(f"STOP JOB '{op2.job_id}'")
    finally:
        session.execute_statement("RESET 'execution.savepoint.path'")


def test_stateful_window_agg_state_recovers(session, tmp_path):
    """Windows OPEN at stop time close after resume with counts that
    include pre-stop rows — provable state-store recovery: a fresh
    checkpoint would emit count=1 for w0, the recovered one emits 4."""
    spark = session.spark
    src, sink = f"{tmp_path}/wsrc", f"{tmp_path}/wsink"

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    # all in window [00:00, 00:10); max event time 8s ⇒ watermark 7s,
    # window still open when the job stops
    batch1 = [(ts(2), 1), (ts(5), 1), (ts(8), 1)]
    write_rows(src, batch1, "ts timestamp, n int", mode="append")

    session.execute_statement(
        f"""CREATE TABLE w_src (ts TIMESTAMP(3), n INT,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
        WITH ('connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    session.execute_statement(
        f"""CREATE TABLE w_sink (wstart TIMESTAMP(3), cnt BIGINT) WITH (
        'connector'='filesystem', 'path'='{sink}', 'format'='parquet')"""
    )
    # legacy group-window form: the rewrite keeps the window() struct
    # in GROUP BY, which Spark's append-mode checker requires (the TVF
    # rewrite's extracted window_start column only supports update
    # mode — fine for interactive SELECT, not for an append sink)
    stmt = (
        "INSERT INTO w_sink SELECT "
        "TUMBLE_START(ts, INTERVAL '10' SECOND) AS wstart, COUNT(*) AS cnt "
        "FROM w_src GROUP BY TUMBLE(ts, INTERVAL '10' SECOND)"
    )
    op1 = session.execute_statement(stmt)
    assert op1.job_id

    # wait until batch1 is COMMITTED (checkpoint offsets advance), not
    # just until the sink has rows — append mode emits nothing yet
    ckdir = None
    job = session.jobs.get(op1.job_id)
    ckdir = job.checkpoint
    deadline = time.time() + 120
    import os

    while time.time() < deadline:
        commits = (
            os.listdir(f"{ckdir}/commits") if os.path.isdir(f"{ckdir}/commits") else []
        )
        if any(c.isdigit() for c in commits):
            break
        time.sleep(0.5)
    else:
        pytest.fail("batch1 never committed")

    savepoint = _stop_with_savepoint(session, op1.job_id)

    # one more row in w0 + one far beyond it to push the watermark
    # past the window end so w0 finally EMITS
    batch2 = [(ts(9), 1), (dt.datetime(2024, 1, 1, 0, 2, 0), 1)]
    write_rows(src, batch2, "ts timestamp, n int", mode="append")

    session.execute_statement(
        f"SET 'execution.savepoint.path' = '{savepoint}'"
    )
    try:
        op2 = session.execute_statement(stmt)
        deadline = time.time() + 120
        emitted = []
        while time.time() < deadline:
            try:
                emitted = spark.read.parquet(sink).collect()
            except Exception:
                emitted = []
            if any(r.wstart == ts(0) for r in emitted):
                break
            time.sleep(1.0)
        session.execute_statement(f"STOP JOB '{op2.job_id}'")
        w0 = [r for r in emitted if r.wstart == ts(0)]
        assert w0, f"window [0,10) never emitted; sink={emitted}"
        assert w0[0].cnt == 4, (
            f"state lost across restart: window [0,10) counted {w0[0].cnt}, "
            "expected 4 (3 pre-stop rows live only in the recovered state)"
        )
    finally:
        session.execute_statement("RESET 'execution.savepoint.path'")


def test_stop_job_with_savepoint_returns_job_checkpoint(session, tmp_path):
    """Unit-ish: the savepoint path is per-job and distinct across two
    jobs in one session (r11 returned the shared session root)."""
    spark = session.spark
    src = f"{tmp_path}/s2"
    spark.createDataFrame([(1,)], "id long").write.parquet(src)
    session.execute_statement(
        f"""CREATE TABLE sp_src (id BIGINT) WITH (
        'connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    for i in (1, 2):
        session.execute_statement(
            f"""CREATE TABLE sp_sink{i} (id BIGINT) WITH (
            'connector'='filesystem', 'path'='{tmp_path}/k{i}',
            'format'='parquet')"""
        )
    op_a = session.execute_statement("INSERT INTO sp_sink1 SELECT id FROM sp_src")
    op_b = session.execute_statement("INSERT INTO sp_sink2 SELECT id FROM sp_src")
    sp_a = _stop_with_savepoint(session, op_a.job_id)
    sp_b = _stop_with_savepoint(session, op_b.job_id)
    assert sp_a != sp_b
    assert sp_a.startswith(session.checkpoint_root)


def test_savepoint_path_in_use_is_typed_error(session, tmp_path):
    """With execution.savepoint.path set, a second streaming INSERT
    while the resumed job is still RUNNING must be a typed error —
    two active queries sharing one checkpoint dir would corrupt each
    other's offset/commit logs (Spark doesn't lock checkpoint
    locations; Flink's statement set is one job per savepoint)."""
    spark = session.spark
    src = f"{tmp_path}/busy_src"
    spark.createDataFrame([(1,)], "id long").write.parquet(src)
    session.execute_statement(
        f"""CREATE TABLE busy_src (id BIGINT) WITH (
        'connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    for i in (1, 2):
        session.execute_statement(
            f"""CREATE TABLE busy_sink{i} (id BIGINT) WITH (
            'connector'='filesystem', 'path'='{tmp_path}/bs{i}',
            'format'='parquet')"""
        )
    op = session.execute_statement("INSERT INTO busy_sink1 SELECT id FROM busy_src")
    sp = _stop_with_savepoint(session, op.job_id)
    session.execute_statement(f"SET 'execution.savepoint.path' = '{sp}'")
    try:
        op2 = session.execute_statement(
            "INSERT INTO busy_sink1 SELECT id FROM busy_src"
        )  # legal: resumes the stopped job
        with pytest.raises(ValueError, match="already in use"):
            session.execute_statement(
                "INSERT INTO busy_sink2 SELECT id FROM busy_src"
            )
        session.execute_statement(f"STOP JOB '{op2.job_id}'")
    finally:
        session.execute_statement("RESET 'execution.savepoint.path'")


def test_stateful_over_state_recovers_across_restart(spark, tmp_path):
    """applyInPandasWithState state recovery (VERDICT r12 ask #6): a
    running OVER aggregate's per-key accumulators must survive a real
    stop → new StreamingQuery with the same checkpoint. A fresh state
    store would report the post-restart row's running sum as its own
    value; the recovered store reports the full prefix. This is the
    state-schema hazard the window-agg test doesn't exercise: the
    operator's state lives in OUR pickled accumulator layout, so a
    layout change breaks restarts — this test pins it."""
    from flink_sql_toolkit_spark.streaming.stateful import (
        UNBOUNDED,
        streaming_over_rows,
    )

    src, sink, ck = f"{tmp_path}/src", f"{tmp_path}/sink", f"{tmp_path}/ck"
    schema = "k string, seq long, v long"
    write_rows(src, [("a", 1, 1), ("a", 2, 2), ("a", 3, 3)], schema, mode="append")

    def _start():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_over_rows(
            stream,
            partition_by=["k"],
            order_by=["seq"],
            value_col=None,
            n_preceding=0,
            agg_specs=[("sum", "v", UNBOUNDED)],
        )
        return (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )

    q1 = _start()
    deadline = time.time() + 120
    n = 0
    while time.time() < deadline:
        try:
            n = spark.read.parquet(sink).count()
        except Exception:
            n = 0
        if n >= 3:
            break
        time.sleep(0.5)
    assert n == 3
    q1.stop()
    q1.awaitTermination(60)

    write_rows(src, [("a", 4, 4)], schema, mode="append")
    q2 = _start()
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(sink).collect()
            except Exception:
                rows = []
            if len(rows) >= 4:
                break
            time.sleep(0.5)
        by_seq = {r.seq: r.v_sum for r in rows}
        assert by_seq.get(4) == 10, (
            f"per-key accumulator lost across restart: running sum at "
            f"seq=4 is {by_seq.get(4)}, expected 10 (1+2+3 live only in "
            f"the recovered state store); sink={sorted(by_seq.items())}"
        )
        assert by_seq.get(3) == 6, by_seq
    finally:
        q2.stop()


def test_statement_set_savepoint_resume(session, tmp_path):
    """STATEMENT SET restart-crossing E2E (VERDICT r12 ask #6): the
    set lays its statements' checkpoints under one deterministic root
    (<root>/set-<i>); SET 'execution.savepoint.path' = that root and
    resubmit the identical set → every member resumes exactly-once
    (no re-read of pre-stop files, new files picked up)."""
    import os

    spark = session.spark
    src = f"{tmp_path}/set_src"
    write_rows(src, [(1, "a"), (2, "b")], "id long, v string", mode="append")
    session.execute_statement(
        f"""CREATE TABLE set_src (id BIGINT, v STRING) WITH (
        'connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    for i in (1, 2):
        session.execute_statement(
            f"""CREATE TABLE set_sink{i} (id BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{tmp_path}/set_sink{i}',
            'format'='parquet')"""
        )
    set_stmt = (
        "BEGIN STATEMENT SET; "
        "INSERT INTO set_sink1 SELECT id, v FROM set_src; "
        "INSERT INTO set_sink2 SELECT id, v FROM set_src WHERE id > 1; "
        "END;"
    )
    op = session.execute_statement(set_stmt)
    jobs1 = [r[0] for r in op.fetch(0)["data"]]
    assert len(jobs1) == 2, jobs1
    assert _wait_sink_count(spark, f"{tmp_path}/set_sink1", 2) == 2
    assert _wait_sink_count(spark, f"{tmp_path}/set_sink2", 1) == 1

    # both statement checkpoints share one parent and carry set-<i>
    sps = [_stop_with_savepoint(session, j) for j in jobs1]
    roots = {os.path.dirname(p) for p in sps}
    assert len(roots) == 1 and sorted(os.path.basename(p) for p in sps) == [
        "set-0", "set-1",
    ], sps

    write_rows(src, [(3, "c")], "id long, v string", mode="append")

    session.execute_statement(
        f"SET 'execution.savepoint.path' = '{roots.pop()}'"
    )
    try:
        op2 = session.execute_statement(set_stmt)
        jobs2 = [r[0] for r in op2.fetch(0)["data"]]
        # resumed queries keep their ids (stored in checkpoint metadata)
        assert sorted(jobs2) == sorted(jobs1)
        assert _wait_sink_count(spark, f"{tmp_path}/set_sink1", 3) == 3
        assert _wait_sink_count(spark, f"{tmp_path}/set_sink2", 2) == 2
        time.sleep(3)  # an extra trigger would land re-reads — none may
        got1 = sorted(
            tuple(r) for r in spark.read.parquet(f"{tmp_path}/set_sink1").collect()
        )
        got2 = sorted(
            tuple(r) for r in spark.read.parquet(f"{tmp_path}/set_sink2").collect()
        )
        assert got1 == [(1, "a"), (2, "b"), (3, "c")], got1
        assert got2 == [(2, "b"), (3, "c")], got2
        for j in jobs2:
            session.execute_statement(f"STOP JOB '{j}'")
    finally:
        session.execute_statement("RESET 'execution.savepoint.path'")


def test_state_layout_mismatch_is_typed_error(spark, tmp_path):
    """State-layout versioning E2E (VERDICT r13 ask #2): resuming a
    stateful operator from a checkpoint whose state tuple carries an
    OLDER layout version must fail with the typed 'state layout
    version mismatch' error — never silently reinterpret the bytes.
    The v1 checkpoint is planted by a topology- and
    state-struct-identical query that writes sv=1 raw state (the
    closure is test-local, so cloudpickle ships it by value and the
    production module's version constant is untouched); the real
    streaming_lag then resumes from it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flink_sql_toolkit_spark.streaming.stateful import (
        STATE_MISMATCH_MARKER,
        streaming_lag,
    )

    src, sink, ck = f"{tmp_path}/src", f"{tmp_path}/sink", f"{tmp_path}/ck"
    schema = "k string, seq long, v long"
    spark.createDataFrame([("a", 1, 1), ("a", 2, 2)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    # mirror streaming_lag's shapes exactly (value col long, offset 1):
    out_schema = "k string, seq bigint, v bigint, v_lag bigint"
    state_schema = "sv int, ring array<bigint>"

    def v1_fn(key, pdfs, state):
        ring = list(state.get[1]) if state.exists else []
        for pdf in pdfs:
            pdf = pdf.sort_values(["seq"], kind="mergesort")
            rows = []
            for r in pdf.itertuples(index=False):
                rows.append([r.k, r.seq, r.v, ring[0] if ring else None])
                ring = [int(r.v)]
            if rows:
                yield pd.DataFrame(rows, columns=["k", "seq", "v", "v_lag"])
        state.update((1, ring))  # sv=1: an incompatible-era layout

    def _sink(df):
        return (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )

    q1 = _sink(
        spark.readStream.schema(schema)
        .parquet(src)
        .groupBy("k")
        .applyInPandasWithState(
            v1_fn, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    deadline = time.time() + 120
    n = 0
    while time.time() < deadline:
        try:
            n = spark.read.parquet(sink).count()
        except Exception:
            n = 0
        if n >= 2:
            break
        time.sleep(0.5)
    assert n == 2
    q1.stop()
    q1.awaitTermination(60)

    # new data for the same key forces a state.get on resume
    write_rows(src, [("a", 3, 3)], schema, mode="append")
    q2 = _sink(
        streaming_lag(
            spark.readStream.schema(schema).parquet(src),
            partition_by=["k"],
            order_by=["seq"],
            value_col="v",
        )
    )
    try:
        deadline = time.time() + 120
        err = None
        while time.time() < deadline:
            err = q2.exception()
            if err is not None or not q2.isActive:
                break
            time.sleep(0.5)
        assert err is not None, (
            "resume from a v1-tagged checkpoint must fail, not "
            f"process rows (sink={spark.read.parquet(sink).collect()})"
        )
        assert STATE_MISMATCH_MARKER in str(err), str(err)[:2000]
        assert "RESET 'execution.savepoint.path'" in str(err), str(err)[:2000]
    finally:
        q2.stop()


def test_versioned_state_proxy_roundtrip():
    """Unit contract of the _VersionedState proxy: update prepends the
    current layout version, get strips it, and a foreign version
    raises the typed mismatch."""
    from flink_sql_toolkit_spark.streaming.stateful import (
        STATE_LAYOUT_VERSION,
        STATE_MISMATCH_MARKER,
        _VersionedState,
    )

    class FakeState:
        def __init__(self):
            self.stored = None
            self.exists = False

        @property
        def get(self):
            return self.stored

        def update(self, t):
            self.stored = t
            self.exists = True

    fs = FakeState()
    vs = _VersionedState(fs)
    assert vs.exists is False
    vs.update(([1, 2], 7))
    assert fs.stored == (STATE_LAYOUT_VERSION, [1, 2], 7)
    assert vs.exists is True
    assert vs.get == ([1, 2], 7)

    fs.stored = (STATE_LAYOUT_VERSION + 1, [1, 2], 7)
    with pytest.raises(RuntimeError, match=STATE_MISMATCH_MARKER):
        _ = vs.get


def test_match_recognize_insert_resumes_open_match(session, tmp_path):
    """MATCH_RECOGNIZE INSERT restart-crossing E2E (VERDICT r13 ask
    #3): an OPEN partial match is the most fragile state in the
    engine — stop the CEP job mid-pattern, resume from the savepoint,
    and the match must complete exactly-once. A and B are consumed
    into NFA state before the stop (a second partition key advances
    the watermark without touching k=1's row sequence); C arrives
    while the job is down. A resume that lost the open match would
    see a lone C and emit nothing; a resume that re-read the world
    would double-process — the sink must hold exactly one match row
    spanning the restart."""
    spark = session.spark
    src, sink = f"{tmp_path}/mrr_src", f"{tmp_path}/mrr_sink"

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)

    write_rows(src, [(1, ts(1), 1), (1, ts(2), 2), (2, ts(10), 0)], "k int, ts timestamp, v int", mode="append")

    session.execute_statement(
        f"""CREATE TABLE mrr_src (k INT, ts TIMESTAMP(3), v INT,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
        WITH ('connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
    )
    session.execute_statement(
        f"""CREATE TABLE mrr_sink (s TIMESTAMP(3), e TIMESTAMP(3)) WITH (
        'connector'='filesystem', 'path'='{sink}', 'format'='parquet')"""
    )
    stmt = (
        "INSERT INTO mrr_sink SELECT s, e FROM mrr_src MATCH_RECOGNIZE ("
        " PARTITION BY k ORDER BY ts"
        " MEASURES FIRST(A.ts) AS s, LAST(C.ts) AS e"
        " ONE ROW PER MATCH"
        " AFTER MATCH SKIP PAST LAST ROW"
        " PATTERN (A B C)"
        " DEFINE A AS v = 1, B AS v = 2, C AS v = 3"
        ")"
    )
    op1 = session.execute_statement(stmt)
    assert op1.job_id, "streaming MR INSERT must start a job"
    # let the job consume A,B into the open match (no output yet —
    # the pattern is incomplete), then stop mid-pattern
    time.sleep(6)
    try:
        assert spark.read.parquet(sink).count() == 0
    except Exception:
        pass  # sink dir may not exist yet — also fine (no output)
    savepoint = _stop_with_savepoint(session, op1.job_id)

    # C lands while the job is down (ts 12 is AHEAD of the recovered
    # watermark ~ts 9, so the reorder gate must not drop it); another
    # k=2 row advances the watermark past it after resume
    write_rows(src, [(1, ts(12), 3), (2, ts(60), 0)], "k int, ts timestamp, v int", mode="append")

    session.execute_statement(
        f"SET 'execution.savepoint.path' = '{savepoint}'"
    )
    try:
        op2 = session.execute_statement(stmt)
        assert op2.job_id == op1.job_id  # resumed, not restarted
        assert _wait_sink_count(spark, sink, 1) == 1
        got = spark.read.parquet(sink).collect()
        assert [(r.s, r.e) for r in got] == [(ts(1), ts(12))], got
        # exactly-once: settle extra triggers — a re-read/re-match
        # would land a duplicate now
        time.sleep(4)
        assert spark.read.parquet(sink).count() == 1
        session.execute_statement(f"STOP JOB '{op2.job_id}'")
    finally:
        session.execute_statement("RESET 'execution.savepoint.path'")


def test_first_n_counter_recovers_across_restart(spark, tmp_path):
    """Savepoint-resume breadth (r14): the first-N operator's ONE
    per-key counter — now carried in the version-tagged state layout —
    must survive a stop → same-checkpoint restart. A fresh counter
    would re-emit up to n rows after restart; the recovered counter
    emits exactly (n - pre-stop emissions)."""
    from flink_sql_toolkit_spark.streaming.stateful import streaming_first_n

    src, sink, ck = f"{tmp_path}/src", f"{tmp_path}/sink", f"{tmp_path}/ck"
    schema = "k string, seq long"
    spark.createDataFrame([("a", 1), ("a", 2)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    def _start():
        out = streaming_first_n(
            spark.readStream.schema(schema).parquet(src),
            keys=["k"],
            order_by=["seq"],
            n=3,
            rn_col="rn",
        )
        return (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )

    q1 = _start()
    deadline = time.time() + 120
    n = 0
    while time.time() < deadline:
        try:
            n = spark.read.parquet(sink).count()
        except Exception:
            n = 0
        if n >= 2:
            break
        time.sleep(0.5)
    assert n == 2  # seq 1,2 emitted (counter = 2)
    q1.stop()
    q1.awaitTermination(60)

    # three more rows land while the job is down; only ONE may emit
    write_rows(src, [("a", 3), ("a", 4), ("a", 5)], schema, mode="append")
    q2 = _start()
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(sink).collect()
            except Exception:
                rows = []
            if len(rows) >= 3:
                break
            time.sleep(0.5)
        time.sleep(3)  # settle: a fresh counter would emit 3 more now
        rows = spark.read.parquet(sink).collect()
        got = sorted((r.seq, r.rn) for r in rows)
        assert got == [(1, 1), (2, 2), (3, 3)], (
            f"counter lost across restart: {got} (a fresh counter "
            "re-emits seq 3,4,5 as ranks 1,2,3)"
        )
    finally:
        q2.stop()
