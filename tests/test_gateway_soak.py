"""Gateway multi-session concurrency soak (VERDICT r11 ask #6).

The r11 stress test (test_gateway.py::test_session_lifecycle_stress)
races the session STATE MACHINE (open/delete/heartbeat) on one axis;
this soak runs the FULL workload concurrently — N threads × (open
session → DDL → streaming SELECT → fetch pages → cancel → close) —
against the reaper at an aggressive timeout, so real engine work
(Spark statement execution, streaming query start/stop) interleaves
with reaping and closing. The refcounted tombstone protocol
(gateway.py) is new and subtle; this is its sustained-load gate.

Invariants at the end:
- no INTERNAL 500: statement errors legally surface as 500 + a
  well-formed errors[] payload (that is the wire contract the
  reference client's handleErrorResponse parses — e.g. the reaper
  closing a session mid-SELECT drops its temp views and the fetch
  reports the AnalysisException); what must NEVER appear is a 500
  whose body betrays a server-side race (KeyError/AttributeError/
  NoneType/RuntimeError) or carries no errors[] at all,
- DELETE answered only CLOSED-or-404,
- zero stranded sessions: engine.sessions empty, `_last_access` holds
  no entry for a dead session, and no streaming query is left active
  on the shared SparkSession.
"""

from __future__ import annotations

from fastwrite import write_rows

import concurrent.futures as cf
import json
import os
import random
import time
import urllib.error
import urllib.request

import pytest

# long-running concurrency layer: excluded from the fast gate via
# `-m 'not fuzz and not soak'` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.soak

from flink_sql_toolkit_spark.gateway import Gateway


def http(gw, method: str, path: str, body: dict | None = None):
    req = urllib.request.Request(
        gw.url + path,
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


# exception CLASSES that mean "server-side race/bug", as the FINAL
# raised type — the stack element itself legally contains a full
# Python traceback (the reference's "<Exception on server side:…>"
# wire format, flinkClient.ts:51-125), so matching raw substrings
# like "Traceback" would flag every contract-correct statement error
INTERNAL_TYPES = (
    "KeyError",
    "AttributeError",
    "TypeError",
    "IndexError",
    "RuntimeError",
    "UnboundLocalError",
    "NameError",
    "AssertionError",
)


def internal_500(status: int, out: dict) -> bool:
    """A 500 is legal iff it is a well-formed statement-error payload:
    non-empty errors[], and the final raised exception is a statement-
    level error (AnalysisException, ValueError, LookupError, …) — not
    a Python-internal type betraying a handler race."""
    if status < 500:
        return False
    errs = out.get("errors")
    if not isinstance(errs, list) or not errs:
        return True
    for e in errs:
        lines = [ln.strip() for ln in str(e).splitlines() if ln.strip(" >")]
        final = lines[-1] if lines else ""
        if any(final.startswith(t + ":") or f".{t}:" in final for t in INTERNAL_TYPES):
            return True
    return False


# Duration knob (VERDICT r12 ask #5): FSTK_SOAK_SECONDS > 0 turns the
# fixed 4-iteration soak into a deadline loop for nightly runs, e.g.
#   FSTK_SOAK_SECONDS=600 python -m pytest -m soak tests/test_gateway_soak.py
# The default (0) keeps the CI-friendly 4 iterations per worker.
SOAK_SECONDS = float(os.environ.get("FSTK_SOAK_SECONDS", "0"))
# FSTK_SOAK_MIX=0 restricts the long soak to the original streaming-
# SELECT workload (a control for isolating load regressions to the
# TVF/DML scenarios).
SOAK_MIX = os.environ.get("FSTK_SOAK_MIX", "1") != "0"


def _tvf_workload(stmt, http, g, h, seed: int, it: int, src: str, tmp: str):
    """Streaming TVF INSERT into an APPEND sink through the wire —
    exercises the group_struct retry + job lifecycle under reaping."""
    s, o = stmt(
        f"CREATE TABLE tw_{seed}_{it} (ts TIMESTAMP(3), n INT, "
        "WATERMARK FOR ts AS ts - INTERVAL '1' SECOND) WITH "
        f"('connector'='filesystem', 'path'='{src}', 'format'='parquet')"
    )
    if s != 200:
        return
    s, o = stmt(
        f"CREATE TABLE twsink_{seed}_{it} (ws TIMESTAMP(3), c BIGINT) WITH "
        f"('connector'='filesystem', 'path'='{tmp}/twsink_{seed}_{it}', "
        "'format'='parquet')"
    )
    if s != 200:
        return
    s, o = stmt(
        f"INSERT INTO twsink_{seed}_{it} SELECT window_start AS ws, "
        f"COUNT(*) AS c FROM TABLE(TUMBLE(TABLE tw_{seed}_{it}, "
        "DESCRIPTOR(ts), INTERVAL '10' SECOND)) GROUP BY window_start"
    )
    if s != 200:
        return
    # fetch the job id row (poll past NOT_READY), then ALWAYS stop it
    # — a leaked 1 s-trigger job compounds across hundreds of long-
    # soak iterations into host saturation (session close also stops
    # jobs, but the reaper may not win for seconds under load)
    oh = o["operationHandle"]
    job_id, deadline = None, time.time() + 10
    while time.time() < deadline:
        s, page = http(g, "GET", f"/sessions/{h}/operations/{oh}/result/0")
        if s != 200:
            break
        data = page.get("results", {}).get("data")
        if data:
            job_id = data[0]["fields"][0]
            break
        time.sleep(0.3)
    if job_id:
        stmt(f"STOP JOB '{job_id}'")


def _stmt_set_workload(stmt, http, g, h, seed: int, it: int, tmp: str):
    """STATEMENT SET through the wire (r14): two continuous INSERTs
    submitted as one set — exercises the operation-scoped savepoint
    override under the same concurrent-session load that made the
    old shared-conf publication a race (ADVICE r13 #1). Jobs are
    fetched from the set's result rows and always stopped."""
    s, o = stmt(
        f"CREATE TABLE ss_src_{seed}_{it} (id BIGINT) WITH "
        f"('connector'='datagen', 'rows-per-second'='50')"
    )
    if s != 200:
        return
    for i in (1, 2):
        s, o = stmt(
            f"CREATE TABLE ss_sink{i}_{seed}_{it} (id BIGINT) WITH "
            f"('connector'='filesystem', "
            f"'path'='{tmp}/ss{i}_{seed}_{it}', 'format'='parquet')"
        )
        if s != 200:
            return
    s, o = stmt(
        "BEGIN STATEMENT SET; "
        f"INSERT INTO ss_sink1_{seed}_{it} SELECT id FROM ss_src_{seed}_{it}; "
        f"INSERT INTO ss_sink2_{seed}_{it} SELECT id FROM ss_src_{seed}_{it}; "
        "END;"
    )
    if s != 200:
        return
    oh = o["operationHandle"]
    job_ids, deadline = [], time.time() + 10
    while time.time() < deadline:
        s, page = http(g, "GET", f"/sessions/{h}/operations/{oh}/result/0")
        if s != 200:
            break
        data = page.get("results", {}).get("data")
        if data:
            job_ids = [r["fields"][0] for r in data if r["fields"][0] != "OK"]
            break
        time.sleep(0.3)
    for j in job_ids:
        stmt(f"STOP JOB '{j}'")


def _dml_workload(stmt, seed: int, it: int, tmp: str):
    """Batch COW DML through the wire: create → insert → update →
    delete → read back; errors classify like any statement."""
    stmt("SET 'execution.runtime-mode' = 'batch'")
    s, o = stmt(
        f"CREATE TABLE dml_{seed}_{it} (id BIGINT, v STRING) WITH "
        f"('connector'='filesystem', 'path'='{tmp}/dml_{seed}_{it}', "
        "'format'='parquet')"
    )
    if s != 200:
        return
    stmt(f"INSERT INTO dml_{seed}_{it} VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    stmt(f"UPDATE dml_{seed}_{it} SET v = 'x' WHERE id = 2")
    stmt(f"DELETE FROM dml_{seed}_{it} WHERE id = 3")
    stmt(f"SELECT * FROM dml_{seed}_{it}")


def test_full_workload_soak_no_500s_no_strands(spark, tmp_path_factory):
    # snapshot pre-existing streams: the module-scoped spark fixture
    # may carry another file's still-terminating query; only streams
    # BORN here count as leaks
    pre_existing = {q.id for q in spark.streams.active}
    g = Gateway(spark, session_idle_timeout_s=2.5).start()
    bad: list = []
    tmp = str(tmp_path_factory.mktemp("soak"))
    # shared watermarked source for the TVF INSERT scenario
    import datetime as dt

    tvf_src = f"{tmp}/tvf_src"
    write_rows(tvf_src, [(dt.datetime(2024, 1, 1, 0, 0, s_), 1) for s_ in (1, 2, 11)]
        + [(dt.datetime(2024, 1, 1, 0, 2, 0), 1)], "ts timestamp, n int",)

    def worker(seed: int) -> None:
        rng = random.Random(seed)
        deadline = time.time() + SOAK_SECONDS
        it = -1
        while True:
            it += 1
            if SOAK_SECONDS > 0:
                if time.time() >= deadline:
                    break
            elif it >= 4:
                break
            status, out = http(g, "POST", "/sessions", {"sessionName": f"soak{seed}-{it}"})
            if status != 200:
                bad.append(("open", status, out))
                continue
            h = out["sessionHandle"]

            def stmt(sql: str):
                s, o = http(g, "POST", f"/sessions/{h}/statements", {"statement": sql})
                # the reaper may legally kill the session mid-workload
                # (timeout 2.5 s vs multi-second Spark statements) —
                # that surfaces as a 4xx "session does not exist",
                # never a 500
                if internal_500(s, o):
                    bad.append(("stmt-500", sql, s, o))
                return s, o

            # seeded statement-mix, EXCLUSIVE per iteration (additive
            # scenarios compounded load until iterations overran the
            # deadline by minutes): TVF INSERT / batch DML / the
            # original streaming-SELECT workload
            scenario = rng.random() if SOAK_MIX else 1.0
            if scenario < 0.2:
                _tvf_workload(stmt, http, g, h, seed, it, tvf_src, tmp)
                s, o = http(g, "DELETE", f"/sessions/{h}")
                if s not in (200, 404):
                    bad.append(("delete", s, o))
                continue
            if scenario < 0.35:
                _stmt_set_workload(stmt, http, g, h, seed, it, tmp)
                s, o = http(g, "DELETE", f"/sessions/{h}")
                if s not in (200, 404):
                    bad.append(("delete", s, o))
                continue
            if scenario < 0.5:
                _dml_workload(stmt, seed, it, tmp)
                s, o = http(g, "DELETE", f"/sessions/{h}")
                if s not in (200, 404):
                    bad.append(("delete", s, o))
                continue
            s, o = stmt(
                f"CREATE TABLE dg_{seed}_{it} (x BIGINT, s STRING) WITH "
                "('connector'='datagen', 'rows-per-second'='100')"
            )
            if s != 200:
                continue
            s, o = stmt(f"SELECT x, s FROM dg_{seed}_{it}")
            if s != 200:
                continue
            oh = o["operationHandle"]
            # page the streaming result a little. NB: its deadline must
            # NOT reuse the worker's `deadline` — rebinding it pushed
            # the soak deadline 20 s forward on every iteration, so a
            # duration-mode run could never exit (found via the r13
            # long-run recording: 45 s soaks ran for 40+ min).
            token, page_deadline = 0, time.time() + 20
            while time.time() < page_deadline:
                s, page = http(
                    g, "GET", f"/sessions/{h}/operations/{oh}/result/{token}"
                )
                if internal_500(s, page):
                    bad.append(("fetch-500", s, page))
                    break
                if s != 200:
                    break  # reaped mid-poll / statement error — legal
                if page.get("resultType") == "PAYLOAD" and page["results"]["data"]:
                    break
                token = page.get("nextResultToken", token) or token
                time.sleep(0.2)
            # cancel (possibly after reap: 404/4xx fine, 500 not)
            s, o = http(g, "POST", f"/sessions/{h}/operations/{oh}/cancel")
            if internal_500(s, o):
                bad.append(("cancel-500", s, o))
            if rng.random() < 0.3:
                time.sleep(rng.uniform(0.0, 3.0))  # let the reaper win some
            s, o = http(g, "DELETE", f"/sessions/{h}")
            if s == 200 and o.get("status") != "CLOSED":
                bad.append(("delete-body", s, o))
            if s not in (200, 404):
                bad.append(("delete", s, o))

    with cf.ThreadPoolExecutor(max_workers=6) as ex:
        list(ex.map(worker, range(6)))

    try:
        if bad:  # full payloads — pytest's repr truncation splices them
            import pathlib

            pathlib.Path("/tmp/soak_bad.json").write_text(
                json.dumps(bad, indent=1, default=str)
            )
        assert not bad, bad[:8]
        time.sleep(0.5)
        assert not g.engine.sessions, (
            f"stranded sessions: {list(g.engine.sessions)}"
        )
        with g._access_lock:
            stranded = [h for h in g._last_access if h not in g.engine.sessions]
        assert not stranded, f"stranded idleness entries: {stranded}"
        # no streaming query born in this soak may outlive its session
        live = [
            q.name
            for q in spark.streams.active
            if q.id not in pre_existing
            and q.name
            and q.name.startswith("select-")
        ]
        assert not live, f"leaked streaming queries: {live}"
    finally:
        g.stop()
