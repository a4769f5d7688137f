"""Randomized engine-session lifecycle fuzz.

The corpus runner executes the reference's fixed statement sheet; the
gateway got an 8-thread session stress test. This fuzz covers the
remaining axis: random INTERLEAVINGS of DDL / metadata / DML
statements in one session — catalog bookkeeping (connector registry,
temp views, metadata cache, emulated browse trees) must stay
consistent under any order.

Invariants per step:
- every statement either succeeds or raises a TYPED error (ValueError,
  NotImplementedError, LookupError, KeyError is NOT typed, neither is
  AttributeError/UnboundLocalError — those are engine bugs);
- SHOW TABLES reflects exactly the session's live table set;
- a table that exists can always be DESCRIBEd and SELECTed.

Seeded — reproducible.
"""

from __future__ import annotations

import random

import pytest
from pyspark.errors.exceptions.captured import AnalysisException

from flink_sql_toolkit_spark.engine import Engine

TYPED = (ValueError, NotImplementedError, LookupError, AnalysisException)


def _run(sess, stmt: str):
    return sess.execute_statement(stmt)


@pytest.mark.parametrize("seed", [21, 84])
def test_random_statement_interleavings(spark, tmp_path, seed):
    rng = random.Random(seed)
    engine = Engine(spark)
    sess = engine.open_session(f"lifecycle-fuzz-{seed}")
    live: dict[str, str] = {}  # name -> kind ('datagen'|'fs'|'view')
    counter = 0
    try:
        for step in range(60):
            r = rng.random()
            try:
                if r < 0.18:  # create a datagen table
                    counter += 1
                    name = f"lf_dg_{seed}_{counter}"
                    _run(
                        sess,
                        f"CREATE TABLE {name} (id BIGINT, v DOUBLE) WITH "
                        "('connector'='datagen', 'number-of-rows'='20')",
                    )
                    live[name] = "datagen"
                elif r < 0.33:  # create a filesystem table
                    counter += 1
                    name = f"lf_fs_{seed}_{counter}"
                    _run(
                        sess,
                        f"CREATE TABLE {name} (id BIGINT, v DOUBLE) WITH "
                        f"('connector'='filesystem', "
                        f"'path'='{tmp_path}/{name}', 'format'='parquet')",
                    )
                    live[name] = "fs"
                elif r < 0.43 and live:  # view over a live table
                    counter += 1
                    src = rng.choice(list(live))
                    name = f"lf_v_{seed}_{counter}"
                    _run(sess, f"CREATE VIEW {name} AS SELECT id FROM {src}")
                    live[name] = "view"
                elif r < 0.53:  # INSERT into a live fs table (or invalid)
                    fs = [n for n, k in live.items() if k == "fs"]
                    if fs:
                        t = rng.choice(fs)
                        _run(
                            sess,
                            f"INSERT INTO {t} SELECT id, CAST(id AS DOUBLE) "
                            f"FROM range(5)",
                        )
                elif r < 0.65 and live:  # SELECT from a live object
                    # default runtime-mode is streaming (Flink parity),
                    # so this may start a CONTINUOUS query over a
                    # datagen/filesystem stream: poll briefly, then
                    # cancel — never leave it running
                    import time as _time  # noqa: PLC0415

                    t = rng.choice(list(live))
                    op = _run(sess, f"SELECT COUNT(*) AS n FROM {t}")
                    deadline, token, val = _time.time() + 20, 0, None
                    while _time.time() < deadline:
                        page = op.fetch(token)
                        token = page["nextResultToken"]
                        if page["data"]:
                            val = page["data"][0][0]
                            break
                        if page["resultType"] == "EOS":
                            break
                        _time.sleep(0.2)
                    op.cancel()
                    assert val is None or val >= 0
                elif r < 0.75 and live:  # DESCRIBE a live table
                    t = rng.choice(list(live))
                    op = _run(sess, f"DESCRIBE {t}")
                    assert op.fetch(0)["data"], t
                elif r < 0.85 and live:  # DROP something live
                    t = rng.choice(list(live))
                    kw = "VIEW" if live[t] == "view" else "TABLE"
                    # dropping a table a view still references is
                    # allowed session-side (temp views are lazy)
                    _run(sess, f"DROP {kw} {t}")
                    del live[t]
                    # any views over it become dangling: SELECTs raise
                    # typed AnalysisExceptions, covered below
                elif r < 0.9:  # statements about missing objects
                    ghost = f"lf_ghost_{rng.randint(0, 999)}"
                    with pytest.raises(TYPED):
                        _run(sess, f"DESCRIBE {ghost}")
                    with pytest.raises(TYPED):
                        _run(sess, f"DROP TABLE {ghost}")
                else:  # SET / RESET / SHOW interleavings
                    _run(sess, f"SET 'pipeline.name'='fuzz-{step}'")
                    if rng.random() < 0.5:
                        _run(sess, "RESET 'pipeline.name'")
            except TYPED as e:
                # typed rejections are fine anywhere (e.g. SELECT from
                # a view whose base table was dropped); internal
                # errors (KeyError/AttributeError/TypeError) would
                # propagate out of this except and fail the test
                assert str(e)
            # SHOW TABLES must track creates/drops exactly (views are
            # session temp views: Flink lists them in SHOW TABLES too)
            op = _run(sess, "SHOW TABLES")
            shown = {r2[0] for r2 in op.fetch(0)["data"]}
            expect = set(live)
            missing = expect - shown
            assert not missing, (step, sorted(missing), sorted(shown))
    finally:
        sess.close()


def test_drop_unreadable_connector_table(spark, tmp_path):
    """A filesystem table whose path has no files yet never registers
    a temp view (quarantined as unreadable) — DROP TABLE must still
    succeed cleanly (it used to remove the registry entry AND raise
    'not found' — found by the lifecycle fuzz, r11), a second DROP
    raises the typed not-found, and the unreadable marker is gone."""
    engine = Engine(spark)
    sess = engine.open_session("drop-unreadable")
    try:
        sess.execute_statement(
            f"CREATE TABLE dr_unread (id BIGINT) WITH "
            f"('connector'='filesystem', 'path'='{tmp_path}/nothing_here', "
            f"'format'='parquet')"
        )
        assert "dr_unread" in sess.unreadable_tables
        op = sess.execute_statement("DROP TABLE dr_unread")
        assert op.fetch(0)["data"] == [["OK"]]
        assert "dr_unread" not in sess.connector_tables
        assert "dr_unread" not in sess.unreadable_tables
        shown = {
            r[0]
            for r in sess.execute_statement("SHOW TABLES").fetch(0)["data"]
        }
        assert "dr_unread" not in shown
        with pytest.raises(LookupError):
            sess.execute_statement("DROP TABLE dr_unread")
    finally:
        sess.close()
