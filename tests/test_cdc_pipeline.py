"""File-backed CDC pipeline: debezium-JSON changelog -> changelog
view -> latest-per-key post-image materialization, end-to-end through
the engine (reference CDC vocabulary: test/syntax-test.fsql:705-720;
the mysql-cdc connector itself needs a database, so the fixture is the
same envelope stream written to files — the decode + materialization
path is identical).
"""

from __future__ import annotations

import json

import pytest

from flink_sql_toolkit_spark.engine import Engine

# A key's history: insert, update, delete interleaved across keys.
# Expected final state: id 1 -> "alice2" (updated), id 2 deleted,
# id 3 -> "carol" (inserted late).
EVENTS = [
    {"before": None, "after": {"id": 1, "name": "alice"}, "op": "c", "ts_ms": 1000},
    {"before": None, "after": {"id": 2, "name": "bob"}, "op": "c", "ts_ms": 1001},
    {"before": {"id": 1, "name": "alice"}, "after": {"id": 1, "name": "alice2"}, "op": "u", "ts_ms": 1002},
    {"before": {"id": 2, "name": "bob"}, "after": None, "op": "d", "ts_ms": 1003},
    {"before": None, "after": {"id": 3, "name": "carol"}, "op": "c", "ts_ms": 1004},
]


@pytest.fixture()
def cdc_dir(tmp_path):
    d = tmp_path / "cdc"
    d.mkdir()
    (d / "part-0.jsonl").write_text("\n".join(json.dumps(e) for e in EVENTS))
    return str(d)


@pytest.fixture()
def session(spark):
    s = Engine(spark).open_session("cdc-test")
    s.execute_statement("SET 'execution.runtime-mode'='batch'")
    yield s
    s.close()


def test_changelog_view_exposes_ops(session, cdc_dir):
    session.execute_statement(
        f"""
        CREATE TABLE users_cdc (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector'='filesystem', 'path'='{cdc_dir}', 'format'='debezium-json')
        """
    )
    page = session.execute_statement(
        "SELECT id, name, _op FROM users_cdc ORDER BY _ts_ms"
    ).fetch()
    rows = page["data"]
    assert rows[0] == [1, "alice", "c"]
    # the delete event carries the BEFORE image, not nulls
    assert rows[3] == [2, "bob", "d"]
    assert len(rows) == 5


def test_latest_per_key_materialization(session, cdc_dir):
    """The standard Flink dedup recipe over the changelog view yields
    the post-image table: updates collapsed, deletes gone."""
    session.execute_statement(
        f"""
        CREATE TABLE users_cdc (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector'='filesystem', 'path'='{cdc_dir}', 'format'='debezium-json')
        """
    )
    session.execute_statement(
        """
        CREATE VIEW users_latest AS
        SELECT id, name FROM (
            SELECT id, name, _op,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY _ts_ms DESC) AS rn
            FROM users_cdc
        ) WHERE rn = 1 AND _op <> 'd'
        """
    )
    page = session.execute_statement("SELECT * FROM users_latest ORDER BY id").fetch()
    assert page["data"] == [[1, "alice2"], [3, "carol"]]


def test_canal_and_maxwell_file_decode(session, tmp_path):
    canal = tmp_path / "canal"
    canal.mkdir()
    (canal / "events.jsonl").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"data": [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}], "type": "INSERT", "ts": 5},
                {"data": [{"id": 1, "name": "x2"}], "type": "UPDATE", "ts": 6},
            ]
        )
    )
    session.execute_statement(
        f"""
        CREATE TABLE t_canal (id BIGINT, name STRING)
        WITH ('connector'='filesystem', 'path'='{canal}', 'format'='canal-json')
        """
    )
    rows = session.execute_statement(
        "SELECT id, name, _op FROM t_canal ORDER BY _ts_ms, id"
    ).fetch()["data"]
    assert rows == [[1, "x", "INSERT"], [2, "y", "INSERT"], [1, "x2", "UPDATE"]]

    maxwell = tmp_path / "maxwell"
    maxwell.mkdir()
    # maxwell: data is a single object; ts is SECONDS
    (maxwell / "events.jsonl").write_text(
        json.dumps({"data": {"id": 9, "name": "m"}, "type": "insert", "ts": 7})
    )
    session.execute_statement(
        f"""
        CREATE TABLE t_maxwell (id BIGINT, name STRING)
        WITH ('connector'='filesystem', 'path'='{maxwell}', 'format'='maxwell-json')
        """
    )
    rows = session.execute_statement(
        "SELECT id, name, _op, _ts_ms FROM t_maxwell"
    ).fetch()["data"]
    assert rows == [[9, "m", "insert", 7000]]
