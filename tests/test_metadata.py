"""Metadata TTL cache, in-flight dedup, and completion API.

Mirrors the reference's cache semantics (src/catalogProvider.ts:
349-377: TTL hit, concurrent-request dedup, failed-fetch eviction)
and the completion-provider metadata contract
(src/completionProvider.ts:69-172).
"""

from __future__ import annotations

import threading

import pytest

from flink_sql_toolkit_spark.engine import Engine
from flink_sql_toolkit_spark.metadata import (
    BUILTIN_FUNCTIONS,
    MetadataCache,
    extract_table_references,
)


# -- MetadataCache unit behavior (no Spark needed) --------------------


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0

    def __call__(self) -> float:
        return self.t


def test_cache_hit_within_ttl_and_refetch_after():
    clock = FakeClock()
    cache = MetadataCache(ttl_s=60.0, clock=clock)
    calls = []

    def fetch():
        calls.append(1)
        return ["a", "b"]

    assert cache.get("k", fetch) == ["a", "b"]
    clock.t = 59.0
    assert cache.get("k", fetch) == ["a", "b"]
    assert len(calls) == 1  # served from cache inside the TTL
    clock.t = 121.0
    assert cache.get("k", fetch) == ["a", "b"]
    assert len(calls) == 2  # expired → refetched


def test_concurrent_requests_share_one_fetch():
    cache = MetadataCache(ttl_s=60.0)
    started = threading.Event()
    release = threading.Event()
    calls = []

    def slow_fetch():
        calls.append(1)
        started.set()
        release.wait(5)
        return "data"

    results = []
    t1 = threading.Thread(target=lambda: results.append(cache.get("k", slow_fetch)))
    t1.start()
    assert started.wait(5)
    # second caller arrives while the first fetch is in flight
    t2 = threading.Thread(target=lambda: results.append(cache.get("k", slow_fetch)))
    t2.start()
    release.set()
    t1.join(5)
    t2.join(5)
    assert results == ["data", "data"]
    assert len(calls) == 1  # deduplicated: one real fetch


def test_failed_fetch_is_evicted_and_retried():
    cache = MetadataCache(ttl_s=60.0)
    calls = []

    def failing():
        calls.append(1)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        cache.get("k", failing)
    # failure was not cached: the next call retries and can succeed
    assert cache.get("k", lambda: "ok") == "ok"
    assert len(calls) == 1


def test_follower_sees_leader_failure():
    cache = MetadataCache(ttl_s=60.0)
    started = threading.Event()
    release = threading.Event()

    def failing():
        started.set()
        release.wait(5)
        raise RuntimeError("boom")

    errors = []

    def leader():
        try:
            cache.get("k", failing)
        except RuntimeError as e:
            errors.append(e)

    def follower():
        try:
            cache.get("k", failing)
        except RuntimeError as e:
            errors.append(e)

    t1 = threading.Thread(target=leader)
    t1.start()
    assert started.wait(5)
    t2 = threading.Thread(target=follower)
    t2.start()
    release.set()
    t1.join(5)
    t2.join(5)
    assert len(errors) == 2


def test_prefix_invalidation():
    cache = MetadataCache(ttl_s=60.0)
    cache.get("tables:current", lambda: ["t1"])
    cache.get("columns:orders", lambda: ["a"])
    cache.invalidate("tables")
    assert cache.get("tables:current", lambda: ["t2"]) == ["t2"]  # dropped
    assert cache.get("columns:orders", lambda: ["b"]) == ["a"]  # kept
    cache.invalidate()
    assert cache.get("columns:orders", lambda: ["b"]) == ["b"]


def test_extract_table_references():
    refs = extract_table_references(
        "SELECT o.x FROM orders AS o JOIN `lineitem` l ON o.id = l.id"
    )
    assert {"tableName": "orders", "alias": "o", "fullPath": "orders"} in refs
    assert {"tableName": "lineitem", "alias": "l", "fullPath": "lineitem"} in refs
    # implicit alias = table name; qualified path keeps last part
    refs2 = extract_table_references("SELECT * FROM cat.db.orders WHERE x > 1")
    assert refs2[0]["alias"] == "orders"
    assert refs2[0]["fullPath"] == "cat.db.orders"


# -- engine integration ----------------------------------------------


@pytest.fixture(scope="module")
def session(spark):
    engine = Engine(spark)
    sess = engine.open_session("meta-test")
    yield sess
    sess.close()


def test_show_tables_cached_and_invalidated_by_ddl(session):
    session.execute_statement(
        "CREATE TABLE meta_t1 (id INT, v STRING) WITH ('connector'='datagen')"
    )
    op = session.execute_statement("SHOW TABLES")
    assert ["meta_t1"] in op.result_rows()
    before = session.metadata.cache.fetch_count
    session.execute_statement("SHOW TABLES")
    assert session.metadata.cache.fetch_count == before  # cache hit
    # DDL invalidates: the new table appears without waiting out the TTL
    session.execute_statement(
        "CREATE TABLE meta_t2 (id INT) WITH ('connector'='datagen')"
    )
    op = session.execute_statement("SHOW TABLES")
    assert ["meta_t2"] in op.result_rows()


def test_describe_cached_and_refreshed_on_alter(session):
    op = session.execute_statement("DESCRIBE meta_t1")
    names = [r[0] for r in op.result_rows()]
    assert names == ["id", "v"]
    before = session.metadata.cache.fetch_count
    session.execute_statement("DESCRIBE meta_t1")
    assert session.metadata.cache.fetch_count == before
    session.execute_statement("ALTER TABLE meta_t1 ADD COLUMN w DOUBLE")
    op = session.execute_statement("DESCRIBE meta_t1")
    assert [r[0] for r in op.result_rows()] == ["id", "v", "w"]


def test_completions_keywords_tables_and_columns(session):
    items = session.completions("SELECT ")
    labels = {i["label"] for i in items}
    kinds = {i["kind"] for i in items}
    assert "FROM" in labels and "SELECT" in labels
    assert set(BUILTIN_FUNCTIONS) <= labels
    assert {"keyword", "function", "catalog", "table"} <= kinds
    assert "meta_t1" in labels


def test_completions_alias_dot_gives_columns(session):
    sql = "SELECT m. FROM meta_t1 m"
    items = session.completions(sql, line_prefix="SELECT m.")
    assert items, "dot context should produce column items"
    assert {i["label"] for i in items} >= {"id", "v", "w"}
    assert all(i["kind"] == "column" for i in items)  # keywords suppressed


def test_completions_catalog_dot_gives_databases(session):
    cat = session.spark.catalog.currentCatalog()
    items = session.completions(f"SELECT * FROM {cat}.", line_prefix=f"SELECT * FROM {cat}.")
    dbs = [i for i in items if i["kind"] == "database"]
    assert any(d["label"] == "default" for d in dbs)


def test_show_like_filters(spark):
    """SHOW TABLES/VIEWS/DATABASES/FUNCTIONS [NOT] LIKE 'pattern'
    (Flink SQL LIKE semantics: % / _) — previously the filter was
    silently ignored and the full listing came back."""
    from flink_sql_toolkit_spark.engine import Engine

    eng = Engine(spark)
    s = eng.open_session("show-like")
    try:
        for n in ("lk_alpha", "lk_beta", "other_t"):
            s.execute_statement(
                f"CREATE TABLE {n} (a INT) WITH ('connector'='blackhole')"
            )
        rows = s.execute_statement("SHOW TABLES LIKE 'lk%'")._rows
        assert [r[0] for r in rows] == ["lk_alpha", "lk_beta"]
        rows = s.execute_statement("SHOW TABLES NOT LIKE 'lk%'")._rows
        assert "other_t" in [r[0] for r in rows]
        assert not any(r[0].startswith("lk_") for r in rows)
        # _ matches exactly one character
        rows = s.execute_statement("SHOW TABLES LIKE 'lk_alph_'")._rows
        assert [r[0] for r in rows] == ["lk_alpha"]
        rows = s.execute_statement("SHOW FUNCTIONS LIKE 'sha%'")._rows
        assert all(r[0].startswith("sha") for r in rows) and rows
    finally:
        eng.close_session(s.handle)


def test_show_like_fifth_review_fixes(spark):
    """Fifth late-r9 review pass: LIKE-literal dispatch, escaped
    quotes, ILIKE, SHOW CATALOGS LIKE, FROM+LIKE combination."""
    from flink_sql_toolkit_spark.engine import Engine

    eng = Engine(spark)
    s = eng.open_session("show-like-2")
    try:
        s.execute_statement("CREATE CATALOG lk_cat WITH ('type'='t')")
        s.execute_statement("CREATE DATABASE lk_cat.prod_a")
        s.execute_statement("CREATE DATABASE lk_cat.dev_b")
        # SHOW CATALOGS LIKE includes emulated catalogs
        rows = s.execute_statement("SHOW CATALOGS LIKE 'lk%'")._rows
        assert rows == [["lk_cat"]]
        # FROM + LIKE combine
        rows = s.execute_statement("SHOW DATABASES FROM lk_cat LIKE 'prod%'")._rows
        assert rows == [["prod_a"]]
        # a LIKE literal containing FROM/IN must not flip the source
        s.execute_statement("USE CATALOG lk_cat")
        s.execute_statement("USE prod_a")
        s.execute_statement("CREATE TABLE in_t (a INT) WITH ('connector'='blackhole')")
        rows = s.execute_statement("SHOW TABLES LIKE 'in%'")._rows
        assert rows == [["in_t"]]  # emulated db listing, filtered
        # ILIKE is case-insensitive; LIKE is case-sensitive
        assert s.execute_statement("SHOW TABLES ILIKE 'IN%'")._rows == [["in_t"]]
        assert s.execute_statement("SHOW TABLES LIKE 'IN%'")._rows == []
        s.execute_statement("USE CATALOG spark_catalog")
    finally:
        eng.close_session(s.handle)


def test_alter_set_escaped_quote_value(spark):
    from flink_sql_toolkit_spark.engine import Engine

    eng = Engine(spark)
    s = eng.open_session("alter-esc")
    try:
        s.execute_statement("CREATE TABLE esc_t (a INT) WITH ('connector'='blackhole')")
        s.execute_statement("ALTER TABLE esc_t SET ('note'='it''s fine')")
        assert s.connector_tables["esc_t"].options["note"] == "it's fine"
        # round-trips through synthesize_ddl and back
        from flink_sql_toolkit_spark.sources.ddl import parse_create_table

        ddl = s.execute_statement("SHOW CREATE TABLE esc_t")._rows[0][0]
        assert parse_create_table(ddl + ";").options["note"] == "it's fine"
    finally:
        eng.close_session(s.handle)


def test_rt_type_struct_field_named_timestamp():
    from flink_sql_toolkit_spark.sources.ddl import _rt_type, flink_type_to_spark

    # struct<> re-emerges as Flink ROW<> with field names VERBATIM
    # (ADVICE r9: a blanket .upper() mangled field-name case) — a
    # field named 'timestamp' is a name, not a type
    assert _rt_type("struct<timestamp: int>") == "ROW<timestamp INT>"
    assert _rt_type("struct<ts: timestamp>") == "ROW<ts TIMESTAMP_LTZ>"
    assert _rt_type("array<timestamp>") == "ARRAY<TIMESTAMP_LTZ>"
    assert _rt_type("timestamp") == "TIMESTAMP_LTZ"
    assert _rt_type("timestamp_ntz") == "TIMESTAMP_NTZ"
    # mixed-case field names survive a LIKE/reparse round-trip
    t = "struct<myField: int, Nested: struct<Inner: timestamp>>"
    assert flink_type_to_spark(_rt_type(t)) == t
