"""Regression tests for the round-2 ADVICE.md correctness bugs plus
the engine's lazy paged fetch:

1. partition-pruned COW must handle boolean partition values (Python
   ``str(True)`` vs Spark's hive-style ``true``) — previously a silent
   no-op that still reported rows_affected.
2. partition-pruned COW must not lose committed data when the swap
   fails mid-loop — trashed partitions are restored.
3. MATCH_RECOGNIZE DEFINE referencing ANOTHER symbol must raise, not
   silently rewrite to the current row.
4. ``INSERT INTO t (b, a) SELECT ...`` must honor the column list.
5. MERGE with a target row matched by multiple source rows (with an
   applicable UPDATE/DELETE) must raise; non-applying duplicate
   matches must emit the target row exactly once.
6. Batch SELECT results are pulled lazily (no full collect()).
"""

from __future__ import annotations

import os

import pytest

from flink_sql_toolkit_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def session(engine):
    s = engine.open_session("advice")
    yield s
    s.close()


def _rows(session, sql):
    return session.execute_statement(sql).fetch()["data"]


# -- 1: boolean partition values ------------------------------------


def test_cow_boolean_partition_update(session, tmp_path):
    session.execute_statement("SET 'execution.runtime-mode'='batch'")
    path = tmp_path / "boolp"
    session.spark.createDataFrame(
        [(1, True, 1.0), (2, False, 2.0), (3, True, 3.0)],
        "id long, flag boolean, amt double",
    ).write.partitionBy("flag").parquet(str(path))
    session.execute_statement(
        f"CREATE TABLE boolp (id BIGINT, flag BOOLEAN, amt DOUBLE) "
        f"PARTITIONED BY (flag) WITH "
        f"('connector'='filesystem', 'path'='{path}', 'format'='parquet')"
    )
    # Spark writes flag=true / flag=false — the pruned swap must find them
    assert sorted(d for d in os.listdir(path) if d.startswith("flag=")) == [
        "flag=false",
        "flag=true",
    ]
    assert _rows(session, "UPDATE boolp SET amt = 0.0 WHERE flag = true") == [[2]]
    assert _rows(session, "SELECT id, amt FROM boolp ORDER BY id") == [
        [1, 0.0],
        [2, 2.0],
        [3, 0.0],
    ]


def test_cow_default_partition_value(session, tmp_path):
    """An empty-string partition value lands in
    ``__HIVE_DEFAULT_PARTITION__`` (and reads back as NULL) — the
    pruned swap must still find and rewrite that directory."""
    session.execute_statement("SET 'execution.runtime-mode'='batch'")
    path = tmp_path / "emptyp"
    session.spark.createDataFrame(
        [(1, "", 1.0), (2, "us", 2.0)], "id long, region string, amt double"
    ).write.partitionBy("region").parquet(str(path))
    session.execute_statement(
        f"CREATE TABLE emptyp (id BIGINT, region STRING, amt DOUBLE) "
        f"PARTITIONED BY (region) WITH "
        f"('connector'='filesystem', 'path'='{path}', 'format'='parquet')"
    )
    assert _rows(session, "UPDATE emptyp SET amt = 9.0 WHERE id = 1") == [[1]]
    assert _rows(session, "SELECT id, amt FROM emptyp ORDER BY id") == [
        [1, 9.0],
        [2, 2.0],
    ]


# -- 2: mid-swap failure keeps data recoverable ----------------------


def test_cow_partition_swap_failure_restores_trash(session, tmp_path, monkeypatch):
    session.execute_statement("SET 'execution.runtime-mode'='batch'")
    path = tmp_path / "failp"
    session.spark.createDataFrame(
        [(1, "eu", 1.0), (2, "us", 2.0), (3, "eu", 3.0)],
        "id long, region string, amt double",
    ).write.partitionBy("region").parquet(str(path))
    session.execute_statement(
        f"CREATE TABLE failp (id BIGINT, region STRING, amt DOUBLE) "
        f"PARTITIONED BY (region) WITH "
        f"('connector'='filesystem', 'path'='{path}', 'format'='parquet')"
    )

    from flink_sql_toolkit_spark.sources import dml

    real_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        # let the trash move succeed, fail the stage→live swap
        if "__cow_" in src and "__cow_old_" not in src and "__cow_old_" not in dst:
            raise OSError("injected rename failure")
        calls["n"] += 1
        return real_rename(src, dst)

    monkeypatch.setattr(dml.os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected"):
        session.execute_statement("UPDATE failp SET amt = 0.0 WHERE region = 'eu'")
    monkeypatch.undo()

    # the committed snapshot is fully intact — no partition lost
    session.refresh_connector_views()
    assert _rows(session, "SELECT id, amt FROM failp ORDER BY id") == [
        [1, 1.0],
        [2, 2.0],
        [3, 3.0],
    ]


# -- 3: MATCH_RECOGNIZE cross-symbol DEFINE --------------------------


def test_match_recognize_cross_symbol_define_now_matches(spark):
    """Cross-symbol DEFINE (B compares against the row mapped to A)
    is now a dynamic predicate, not a rejection — the advice item's
    concern (silently rewriting to the current row) stays impossible:
    the reference resolves against the match context."""
    from flink_sql_toolkit_spark.operators.match_recognize import match_recognize

    df = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 20.0), ("u", 3, 5.0), ("u", 4, 4.0)],
        "k string, seq int, price double",
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B",
        define={"B": "B.price > A.price"},
        measures={"a": "FIRST(A.seq)", "p": "LAST(B.price)"},
    ).collect()
    # A=row1 (any row), B=row2 (20 > 10); rows 3,4 descend → no match
    assert sorted((r.a, r.p) for r in out) == [(1, 20.0)]


def test_match_recognize_own_symbol_qualifier_still_works(spark):
    from flink_sql_toolkit_spark.operators.match_recognize import match_recognize

    df = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 20.0)], "k string, seq int, price double"
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B",
        define={"A": "A.price < 15", "B": "B.price > PREV(B.price)"},
        measures={"p": "LAST(B.price)"},
    ).collect()
    assert [(r.k, r.p) for r in out] == [("u", 20.0)]


# -- 4: INSERT column list -------------------------------------------


def test_insert_explicit_column_list(session, tmp_path):
    session.execute_statement("SET 'execution.runtime-mode'='batch'")
    path = tmp_path / "ins_t"
    session.spark.createDataFrame([], "id long, tag string, amt double").write.parquet(
        str(path)
    )
    session.execute_statement(
        f"CREATE TABLE ins_t (id BIGINT, tag STRING, amt DOUBLE) WITH "
        f"('connector'='filesystem', 'path'='{path}', 'format'='parquet')"
    )
    # reversed column order: values must land in the NAMED columns
    session.execute_statement(
        "INSERT INTO ins_t (amt, id) SELECT 5.5 AS a, CAST(7 AS BIGINT) AS b"
    )
    assert _rows(session, "SELECT id, tag, amt FROM ins_t") == [[7, None, 5.5]]


def test_insert_column_list_errors(session, tmp_path):
    session.execute_statement("SET 'execution.runtime-mode'='batch'")
    path = tmp_path / "ins_e"
    session.spark.createDataFrame([], "id long, tag string").write.parquet(str(path))
    session.execute_statement(
        f"CREATE TABLE ins_e (id BIGINT, tag STRING) WITH "
        f"('connector'='filesystem', 'path'='{path}', 'format'='parquet')"
    )
    with pytest.raises(ValueError, match="unknown column"):
        session.execute_statement("INSERT INTO ins_e (nope) SELECT 1")
    with pytest.raises(ValueError, match="produces"):
        session.execute_statement("INSERT INTO ins_e (id) SELECT 1, 2")


# -- 5: MERGE cardinality --------------------------------------------


def _fs_table(session, tmp_path, name):
    session.execute_statement("SET 'execution.runtime-mode'='batch'")
    path = tmp_path / name
    session.spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, tag string, amt double"
    ).write.parquet(str(path))
    session.execute_statement(
        f"CREATE TABLE {name} (id BIGINT, tag STRING, amt DOUBLE) WITH "
        f"('connector'='filesystem', 'path'='{path}', 'format'='parquet')"
    )
    return name


def test_merge_duplicate_source_match_raises(session, tmp_path):
    t = _fs_table(session, tmp_path, "m_dup")
    session.spark.createDataFrame(
        [(1, 100.0), (1, 200.0)], "id long, amt double"
    ).createOrReplaceTempView("m_dup_src")
    with pytest.raises(ValueError, match="matched multiple source rows"):
        session.execute_statement(f"""
            MERGE INTO {t} tgt USING m_dup_src s ON tgt.id = s.id
            WHEN MATCHED THEN UPDATE SET amt = s.amt
        """)


def test_merge_nonapplying_duplicate_match_emits_once(session, tmp_path):
    t = _fs_table(session, tmp_path, "m_dup2")
    session.spark.createDataFrame(
        [(1, -100.0), (1, -200.0), (9, 900.0)], "id long, amt double"
    ).createOrReplaceTempView("m_dup2_src")
    # the matched clause applies to NEITHER duplicate (amt > 0 filter):
    # target row 1 must come out exactly once, unchanged
    op = session.execute_statement(f"""
        MERGE INTO {t} tgt USING m_dup2_src s ON tgt.id = s.id
        WHEN MATCHED AND s.amt > 0 THEN UPDATE SET amt = s.amt
        WHEN NOT MATCHED THEN INSERT (id, tag, amt) VALUES (s.id, 'new', s.amt)
    """)
    assert op.fetch()["data"] == [[1]]  # just the insert
    assert _rows(session, f"SELECT id, tag, amt FROM {t} ORDER BY id") == [
        [1, "a", 10.0],
        [2, "b", 20.0],
        [9, "new", 900.0],
    ]


# -- 6: lazy paged batch fetch ---------------------------------------


def test_batch_select_is_lazily_paged(session, sf_dir):
    session.spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders_lazy"
    )
    op = session.execute_statement(
        "SELECT o_orderkey FROM orders_lazy ORDER BY o_orderkey"
    )
    # nothing materialized at execute time: rows arrive page by page
    assert op._rows == [] and op._row_iter is not None
    page0 = op.fetch(0)
    assert page0["resultType"] == "PAYLOAD" and len(page0["data"]) == 1000
    assert len(op._rows) <= 1000  # only what paging pulled, not the table
    total = len(page0["data"])
    token = page0["nextResultToken"]
    while True:
        page = op.fetch(token)
        if page["resultType"] == "EOS":
            break
        total += len(page["data"])
        token = page["nextResultToken"]
    assert total == 1500


def test_batch_fetch_eviction_raises_on_rewind(session, sf_dir, monkeypatch):
    """Pages past the retention window are evicted; rewinding to one
    raises the documented forward-fetch error instead of silently
    returning wrong rows."""
    from flink_sql_toolkit_spark import engine as engine_mod

    monkeypatch.setattr(engine_mod, "RETAIN_ROWS", engine_mod.PAGE_SIZE)
    session.spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders_evict"
    )
    op = session.execute_statement(
        "SELECT o_orderkey FROM orders_evict ORDER BY o_orderkey"
    )
    first = op.fetch(0)["data"]
    assert len(first) == engine_mod.PAGE_SIZE
    op.fetch(1)  # advances past the window → page 0 evicted
    assert op.fetch(1)["data"]  # replay of the current page still works
    with pytest.raises(ValueError, match="evicted"):
        op.fetch(0)
