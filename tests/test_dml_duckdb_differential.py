"""DuckDB differential for the copy-on-write DML layer (VERDICT r11
ask #4).

test_dml_model_fuzz mirrors random INSERT/UPDATE/DELETE/MERGE onto an
in-memory Python model — but the model encodes the BUILDER's reading
of SQL semantics. Here the mirror is DuckDB executing the very same
statements, so NULL-valued columns in predicates (three-valued
logic), type coercions in SET (BIGINT id into DOUBLE amt), CASE
expressions, self-referential scalar subqueries in SET (snapshot
semantics), and affected-row counting are all oracled by a real SQL
engine. After every statement the full table contents AND the
affected-rows count must agree.

DuckDB 1.0 has no MERGE INTO; the MERGE arm is decomposed into a
snapshot-ordered DELETE/UPDATE/INSERT inside one DuckDB transaction
(matched set captured BEFORE the delete arm so a deleted key is not
re-inserted by the not-matched arm) — exact for unique source keys,
which the generator guarantees.

Seeded — reproducible.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

# randomized adversarial layer: excluded from the fast gate via
# `-m 'not fuzz'` (pyproject [tool.pytest.ini_options]); run nightly/full
pytestmark = pytest.mark.fuzz

from flink_sql_toolkit_spark.engine import Engine


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(v))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def _gen_pred(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.2:
        lo = rng.randint(0, 40)
        return f"id BETWEEN {lo} AND {lo + rng.randint(0, 25)}"
    if r < 0.35:
        tag = rng.choice(["a", "b", "c", "z"])
        return f"tag = '{tag}'"
    if r < 0.5:
        # three-valued logic: NULL amt rows must NOT match
        return f"amt > {rng.randint(0, 80)}"
    if r < 0.62:
        return "amt IS NULL" if rng.random() < 0.5 else "tag IS NOT NULL"
    if r < 0.77:
        # arithmetic + OR mixing NULLs into both branches
        return (
            f"amt * 2 > id + {rng.randint(0, 50)} "
            f"OR tag = '{rng.choice(['a', 'q'])}'"
        )
    return (
        f"NOT (amt <= {rng.randint(20, 70)}) "
        f"AND id % {rng.randint(2, 5)} = {rng.randint(0, 1)}"
    )


def _gen_sets(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.25:
        return f"amt = {float(rng.randint(0, 99))}"
    if r < 0.45:
        # NULL propagation through arithmetic
        return f"amt = amt * {rng.randint(2, 4)} + {rng.randint(0, 9)}"
    if r < 0.6:
        # cross-column coercion: BIGINT id into DOUBLE amt
        return f"amt = id * 1.5 + {rng.randint(0, 5)}"
    if r < 0.75:
        gate = rng.randint(10, 60)
        return (
            f"tag = CASE WHEN amt > {gate} THEN 'hi' "
            f"WHEN amt IS NULL THEN 'nul' ELSE 'lo' END"
        )
    if r < 0.9:
        return f"amt = NULL, tag = '{rng.choice(['x', 'y'])}'"
    # self-referential scalar subquery: snapshot semantics — every
    # row must get the PRE-update maximum
    return "amt = (SELECT MAX(amt) FROM {T} WHERE tag IS NOT NULL)"


@pytest.mark.parametrize("seed,partitioned", [(7, False), (99, True)])
def test_dml_differential_vs_duckdb(spark, tmp_path, seed, partitioned):
    rng = random.Random(seed)
    engine = Engine(spark)
    sess = engine.open_session(f"dml-duck-{seed}")
    name = f"dduck_{seed}"
    part = "PARTITIONED BY (tag) " if partitioned else ""
    duck = duckdb.connect()
    duck.execute(f"CREATE TABLE {name} (id BIGINT, tag VARCHAR, amt DOUBLE)")
    try:
        sess.execute_statement("SET 'execution.runtime-mode'='batch'")
        sess.execute_statement(
            f"CREATE TABLE {name} (id BIGINT, tag STRING, amt DOUBLE) "
            f"{part}WITH ('connector'='filesystem', "
            f"'path'='{tmp_path}/{name}', 'format'='parquet')"
        )
        next_id = 0

        def check(step, stmt):
            got = _norm(
                tuple(r)
                for r in sess.execute_statement(
                    f"SELECT id, tag, amt FROM {name}"
                ).fetch()["data"]
            )
            exp = _norm(
                duck.execute(f"SELECT id, tag, amt FROM {name}").fetchall()
            )
            assert got == exp, (step, stmt, got[:5], exp[:5])

        def insert(n_rows):
            nonlocal next_id
            vals = []
            for i in range(n_rows):
                tag = rng.choice(["'a'", "'b'", "'c'", "NULL"])
                amt = (
                    "CAST(NULL AS DOUBLE)"
                    if rng.random() < 0.2
                    else f"CAST({float(rng.randint(0, 99))} AS DOUBLE)"
                )
                vals.append(f"({next_id + i}, {tag}, {amt})")
            next_id += n_rows
            stmt = f"INSERT INTO {name} VALUES {', '.join(vals)}"
            sess.execute_statement(stmt)
            duck.execute(stmt.replace("CAST(NULL AS DOUBLE)", "NULL"))
            return stmt

        def merge(step):
            nonlocal next_id
            ids = rng.sample(range(max(next_id, 1) + 10), rng.randint(1, 5))
            next_id = max(next_id, max(ids) + 1)
            src = [(i, float(rng.randint(-20, 99))) for i in ids]
            gate = rng.randint(0, 30)
            values = " UNION ALL ".join(
                f"SELECT {i} AS id, CAST({a} AS DOUBLE) AS amt" for i, a in src
            )
            stmt = f"""
                MERGE INTO {name} tgt USING ({values}) s ON tgt.id = s.id
                WHEN MATCHED AND s.amt < {gate} THEN DELETE
                WHEN MATCHED THEN UPDATE SET amt = s.amt
                WHEN NOT MATCHED THEN INSERT (id, tag, amt)
                    VALUES (s.id, 'm', s.amt)
            """
            op = sess.execute_statement(stmt)
            # decomposed mirror: matched set snapshotted FIRST
            duck.execute("BEGIN")
            duck.execute(f"CREATE TEMP TABLE _src AS SELECT * FROM ({values})")
            duck.execute(
                f"CREATE TEMP TABLE _matched AS "
                f"SELECT s.id, s.amt FROM _src s JOIN {name} t ON t.id = s.id"
            )
            duck.execute(
                f"DELETE FROM {name} WHERE id IN "
                f"(SELECT id FROM _matched WHERE amt < {gate})"
            )
            duck.execute(
                f"UPDATE {name} SET amt = "
                f"(SELECT amt FROM _matched m WHERE m.id = {name}.id) "
                f"WHERE id IN (SELECT id FROM _matched WHERE amt >= {gate})"
            )
            duck.execute(
                f"INSERT INTO {name} SELECT id, 'm', amt FROM _src "
                f"WHERE id NOT IN (SELECT id FROM _matched)"
            )
            duck.execute("DROP TABLE _src")
            duck.execute("DROP TABLE _matched")
            duck.execute("COMMIT")
            # every unique-key source row takes exactly one arm
            assert op.fetch()["data"] == [[len(src)]], (step, src, gate)
            return stmt

        insert(25)
        check(-1, "seed insert")
        for step in range(18):
            r = rng.random()
            if r < 0.18:
                stmt = insert(rng.randint(1, 6))
            elif r < 0.33:
                stmt = merge(step)
            elif r < 0.66:
                sets = _gen_sets(rng).replace("{T}", name)
                stmt = f"UPDATE {name} SET {sets} WHERE {_gen_pred(rng)}"
                n_spark = sess.execute_statement(stmt).fetch()["data"][0][0]
                n_duck = duck.execute(stmt).fetchall()[0][0]
                assert n_spark == n_duck, (step, stmt, n_spark, n_duck)
            else:
                stmt = f"DELETE FROM {name} WHERE {_gen_pred(rng)}"
                n_spark = sess.execute_statement(stmt).fetch()["data"][0][0]
                n_duck = duck.execute(stmt).fetchall()[0][0]
                assert n_spark == n_duck, (step, stmt, n_spark, n_duck)
            check(step, stmt)
    finally:
        sess.close()
        duck.close()
