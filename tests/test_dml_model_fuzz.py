"""Model-based randomized test for the copy-on-write DML layer.

The r11 DML hardening was review-driven (22 findings); this is its
verification counterpart: a random sequence of INSERT / UPDATE /
DELETE statements runs through the engine against a filesystem
parquet table while the same operations are applied to an in-memory
Python model — after EVERY statement the table contents must equal
the model, and the statement's affected-rows count must match the
model's. Predicates mix id ranges, tag equality, and arithmetic on
the value column; SET clauses mix constants and self-referential
expressions (amt = amt * 2 + 1). Runs on both a flat table and a
PARTITIONED BY (tag) table (the partition-pruned COW path).

Seeded — reproducible.
"""

from __future__ import annotations

import random

import pytest

# randomized adversarial layer: excluded from the fast gate via
# `-m 'not fuzz'` (pyproject [tool.pytest.ini_options]); run nightly/full
pytestmark = pytest.mark.fuzz

from flink_sql_toolkit_spark.engine import Engine


def _apply_update(model, pred, sets):
    n = 0
    for row in model:
        if pred(row):
            n += 1
            for col, fn in sets.items():
                row[col] = fn(row)
    return n


def _apply_delete(model, pred):
    before = len(model)
    model[:] = [r for r in model if not pred(r)]
    return before - len(model)


def _gen_pred(rng: random.Random):
    r = rng.random()
    if r < 0.35:
        lo = rng.randint(0, 40)
        hi = lo + rng.randint(0, 25)
        return (
            f"id BETWEEN {lo} AND {hi}",
            lambda row, lo=lo, hi=hi: lo <= row["id"] <= hi,
        )
    if r < 0.6:
        tag = rng.choice(["a", "b", "c", "z"])
        return (f"tag = '{tag}'", lambda row, tag=tag: row["tag"] == tag)
    if r < 0.8:
        x = rng.randint(0, 80)
        return (f"amt > {x}", lambda row, x=x: row["amt"] > x)
    tag = rng.choice(["a", "b"])
    x = rng.randint(10, 60)
    return (
        f"tag = '{tag}' AND id < {x}",
        lambda row, tag=tag, x=x: row["tag"] == tag and row["id"] < x,
    )


def _gen_sets(rng: random.Random):
    r = rng.random()
    if r < 0.4:
        v = float(rng.randint(0, 99))
        return f"amt = {v}", {"amt": lambda row, v=v: v}
    if r < 0.7:
        m, a = rng.randint(2, 4), rng.randint(0, 9)
        return (
            f"amt = amt * {m} + {a}",
            {"amt": lambda row, m=m, a=a: row["amt"] * m + a},
        )
    tag = rng.choice(["x", "y"])
    v = float(rng.randint(0, 99))
    return (
        f"tag = '{tag}', amt = {v}",
        {"tag": lambda row, tag=tag: tag, "amt": lambda row, v=v: v},
    )


@pytest.mark.parametrize("seed,partitioned", [(5, False), (42, True)])
def test_random_dml_sequence_matches_model(spark, tmp_path, seed, partitioned):
    rng = random.Random(seed)
    engine = Engine(spark)
    sess = engine.open_session(f"dml-model-{seed}")
    name = f"dmf_{seed}"
    part = "PARTITIONED BY (tag) " if partitioned else ""
    try:
        # batch mode: streaming is the session default (Flink parity),
        # and a streaming SELECT would page NOT_READY forever here
        sess.execute_statement("SET 'execution.runtime-mode'='batch'")
        sess.execute_statement(
            f"CREATE TABLE {name} (id BIGINT, tag STRING, amt DOUBLE) "
            f"{part}WITH ('connector'='filesystem', "
            f"'path'='{tmp_path}/{name}', 'format'='parquet')"
        )
        model: list[dict] = []
        next_id = 0

        def insert(n_rows: int):
            nonlocal next_id
            rows = [
                {
                    "id": next_id + i,
                    "tag": rng.choice(["a", "b", "c"]),
                    "amt": float(rng.randint(0, 99)),
                }
                for i in range(n_rows)
            ]
            next_id += n_rows
            values = ", ".join(
                f"({r['id']}, '{r['tag']}', CAST({r['amt']} AS DOUBLE))"
                for r in rows
            )
            sess.execute_statement(f"INSERT INTO {name} VALUES {values}")
            model.extend(rows)

        def merge(step: int):
            """MERGE with delete/update/insert arms against a VALUES
            subquery source (unique join keys — standard SQL rejects
            multi-match cardinality, which dml.py checks separately).
            next_id jumps past any inserted id so insert() never
            creates a duplicate target key (the model's by_id map and
            SQL MERGE both assume unique target ids here)."""
            nonlocal next_id
            ids = rng.sample(range(max(next_id, 1) + 10), rng.randint(1, 5))
            next_id = max(next_id, max(ids) + 1)
            src = [(i, float(rng.randint(-20, 99))) for i in ids]
            gate = rng.randint(0, 30)
            values = " UNION ALL ".join(
                f"SELECT {i} AS id, CAST({a} AS DOUBLE) AS amt"
                for i, a in src
            )
            op = sess.execute_statement(f"""
                MERGE INTO {name} tgt USING ({values}) s ON tgt.id = s.id
                WHEN MATCHED AND s.amt < {gate} THEN DELETE
                WHEN MATCHED THEN UPDATE SET amt = s.amt
                WHEN NOT MATCHED THEN INSERT (id, tag, amt)
                    VALUES (s.id, 'm', s.amt)
            """)
            by_id = {row["id"]: row for row in model}
            n = 0
            for i, a in src:
                row = by_id.get(i)
                if row is not None:
                    n += 1
                    if a < gate:
                        model.remove(row)
                    else:
                        row["amt"] = a
                else:
                    n += 1
                    model.append({"id": i, "tag": "m", "amt": a})
            assert op.fetch()["data"] == [[n]], (step, src, gate)

        insert(20)
        for _step in range(14):
            r = rng.random()
            if r < 0.2:
                insert(rng.randint(1, 6))
            elif r < 0.35:
                merge(_step)
            elif r < 0.65:
                pred_sql, pred = _gen_pred(rng)
                set_sql, sets = _gen_sets(rng)
                op = sess.execute_statement(
                    f"UPDATE {name} SET {set_sql} WHERE {pred_sql}"
                )
                n_model = _apply_update(model, pred, sets)
                assert op.fetch()["data"] == [[n_model]], (
                    _step, pred_sql, set_sql
                )
            else:
                pred_sql, pred = _gen_pred(rng)
                op = sess.execute_statement(
                    f"DELETE FROM {name} WHERE {pred_sql}"
                )
                n_model = _apply_delete(model, pred)
                assert op.fetch()["data"] == [[n_model]], (_step, pred_sql)
            got = sorted(
                tuple(r2)
                for r2 in sess.execute_statement(
                    f"SELECT id, tag, amt FROM {name}"
                ).fetch()["data"]
            )
            exp = sorted((r2["id"], r2["tag"], r2["amt"]) for r2 in model)
            assert got == exp, (_step, len(got), len(exp))
    finally:
        sess.close()
