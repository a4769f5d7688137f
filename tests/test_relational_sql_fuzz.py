"""Generative relational SQL fuzz: random queries from a shared ANSI
subset run through the engine's dialect path (dialect/rewriter.py →
spark.sql) AND DuckDB over the same parquet — row multisets must be
identical.

The scalar-function batteries gate individual functions; the corpus
gates the reference's own statement sheet. This fuzz covers the axis
neither does: arbitrary COMPOSITIONS (nested expressions in
projections and predicates, CASE, BETWEEN/IN/LIKE, string functions
over computed values, GROUP BY computed keys, HAVING, joins) hitting
the rewriter's regex passes in combinations no hand-written test
enumerates. The grammar avoids known cross-engine divergences:
no float division or AVG (exact outputs only: BIGINT, VARCHAR,
BOOLEAN), non-negative modulo operands, decimal-free arithmetic.
Seeded — reproducible.
"""

from __future__ import annotations

import random

import duckdb
import pytest

# randomized adversarial layer: excluded from the fast gate via
# `-m 'not fuzz'` (pyproject [tool.pytest.ini_options]); run nightly/full
pytestmark = pytest.mark.fuzz

from flink_sql_toolkit_spark.dialect.rewriter import rewrite
from flink_sql_toolkit_spark.tables import load_table

INT_COLS = ["o_orderkey", "o_custkey"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]


def _int_expr(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if depth >= 2 or r < 0.4:
        return rng.choice(INT_COLS)
    if r < 0.55:
        return f"({_int_expr(rng, depth + 1)} + {rng.randint(1, 9)})"
    if r < 0.7:
        return f"({_int_expr(rng, depth + 1)} * {rng.randint(2, 5)})"
    if r < 0.85:
        # both engines truncate non-negative modulo identically
        return f"({_int_expr(rng, depth + 1)} % {rng.randint(3, 97)})"
    return (
        f"(CASE WHEN {_pred(rng, depth + 1)} THEN "
        f"{_int_expr(rng, depth + 1)} ELSE {rng.randint(0, 99)} END)"
    )


def _str_expr(rng: random.Random) -> str:
    c = rng.choice(STR_COLS)
    r = rng.random()
    if r < 0.3:
        return c
    if r < 0.5:
        return f"UPPER({c})"
    if r < 0.7:
        return f"SUBSTRING({c}, 1, {rng.randint(1, 4)})"
    if r < 0.85:
        return f"CONCAT({c}, '-', {rng.choice(STR_COLS)})"
    return f"COALESCE(NULLIF({c}, 'O'), 'none')"


def _pred(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if depth < 2 and r < 0.25:
        op = rng.choice(["AND", "OR"])
        return f"({_pred(rng, depth + 1)} {op} {_pred(rng, depth + 1)})"
    r = rng.random()
    if r < 0.35:
        cmp_op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{_int_expr(rng, 2)} {cmp_op} {rng.randint(0, 40000)}"
    if r < 0.55:
        lo = rng.randint(0, 20000)
        return f"{rng.choice(INT_COLS)} BETWEEN {lo} AND {lo + rng.randint(1, 20000)}"
    if r < 0.75:
        vals = ", ".join(f"'{v}'" for v in rng.sample(
            ["O", "F", "P", "1-URGENT", "2-HIGH", "3-MEDIUM"], k=rng.randint(1, 3)
        ))
        return f"{rng.choice(STR_COLS)} IN ({vals})"
    pat = rng.choice(["O%", "%URGENT", "%-%", "_-%"])
    return f"{rng.choice(STR_COLS)} LIKE '{pat}'"


def _cust_pred(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.4:
        return f"c_nationkey {rng.choice(['<', '>=', '='])} {rng.randint(0, 24)}"
    if r < 0.7:
        seg = rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"])
        return f"c_mktsegment = '{seg}'"
    return f"c_custkey % {rng.randint(2, 7)} = 0"


def _gen_compound(rng: random.Random) -> str:
    """Joins, IN/EXISTS subqueries, and set ops — the composition
    shapes the single-table generator can't reach."""
    r = rng.random()
    if r < 0.3:
        how = rng.choice(["JOIN", "LEFT JOIN"])
        return (
            f"SELECT {_int_expr(rng)} AS c0, UPPER(c_mktsegment) AS c1, "
            f"({_pred(rng, 1)}) AS c2 "
            f"FROM orders {how} customer ON o_custkey = c_custkey "
            f"WHERE {_pred(rng, 1)}"
        )
    if r < 0.5:
        return (
            f"SELECT {_str_expr(rng)} AS c0, COUNT(*) AS a0 FROM orders "
            f"WHERE o_custkey IN (SELECT c_custkey FROM customer "
            f"WHERE {_cust_pred(rng)}) AND {_pred(rng, 1)} GROUP BY 1"
        )
    if r < 0.7:
        neg = "NOT " if rng.random() < 0.5 else ""
        return (
            f"SELECT o_orderkey AS c0, o_orderstatus AS c1 FROM orders "
            f"WHERE {neg}EXISTS (SELECT 1 FROM customer "
            f"WHERE c_custkey = o_custkey AND {_cust_pred(rng)}) "
            f"AND {_pred(rng, 1)}"
        )
    setop = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
    return (
        f"SELECT o_orderstatus AS c0, (o_custkey % 10) AS c1 FROM orders "
        f"WHERE {_pred(rng, 1)} {setop} "
        f"SELECT o_orderpriority, (o_orderkey % 10) FROM orders "
        f"WHERE {_pred(rng, 1)}"
    )


def _gen_query(rng: random.Random) -> str:
    if rng.random() < 0.35:
        return _gen_compound(rng)
    where = f"WHERE {_pred(rng)}"
    if rng.random() < 0.45:
        key = _str_expr(rng) if rng.random() < 0.6 else f"({_int_expr(rng)} % 10)"
        aggs = []
        for i in range(rng.randint(1, 3)):
            fn = rng.choice(["COUNT(*)", "SUM", "MIN", "MAX", "COUNT"])
            if fn == "COUNT(*)":
                aggs.append(f"COUNT(*) AS a{i}")
            elif fn in ("SUM", "COUNT"):
                aggs.append(f"{fn}({_int_expr(rng)}) AS a{i}")
            else:
                src = _int_expr(rng) if rng.random() < 0.5 else _str_expr(rng)
                aggs.append(f"{fn}({src}) AS a{i}")
        having = (
            f"HAVING COUNT(*) > {rng.randint(0, 3)}"
            if rng.random() < 0.4 else ""
        )
        return (
            f"SELECT {key} AS g, {', '.join(aggs)} FROM orders "
            f"{where} GROUP BY {key} {having}"
        )
    items = [f"{_int_expr(rng)} AS c0", f"{_str_expr(rng)} AS c1"]
    if rng.random() < 0.5:
        items.append(f"({_pred(rng, 1)}) AS c2")
    return f"SELECT {', '.join(items)} FROM orders {where}"


def _normalize(rows) -> list[tuple]:
    return sorted(
        tuple("NULL" if v is None else str(v) for v in r) for r in rows
    )


@pytest.mark.parametrize("seed", [3, 59, 271])
def test_random_relational_sql_agrees_with_duckdb(spark, sf_dir, seed):
    rng = random.Random(seed)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    for trial in range(12):
        q = _gen_query(rng)
        exp = _normalize(con.execute(q).fetchall())
        got = _normalize(
            tuple(r) for r in spark.sql(rewrite(q)).collect()
        )
        assert got == exp, (seed, trial, q, got[:3], exp[:3],
                            len(got), len(exp))


def _dialect_pred(rng: random.Random) -> tuple[str, str]:
    """(engine_pred, oracle_pred) pairs: Flink-dialect shapes through
    the rewriter vs their DuckDB equivalents — exercises the
    ILIKE/SIMILAR TO/||/TRY_CAST/LENGTH translations under random
    composition, not just the battery's fixed rows. SIMILAR TO needs
    its own oracle spelling: SQL/Flink/Calcite give %/_ wildcard
    meaning inside the pattern (the rewriter translates % -> .*,
    _ -> .), while DuckDB's SIMILAR TO is a plain anchored regex with
    a LITERAL percent — regexp_full_match over the same translation
    states the standard semantics in DuckDB terms."""
    r = rng.random()
    col = rng.choice(STR_COLS)
    if r < 0.25:
        pat = rng.choice(["o%", "%uRgEnT", "%-%", "f"])
        p = f"{col} ILIKE '{pat}'"
        return p, p
    if r < 0.5:
        neg = "NOT " if rng.random() < 0.3 else ""
        pat = rng.choice(["(O|F)", "[0-9]-%", "%HIGH", "_-%", "O|P"])
        rx = pat.replace("%", ".*").replace("_", ".")
        return (
            f"{col} {neg}SIMILAR TO '{pat}'",
            f"{neg}regexp_full_match({col}, '{rx}')",
        )
    if r < 0.7:
        p = (
            f"LENGTH({col} || '{rng.choice(['x', '-suffix', ''])}')"
            f" > {rng.randint(1, 12)}"
        )
        return p, p
    if r < 0.85:
        p = (
            f"TRY_CAST(SUBSTRING({col}, 1, 1) AS BIGINT) IS "
            f"{rng.choice(['NULL', 'NOT NULL'])}"
        )
        return p, p
    p = f"POSITION('{rng.choice(['O', '-', 'URGENT'])}' IN {col}) > 0"
    return p, p


@pytest.mark.parametrize("seed", [7, 99])
def test_dialect_constructs_fuzz_agrees_with_duckdb(spark, sf_dir, seed):
    rng = random.Random(seed)
    con = duckdb.connect()
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    for trial in range(15):
        pairs = [_dialect_pred(rng) for _ in range(rng.randint(1, 2))]
        preds_e = " AND ".join(p[0] for p in pairs)
        preds_o = " AND ".join(p[1] for p in pairs)
        item = rng.choice([
            "o_orderstatus || '-' || o_orderpriority AS c0",
            "TRY_CAST(o_orderpriority AS BIGINT) AS c0",
            "SUBSTRING(o_orderpriority FROM 1 FOR 3) AS c0",
            "LENGTH(o_orderpriority) AS c0",
        ])
        sel = f"SELECT o_orderkey AS k, {item} FROM orders WHERE "
        exp = _normalize(con.execute(sel + preds_o).fetchall())
        got = _normalize(
            tuple(r) for r in spark.sql(rewrite(sel + preds_e)).collect()
        )
        assert got == exp, (seed, trial, preds_e, len(got), len(exp))
