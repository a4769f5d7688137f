"""Randomized differential fuzz of the streaming OVER SQL route:
the same SELECT text is (a) executed through the Engine against a
filesystem STREAMING table — routing through dialect/over_sql.py into
the stateful operators — and (b) run as plain batch Spark SQL over
the same rows. Results must agree row-for-row.

This targets the ROUTER (spec parsing, per-spec ROWS widths, output
column splicing, select-list ordering); the operators' cross-batch
state is separately pinned by tests/test_stateful_differential.py.
Seeded — reproducible.
"""

from __future__ import annotations

import datetime as dt
import random
import time

import pytest

# randomized adversarial layer: excluded from the fast gate via
# `-m 'not fuzz'` (pyproject [tool.pytest.ini_options]); run nightly/full
pytestmark = pytest.mark.fuzz

AGGS = ["SUM", "COUNT", "AVG", "MIN", "MAX"]
WIDTHS = [0, 1, 3, "UNBOUNDED"]


def _gen_specs(rng: random.Random) -> list[str]:
    specs = []
    used = set()
    for i in range(rng.randint(1, 4)):
        agg = rng.choice(AGGS)
        arg = "*" if agg == "COUNT" and rng.random() < 0.3 else "v"
        w = rng.choice(WIDTHS)
        if (agg, arg, w) in used:
            continue
        used.add((agg, arg, w))
        frame = (
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            if w == "UNBOUNDED"
            else f"ROWS BETWEEN {w} PRECEDING AND CURRENT ROW"
        )
        specs.append(
            f"{agg}({arg}) OVER (PARTITION BY k ORDER BY ts {frame}) AS a{i}"
        )
    return specs


@pytest.mark.parametrize("seed", [5, 23])
def test_streaming_over_route_agrees_with_batch_sql(spark, tmp_path, seed):
    from flink_sql_toolkit_spark.engine import Engine

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        k = rng.randrange(3)
        v = None if rng.random() < 0.2 else rng.randint(-100, 100)
        rows.append((k, t0 + dt.timedelta(seconds=i), v))
    df = spark.createDataFrame(rows, "k long, ts timestamp, v long")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/ovf")
    df.createOrReplaceTempView(f"ovf_batch_{seed}")

    engine = Engine(spark)
    sess = engine.open_session(f"over-fuzz-{seed}")
    try:
        sess.execute_statement(
            f"""
            CREATE TABLE ovf_src (k BIGINT, ts TIMESTAMP, v BIGINT)
            WITH ('connector'='filesystem', 'path'='{tmp_path}/ovf',
                  'format'='parquet')
            """
        )
        for trial in range(3):
            specs = _gen_specs(rng)
            select = f"SELECT k, ts, {', '.join(specs)}"
            exp = sorted(
                tuple(r) for r in spark.sql(
                    f"{select} FROM ovf_batch_{seed}"
                ).collect()
            )
            op = sess.execute_statement(f"{select} FROM ovf_src")
            assert op.status == "RUNNING", (seed, trial, specs)
            got, token = [], 0
            deadline = time.time() + 90
            while time.time() < deadline and len(got) < len(exp):
                page = op.fetch(token)
                token = page["nextResultToken"]
                got.extend(tuple(r) for r in page["data"])
                time.sleep(0.3)
            # drain one more page: an over-emitting route (dupes or
            # spurious rows past the expected count) must FAIL the
            # length assert, not hide behind the early loop exit
            time.sleep(1.0)
            page = op.fetch(token)
            got.extend(tuple(r) for r in page["data"])
            op.cancel()
            got = sorted(got)
            assert len(got) == len(exp), (seed, trial, specs, len(got), len(exp))
            for g, e in zip(got, exp):
                for gv, ev in zip(g, e):
                    if isinstance(ev, float):
                        assert gv == pytest.approx(ev), (specs, g, e)
                    else:
                        assert gv == ev, (specs, g, e)
    finally:
        sess.close()
