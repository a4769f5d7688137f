"""Extended fuzz sweeps — the long-running versions of the seeded CI
fuzz suites, for interactive bug hunts between rounds.

The CI files (tests/test_mr_regex_oracle.py, whose generators and
step-runners this driver imports —
tests/test_relational_sql_fuzz.py, tests/test_engine_lifecycle_fuzz.py)
pin a few seeds to keep the suite fast; this driver reruns their
generators over arbitrary seed ranges. Usage:

    python tools/extended_fuzz.py rel  3000 3025   # relational vs DuckDB
    python tools/extended_fuzz.py mr   4242 1      # MR spans vs regex (seed, n_patterns//60)
    python tools/extended_fuzz.py life 500 508     # engine lifecycle

Exit code 1 on any divergence; details on stdout.
"""

from __future__ import annotations

import random
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import duckdb  # noqa: E402

from flink_sql_toolkit_spark.session import build_spark  # noqa: E402
from flink_sql_toolkit_spark.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def sweep_rel(lo: int, hi: int) -> int:
    from flink_sql_toolkit_spark.dialect.rewriter import rewrite
    from test_relational_sql_fuzz import _gen_query, _normalize

    spark = build_spark("extfuzz-rel", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        load_table(spark, SF, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = 0
    for seed in range(lo, hi):
        rng = random.Random(seed)
        for trial in range(12):
            q = _gen_query(rng)
            try:
                exp = _normalize(con.execute(q).fetchall())
                got = _normalize(tuple(r) for r in spark.sql(rewrite(q)).collect())
            except Exception as e:  # noqa: BLE001
                print("REL ERROR", seed, trial, repr(q)[:200],
                      type(e).__name__, str(e)[:120], flush=True)
                bad += 1
                continue
            if got != exp:
                print("REL MISMATCH", seed, trial, repr(q)[:250], flush=True)
                bad += 1
    print(f"REL DONE {(hi - lo) * 12} queries, {bad} bad", flush=True)
    return bad


def sweep_mr(seed: int, rounds: int) -> int:
    from flink_sql_toolkit_spark.operators.match_recognize import (
        _nullable,
        _parse_pattern,
        match_recognize,
    )
    from test_mr_regex_oracle import CHARS, SYMS, _gen_pattern, _oracle_spans

    spark = build_spark("extfuzz-mr", shuffle_partitions=8)
    rng = random.Random(seed)
    rows, strings = [], {}
    for k in range(25):
        s = "".join(rng.choice("abcxx") for _ in range(rng.randint(5, 30)))
        strings[k] = s
        rows.extend((k, i, ch) for i, ch in enumerate(s))
    df = spark.createDataFrame(rows, "k long, seq long, t string").cache()
    df.count()
    tried = bad = 0
    while tried < 60 * rounds:
        pat_sql, pat_rx = _gen_pattern(rng)
        if _nullable(_parse_pattern(pat_sql)):
            continue
        tried += 1
        rx = re.compile(pat_rx)
        skip_past = tried % 2 == 0
        out = match_recognize(
            df, partition_by=["k"], order_by=["seq"], pattern=pat_sql,
            define={s2: f"t = '{CHARS[s2]}'" for s2 in SYMS},
            measures={"mn": "MATCH_NUMBER()"},
            after_match="past_last_row" if skip_past else "to_next_row",
            all_rows=True,
        ).collect()
        got: dict = {}
        for r in out:
            got.setdefault(r.k, {}).setdefault(r.mn, []).append(r.seq)
        for k, s in strings.items():
            exp = _oracle_spans(rx, s, skip_past)
            spans = [(min(v), max(v)) for _, v in sorted(got.get(k, {}).items())]
            if spans != exp:
                print("MR MISMATCH", repr(pat_sql), skip_past, k, s,
                      spans, exp, flush=True)
                bad += 1
    print(f"MR DONE {tried} patterns, {bad} bad", flush=True)
    return bad


def sweep_life(lo: int, hi: int) -> int:
    import shutil
    import tempfile

    from test_engine_lifecycle_fuzz import is_typed_error, run_lifecycle_steps

    _ = is_typed_error  # re-exported for interactive use
    from flink_sql_toolkit_spark.engine import Engine

    spark = build_spark("extfuzz-life", shuffle_partitions=4)
    engine = Engine(spark)
    bad = 0
    for seed in range(lo, hi):
        tmp = tempfile.mkdtemp()
        sess = engine.open_session(f"extfuzz-{seed}")
        try:
            run_lifecycle_steps(
                sess, random.Random(seed), tmp, f"x{seed}", n_steps=70
            )
        except Exception as e:  # noqa: BLE001 — assertion or engine bug
            print(f"LIFE BAD seed={seed}: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            bad += 1
        finally:
            sess.close()
            shutil.rmtree(tmp, ignore_errors=True)
    print(f"LIFE DONE seeds {lo}..{hi}, {bad} bad", flush=True)
    return bad


if __name__ == "__main__":
    mode, a, b = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    bad = {"rel": sweep_rel, "mr": sweep_mr, "life": sweep_life}[mode](a, b)
    sys.exit(1 if bad else 0)
