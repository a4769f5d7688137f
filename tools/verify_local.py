"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists,
the oracle SQL on DuckDB over the same parquet tables; compares
row-count, column names, and an order-insensitive value hash the way
`__spark_entry__.py` documents. Use while iterating:

    python tools/verify_local.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from flink_sql_toolkit_spark.session import build_spark  # noqa: E402
from flink_sql_toolkit_spark.tables import TPCH_TABLES  # noqa: E402


# --approx (scale rehearsal): double sums over 10^6+ rows diverge
# from DuckDB by 1 ulp from accumulation ORDER alone, so exact-repr
# float hashing is the wrong bar above the driver's sf0.01 gate;
# 12 significant digits ignores ulp noise while still catching any
# real semantic difference. Default stays driver-strict.
APPROX_FLOATS = False


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if APPROX_FLOATS:
            return f"{v:.12g}"
        # Deliberately NOT collapsing 437.0 -> "437": the driver's
        # pandas-based hasher distinguishes int from float columns,
        # and round 1's func_math red row was exactly this (Spark
        # BIGINT ceil/floor vs DuckDB DOUBLE). Stay as strict as
        # the real gate.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def row_hashes(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(normalize_cell(row[i]) for i in order) for row in rows
    )


def main() -> int:
    global APPROX_FLOATS
    argv = [a for a in sys.argv[1:] if a != "--approx"]
    APPROX_FLOATS = "--approx" in sys.argv[1:]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    name_filter = argv[1] if len(argv) > 1 else ""
    spark = build_spark("verify_local")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        # Spark-written tables are DIRECTORIES of part files (the
        # scale-rehearsal fixtures); the driver's are single files —
        # DuckDB needs a glob for the former
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in sorted(qs.items()):
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh = row_hashes(scols, [[r[c] for c in scols] for r in srows])
            dh = row_hashes(dcols, drows)
            if sh != dh:
                diffs = [
                    (a, b) for a, b in zip(sh, dh) if a != b
                ][:3]
                problems.append(f"values differ, e.g. {diffs}")
        if problems:
            n_fail += 1
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(p[:400] for p in problems)}")
        else:
            n_pass += 1
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
