"""Physical-plan audit for the headline queries.

For each bench.py HEADLINE query this prints the scale-relevant plan
facts the SCALE.md analysis claims:

- **exchanges** — shuffle count (every Exchange is a full network
  repartition at cluster scale; fewer is better, and broadcast joins
  should show as BroadcastExchange, not Exchange),
- **broadcasts** — BroadcastExchange/BroadcastHashJoin count,
- **pushed filters** — whether the parquet scan carries PushedFilters
  (predicate reached the reader),
- **read schema width** — columns actually read per scan vs a full-
  table read (column pruning),
- **codegen** — WholeStageCodegen span count (JVM-compiled pipeline
  stages) and whether any row-at-a-time Python eval appears
  (BatchEvalPython = the slow path; ArrowEvalPython/mapInPandas are
  the sanctioned vectorized escape hatches).

Usage: python tools/plan_audit.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# audit the COLD-path plan — the one a 100 TB run sees: with the
# hot-table cache on, scans read from InMemoryTableScan and the
# pushdown/pruning facts this audit exists to verify disappear
os.environ["SPARK_GRAFT_HOT_CACHE_BUDGET"] = "0"

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE, UNREGISTERED  # noqa: E402
from flink_sql_toolkit_spark.session import build_spark  # noqa: E402


def audit_plan(plan: str) -> dict:
    # An executed AQE plan prints "== Final Plan ==" and
    # "== Initial Plan ==" trees sharing one numbered details section;
    # audit only nodes reachable from the final tree.
    m = re.search(r"== Final Plan ==(.*?)== Initial Plan ==", plan, re.DOTALL)
    tree = m.group(1) if m else plan
    ids = set(re.findall(r"\((\d+)\)", tree))
    blocks = re.split(r"\n\((\d+)\) ", plan)
    # blocks = [prefix, id1, body1, id2, body2, ...]
    details = "".join(
        f"({i}) {body}"
        for i, body in zip(blocks[1::2], blocks[2::2])
        if i in ids
    )
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", details)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "broadcasts": len(re.findall(r"\bBroadcastExchange\b", tree)),
        "scans": len(scans),
        "scan_cols": [len(s.split(",")) if s else 0 for s in scans],
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", details)),
        "codegen_stages": len(set(re.findall(r"\[codegen id : (\d+)\]", details))),
        "slow_python": len(re.findall(r"BatchEvalPython", details)),
        "arrow_python": len(
            re.findall(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", details)
        ),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = build_spark("plan-audit", shuffle_partitions=8)
    queries = {**entrymod.queries(), **UNREGISTERED}
    bad = 0
    for name in HEADLINE:
        if name_filter and name_filter not in name:
            continue
        df = queries[name](spark, sf_dir)
        df.collect()  # run THIS QueryExecution so AQE finalizes + codegen ids appear
        plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")  # noqa: SLF001
        )
        a = audit_plan(plan)
        flags = []
        if a["slow_python"]:
            flags.append("ROW-AT-A-TIME-PYTHON")
            bad += 1
        print(
            f"{name:28s} exchanges={a['exchanges']:2d} broadcasts={a['broadcasts']}"
            f" scans={a['scans']} cols/scan={a['scan_cols']} pushed={a['pushed']}"
            f" codegen={a['codegen_stages']} arrowPy={a['arrow_python']}"
            + (" " + " ".join(flags) if flags else "")
        )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
