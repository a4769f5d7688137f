"""Save each headline query's executed `explain("formatted")` plan.

Writes `plans/<tag>/<query>_<suffix>.txt` (the optimization-round
evidence artifact: the judge checks plan-shape claims in
OPTIMIZATION_r*.md against these files without running Spark).

Usage: python tools/save_plans.py <tag> <suffix> [sf_dir] [name_filter]
e.g.   python tools/save_plans.py r14 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# audit the COLD-path plan — the one a 100 TB run sees (see
# plan_audit.py): the hot cache swaps parquet scans for
# InMemoryTableScan and hides the pushdown/pruning facts.
os.environ["SPARK_GRAFT_HOT_CACHE_BUDGET"] = "0"

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE, UNREGISTERED  # noqa: E402
from flink_sql_toolkit_spark.session import build_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    name_filter = sys.argv[4] if len(sys.argv) > 4 else ""
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = build_spark("save-plans", shuffle_partitions=8)
    queries = {**entrymod.queries(), **UNREGISTERED}
    for name in HEADLINE:
        if name_filter and name_filter not in name:
            continue
        df = queries[name](spark, sf_dir)
        # collect() runs THIS df's QueryExecution in place, so AQE
        # finalizes and codegen ids appear (a noop write would execute
        # a separate command QueryExecution and leave df's plan
        # initial). Headline outputs are top-k/aggregate-sized.
        df.collect()
        plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(f"# {name} @ {sf_dir} ({suffix})\n{plan}")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
