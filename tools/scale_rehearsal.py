"""Scale rehearsal (VERDICT r11 ask #1): run the headline + pipeline
operators at 1×/10×/20× the bench scale and PROVE the 100-TB plan
claims empirically instead of by sf0.1 plan shape:

- the scaling CURVE per query (wall-time at sf0.1 → sf1 → sf2): a
  scan-bound query should scale ~linearly; a quadratic pair
  expansion or a collect-bound driver loop shows up as super-linear,
- plan INVARIANTS across scale: explicitly-broadcast dims must stay
  BroadcastExchange as stats grow (not flip to shuffle-merge),
  exchange counts must not grow with data size, no row-at-a-time
  Python may appear at any scale,
- bucket caps ENGAGE: the sf1/sf2 documents corpus is built so every
  doc sits in a K-member near-dup cluster (tools/make_scale_fixtures)
  — the LSH template-cluster side output must be non-empty and the
  pair expansion must still complete,
- connected components CONVERGE in the same round count (cluster
  diameter, not corpus size, drives rounds),
- engine-JVM memory: heap-used growth across the full run is
  recorded; a driver-side collect loop would blow it up with scale.

Inputs come from tools/make_scale_fixtures.py (.scale/sf1, .scale/sf2).
Usage: python tools/scale_rehearsal.py [--quick] [name_filter]
Writes SCALE_REHEARSAL.json; the findings table lives in SCALE.md
§"Scale rehearsal".
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# cold-path plans, as in plan_audit: the hot cache hides the scans
os.environ["SPARK_GRAFT_HOT_CACHE_BUDGET"] = "0"

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import HEADLINE, UNREGISTERED  # noqa: E402
from tools.plan_audit import audit_plan  # noqa: E402
from flink_sql_toolkit_spark.session import build_spark  # noqa: E402

SF_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", str(REPO / ".scale" / "sf1")),
    ("sf2", str(REPO / ".scale" / "sf2")),
]

# queries whose work is bounded by a constant (top-k serving, funnel
# over a fixed user sample) may scale sub-linearly; everything else
# should be ~linear in rows — flag anything growing worse than
# SUPERLINEAR_TOL × the data ratio
SUPERLINEAR_TOL = 2.0


def heap_used_mb(spark) -> float:
    rt = spark._jvm.java.lang.Runtime.getRuntime()  # noqa: SLF001
    return round((rt.totalMemory() - rt.freeMemory()) / 1e6, 1)


def run_query(spark, fn, sf_dir: str) -> dict:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    secs = round(time.perf_counter() - t0, 2)
    plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return {"secs": secs, "rows": n, **audit_plan(plan)}


def components_rounds(spark, sf_dir: str) -> dict:
    """Instrumented re-run of the near-dup components loop: round
    count to convergence must track cluster DIAMETER, not corpus
    size."""
    from flink_sql_toolkit_spark.operators import dedup

    edges = dedup.dedup_minhash_lsh(spark, sf_dir)
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
        .localCheckpoint()
    )
    prev, rounds = None, 0
    for _ in range(20):
        rounds += 1
        neigh = sym.join(
            labels.withColumnRenamed("doc_id", "src"), "src"
        ).select(F.col("dst").alias("doc_id"), "comp")
        labels = (
            labels.union(neigh)
            .groupBy("doc_id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        cur = labels.agg(F.sum("comp")).collect()[0][0]
        if cur == prev:
            break
        prev = cur
    n_comp = labels.select("comp").distinct().count()
    return {"rounds": rounds, "components": n_comp, "vertices": labels.count()}


def lsh_cap_engagement(spark, sf_dir: str) -> dict:
    from flink_sql_toolkit_spark.operators import dedup

    _ok, flagged = dedup._lsh_grouped_buckets(spark, sf_dir)  # noqa: SLF001
    rows = flagged.select("n_docs").collect()
    return {
        "flagged_buckets": len(rows),
        "max_bucket": max((r.n_docs for r in rows), default=0),
    }


def ivf_recall_vs_nprobe(spark, sf_dir: str) -> dict:
    """The r14 probe-depth panel: recall@k vs brute-force truth at
    nprobe ∈ {1,2,4,8}, with wall time and the scanned corpus
    fraction (~nprobe/k). This is the recall/speed trade the k≈√N
    sizing (r13) left without a measured point — recall must rise
    monotonically with nprobe (candidates are prefix-supersets) while
    cost grows ~linearly in the scanned fraction."""
    from flink_sql_toolkit_spark.operators import similarity as sim

    truth = {
        (r.query_id, r.neighbor_id)
        for r in sim.sim_topk_bruteforce(spark, sf_dir).collect()
    }
    k = sim._ivf_k(spark, sf_dir)  # noqa: SLF001
    out: dict = {"k": k}
    for nprobe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        approx = {
            (r.query_id, r.neighbor_id)
            for r in sim.sim_ivf_topk(spark, sf_dir, nprobe=nprobe).collect()
        }
        out[f"nprobe{nprobe}"] = {
            "recall": round(len(truth & approx) / len(truth), 3),
            "secs": round(time.perf_counter() - t0, 2),
            "scanned_frac": round(min(nprobe, k) / k, 3),
        }
    return out


def main() -> int:
    quick = "--quick" in sys.argv
    name_filter = next(
        (a for a in sys.argv[1:] if not a.startswith("--")), ""
    )
    queries = {**entrymod.queries(), **UNREGISTERED}
    names = [n for n in HEADLINE if name_filter in n]
    report: dict = {"queries": {}, "aux": {}, "heap_mb": {}}
    spark = build_spark("scale-rehearsal", shuffle_partitions=32)

    # full warm-up pass before ANY timed run (VERDICT r12 "What's
    # wrong #2": the first SF column paid JVM/codegen/parquet-footer
    # warm-up, overstating sf0.1 by 5-10× — a .count() alone didn't
    # warm the aggregate codegen paths). Run a representative JVM
    # aggregation AND an Arrow/Python-bearing query to temperature,
    # results discarded.
    first_dir = SF_DIRS[0][1]
    if os.path.isdir(first_dir):
        for wname in ("q1_pricing_summary", "sim_lsh_bucketed"):
            queries[wname](spark, first_dir).collect()

    for sf_name, sf_dir in SF_DIRS:
        if not os.path.isdir(sf_dir):
            print(f"!! {sf_name} fixtures missing ({sf_dir}) — run "
                  "tools/make_scale_fixtures.py first")
            return 2
        # per-SF scan warm-up (footer/file-listing caches)
        queries["q1_pricing_summary"](spark, sf_dir).count()
        h0 = heap_used_mb(spark)
        for name in names:
            r = run_query(spark, queries[name], sf_dir)
            report["queries"].setdefault(name, {})[sf_name] = r
            print(
                f"{sf_name:6s} {name:28s} {r['secs']:7.2f}s rows={r['rows']:>9,} "
                f"bcast={r['broadcasts']} exch={r['exchanges']} "
                f"slowPy={r['slow_python']}"
            )
        if not quick and not name_filter:
            report["aux"].setdefault("components", {})[sf_name] = (
                components_rounds(spark, sf_dir)
            )
            report["aux"].setdefault("lsh_caps", {})[sf_name] = (
                lsh_cap_engagement(spark, sf_dir)
            )
            report["aux"].setdefault("ivf_recall", {})[sf_name] = (
                ivf_recall_vs_nprobe(spark, sf_dir)
            )
            print(f"{sf_name:6s} aux: {report['aux']['components'][sf_name]} "
                  f"{report['aux']['lsh_caps'][sf_name]} "
                  f"ivf_recall={report['aux']['ivf_recall'][sf_name]}")
        spark._jvm.java.lang.System.gc()  # noqa: SLF001
        report["heap_mb"][sf_name] = {"start": h0, "end": heap_used_mb(spark)}

    # ---- invariants ----
    # Two kinds of broadcast in these plans: EXPLICIT F.broadcast()
    # hints on constant-ratio dims (must hold at every scale — Spark
    # honors hints regardless of stats) and AQE's opportunistic
    # runtime broadcasts of small intermediate results (post-HAVING
    # aggregates, filtered orders). The LATTER flipping to
    # shuffle-merge as the intermediate grows is AQE picking the
    # correct 100-TB plan — q18's post-HAVING totals at true scale
    # are ~450M rows, rightly a co-partitioned SMJ reusing the agg's
    # orderkey exchange — so the invariant pins only the explicit
    # hints, and allows exchange growth exactly where an
    # auto-broadcast flipped (≤ 2 added exchanges per flip).
    import inspect

    explicit_bcast: dict[str, int] = {}
    for name in report["queries"]:
        try:
            explicit_bcast[name] = inspect.getsource(queries[name]).count(
                "F.broadcast("
            )
        except (OSError, TypeError):
            explicit_bcast[name] = 0
    report["explicit_broadcast_hints"] = explicit_bcast

    problems: list[str] = []
    for name, per_sf in report["queries"].items():
        base = per_sf.get("sf0.1")
        for sf_name, ratio in (("sf1", 10.0), ("sf2", 20.0)):
            cur = per_sf.get(sf_name)
            if not base or not cur:
                continue
            if cur["broadcasts"] < explicit_bcast.get(name, 0):
                problems.append(
                    f"{name}@{sf_name}: only {cur['broadcasts']} broadcasts "
                    f"for {explicit_bcast[name]} explicit dim hints — a "
                    "hinted dim join flipped to shuffle"
                )
            if cur["slow_python"]:
                problems.append(f"{name}@{sf_name}: row-at-a-time Python")
            flips = max(0, base["broadcasts"] - cur["broadcasts"])
            if cur["exchanges"] > base["exchanges"] + 2 * flips:
                problems.append(
                    f"{name}@{sf_name}: exchange count grew "
                    f"{base['exchanges']}→{cur['exchanges']} beyond the "
                    f"{flips} auto-broadcast flip(s) — a new shuffle "
                    "appeared with scale"
                )
            if (
                base["secs"] >= 0.5
                and cur["secs"] > base["secs"] * ratio * SUPERLINEAR_TOL
            ):
                problems.append(
                    f"{name}@{sf_name}: super-linear "
                    f"{base['secs']}s→{cur['secs']}s (> {ratio}×"
                    f"{SUPERLINEAR_TOL} tolerance)"
                )
    comp = report["aux"].get("components", {})
    if comp:
        rounds = {sf: c["rounds"] for sf, c in comp.items()}
        if max(rounds.values()) > min(rounds.values()) + 1:
            problems.append(f"components rounds diverge with scale: {rounds}")
    for sf, rec in report["aux"].get("ivf_recall", {}).items():
        seq = [rec[f"nprobe{p}"]["recall"] for p in (1, 2, 4, 8)]
        if any(b < a for a, b in zip(seq, seq[1:])):
            problems.append(
                f"ivf recall not monotone in nprobe at {sf}: {seq} — "
                "the probe lists are prefix-supersets, so this means "
                "the assignment kernel and serve path disagree"
            )
    caps = report["aux"].get("lsh_caps", {})
    if caps and caps.get("sf1", {}).get("flagged_buckets", 0) == 0:
        problems.append(
            "LSH bucket cap never engaged at sf1 despite the K-member "
            "near-dup corpus — cap path untested at scale"
        )
    report["problems"] = problems

    out = REPO / "SCALE_REHEARSAL.json"
    out.write_text(json.dumps(report, indent=1))
    print(f"\nwrote {out}")
    if problems:
        print("PROBLEMS:")
        for p in problems:
            print("  -", p)
        return 1
    print("all scale invariants hold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
