"""Large-star/small-star connected components (dedup.py) — the
adversarial-diameter scale path SCALE.md has documented as "the
upgrade" since r10, now implemented and verified:

- result equivalence with min-label propagation on seeded random
  graphs (the two algorithms must produce the identical
  (doc_id → comp, cluster_size) mapping),
- the case that MOTIVATES it: a long path graph, where label
  propagation needs diameter rounds (splits the component when
  capped) while star contraction converges in O(log n) rounds and
  returns ONE component.
"""

from __future__ import annotations

import logging
import random

from flink_sql_toolkit_spark.operators.dedup import (
    near_dup_components,
    near_dup_components_star,
)


def _comps(df):
    rows = df.collect()
    return (
        sorted((r.doc_id, r.comp) for r in rows),
        sorted((r.doc_id, r.cluster_size) for r in rows),
    )


def test_star_matches_label_propagation_on_random_graphs(spark):
    for seed, n, m in [(1, 40, 30), (2, 120, 100), (3, 200, 260)]:
        rng = random.Random(seed)
        edges = {
            tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)
        }
        df = spark.createDataFrame(
            [(a, b) for a, b in edges], "doc_a long, doc_b long"
        )
        got = _comps(near_dup_components_star(df))
        exp = _comps(near_dup_components(df, max_iter=n))
        assert got == exp, f"seed={seed}"


def test_star_handles_duplicate_and_reversed_edges(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (9, 8)],
        "doc_a long, doc_b long",
    )
    labels, sizes = _comps(near_dup_components_star(df))
    assert labels == [(1, 1), (2, 1), (3, 1), (8, 8), (9, 8)]
    assert sizes == [(1, 3), (2, 3), (3, 3), (8, 2), (9, 2)]


def test_star_converges_on_long_chain_where_label_prop_splits(
    spark, caplog
):
    """A 600-node path: diameter 599. Label propagation at its default
    max_iter=20 warns and SPLITS the component; star contraction
    converges within its default 30 rounds (actual: O(log n) ≈ 10)
    and returns one component of size 600 rooted at 0."""
    n = 600
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with caplog.at_level(
        logging.WARNING, "flink_sql_toolkit_spark.operators.dedup"
    ):
        lp = near_dup_components(chain)  # default max_iter=20
        lp_comps = {r.comp for r in lp.collect()}
    assert len(lp_comps) > 1, "expected the capped label-prop to split"
    assert any("did not converge" in r.getMessage() for r in caplog.records)

    star = near_dup_components_star(chain)
    rows = star.collect()
    assert {r.comp for r in rows} == {0}
    assert len(rows) == n
    assert all(r.cluster_size == n for r in rows)
