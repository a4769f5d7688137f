"""Randomized end-to-end differential tests: the streaming stateful
operators (applyInPandasWithState, state crossing micro-batch
boundaries) must agree with Spark's BATCH window engine on the same
rows. Seeded (no ambient randomness — reproducible), rows arrive in
ORDER BY order across micro-batches (the operators' documented
arrival-order contract), interleaved across keys so per-key state is
exercised by every split.

This is the streaming analogue of the oracle gate: the batch plan is
the oracle.
"""

from __future__ import annotations

from fastwrite import write_rows

import random

import pytest

# randomized adversarial layer: excluded from the fast gate via
# `-m 'not fuzz'` (pyproject [tool.pytest.ini_options]); run nightly/full
pytestmark = pytest.mark.fuzz
from pyspark.sql import Window
from pyspark.sql import functions as F


def _write_ordered_batches(spark, path, rows, schema, n_batches: int):
    """Split rows (already in global arrival order) into n contiguous
    files — one micro-batch each with maxFilesPerTrigger=1."""
    per = max(1, (len(rows) + n_batches - 1) // n_batches)
    for i in range(n_batches):
        chunk = rows[i * per:(i + 1) * per]
        if not chunk:
            break
        write_rows(f"{path}/in/b{i:02d}", chunk, schema)


def _run_stream(spark, tmp_path, schema, make_op, name: str):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in/*")
    )
    q = (
        make_op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def _gen_rows(seed: int, n: int, n_keys: int, null_rate: float = 0.15):
    """(k, seq, v) rows in global seq order; v has NULL slots and
    magnitudes that matter for exactness."""
    rng = random.Random(seed)
    rows = []
    for seq in range(n):
        k = rng.randrange(n_keys)
        v = None if rng.random() < null_rate else rng.randint(-1000, 1000)
        rows.append((k, seq, v))
    return rows


@pytest.mark.parametrize("seed", [11, 47])
def test_over_rows_agrees_with_batch_window(spark, tmp_path, seed):
    """Bounded + unbounded ROWS frames, sum/cnt/avg/min/max/first/last
    over randomized keys/NULLs, state crossing 5 micro-batches, vs the
    batch window plan (ignorenulls first/last = the Flink aggregate
    semantics the operator implements)."""
    from flink_sql_toolkit_spark.streaming.stateful import (
        UNBOUNDED,
        streaming_over_rows,
    )

    rows = _gen_rows(seed, 400, 5)
    schema = "k long, seq long, v long"
    _write_ordered_batches(spark, tmp_path, rows, schema, 5)
    specs = [
        ("sum", "v", 3), ("cnt", "v", 3), ("avg", "v", 3),
        ("min", "v", 3), ("max", "v", 3),
        ("first", "v", 3), ("last", "v", 3),
        ("cnt", None, 3),
        ("sum", "v", UNBOUNDED), ("min", "v", UNBOUNDED),
        ("first", "v", UNBOUNDED), ("cnt", None, UNBOUNDED),
    ]
    got_df = _run_stream(
        spark, tmp_path, schema,
        lambda s: streaming_over_rows(
            s, partition_by=["k"], order_by=["seq"], value_col=None,
            n_preceding=3, agg_specs=specs,
        ),
        f"diff_rows_{seed}",
    )
    got = {(r.k, r.seq): r.asDict() for r in got_df.collect()}

    batch = spark.createDataFrame(rows, schema)
    w3 = Window.partitionBy("k").orderBy("seq").rowsBetween(-3, 0)
    wu = Window.partitionBy("k").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, 0
    )
    exp_df = batch.select(
        "k", "seq",
        # names follow resolve_spec_names: width-qualified ONLY when
        # the same (agg, col) appears with several widths
        F.sum("v").over(w3).alias("v_sum_3p"),
        F.count("v").over(w3).alias("v_cnt"),
        F.avg("v").over(w3).alias("v_avg"),
        F.min("v").over(w3).alias("v_min_3p"),
        F.max("v").over(w3).alias("v_max"),
        F.first("v", ignorenulls=True).over(w3).alias("v_first_3p"),
        F.last("v", ignorenulls=True).over(w3).alias("v_last"),
        F.count(F.lit(1)).over(w3).alias("star_cnt_3p"),
        F.sum("v").over(wu).alias("v_sum_unb"),
        F.min("v").over(wu).alias("v_min_unb"),
        F.first("v", ignorenulls=True).over(wu).alias("v_first_unb"),
        F.count(F.lit(1)).over(wu).alias("star_cnt_unb"),
    )
    exp = {(r.k, r.seq): r.asDict() for r in exp_df.collect()}
    assert set(got) == set(exp)
    for key in exp:
        for col, ev in exp[key].items():
            gv = got[key][col]
            if isinstance(ev, float):
                assert gv == pytest.approx(ev), (key, col, gv, ev)
            else:
                assert gv == ev, (key, col, gv, ev)


@pytest.mark.parametrize("seed", [7])
def test_rank_lag_nth_agree_with_batch_window(spark, tmp_path, seed):
    """ROW_NUMBER/RANK/DENSE_RANK (tie-heavy order values), LAG(v, 2)
    and NTH_VALUE(v, 3) across 4 micro-batches vs the batch plan.
    Order values repeat heavily so the rank-family tie handling (peer
    groups spanning batch boundaries) is actually exercised."""
    from flink_sql_toolkit_spark.streaming.stateful import (
        streaming_lag,
        streaming_nth_value,
        streaming_rank,
    )

    rng = random.Random(seed)
    rows, ov = [], 0
    for seq in range(300):
        k = rng.randrange(4)
        # non-decreasing per arrival with many ties (valid rank input)
        if rng.random() < 0.4:
            ov += rng.randint(1, 3)
        v = None if rng.random() < 0.2 else rng.randint(0, 99)
        rows.append((k, seq, ov, v))
    schema = "k long, seq long, ov long, v long"
    _write_ordered_batches(spark, tmp_path, rows, schema, 4)

    got_rank = {
        (r.k, r.seq): (r.ov_rownum, r.ov_rnk, r.ov_drnk)
        for r in _run_stream(
            spark, tmp_path, schema,
            lambda s: streaming_rank(s, ["k"], ["ov"]),
            f"diff_rank_{seed}",
        ).collect()
    }
    got_lag = {
        (r.k, r.seq): r.v_lag
        for r in _run_stream(
            spark, tmp_path, schema,
            lambda s: streaming_lag(s, ["k"], ["seq"], "v", offset=2),
            f"diff_lag_{seed}",
        ).collect()
    }
    got_nth = {
        (r.k, r.seq): r.v_nth3
        for r in _run_stream(
            spark, tmp_path, schema,
            lambda s: streaming_nth_value(s, ["k"], ["seq"], "v", n=3),
            f"diff_nth_{seed}",
        ).collect()
    }

    batch = spark.createDataFrame(rows, schema)
    # the streaming operator ranks in arrival order; seq is the
    # arrival tiebreak, so the batch oracle orders by (ov, seq)
    wr = Window.partitionBy("k").orderBy("ov", "seq")
    wo = Window.partitionBy("k").orderBy("ov")
    ws = Window.partitionBy("k").orderBy("seq")
    exp_df = batch.select(
        "k", "seq",
        F.row_number().over(wr).alias("rn"),
        F.rank().over(wo).alias("rnk"),
        F.dense_rank().over(wo).alias("drnk"),
        F.lag("v", 2).over(ws).alias("lag2"),
        F.nth_value("v", 3).over(
            ws.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("nth3"),
    )
    for r in exp_df.collect():
        key = (r.k, r.seq)
        assert got_rank[key] == (r.rn, r.rnk, r.drnk), key
        assert got_lag[key] == r.lag2, key
        assert got_nth[key] == r.nth3, key


@pytest.mark.parametrize("seed,n", [(13, 1), (31, 3)])
def test_keep_last_changelog_collapses_to_batch_topn(spark, tmp_path, seed, n):
    """Randomized keep-last/Top-N changelog differential: applying the
    emitted +I/-U/+U/-D stream (order-insensitive multiset collapse)
    must yield exactly the batch ROW_NUMBER() OVER (ORDER BY ts DESC)
    <= n rows. Unique order values per key keep the oracle
    tie-unambiguous; 4 micro-batches churn the top set repeatedly."""
    import datetime as dt
    from collections import Counter

    from flink_sql_toolkit_spark.streaming.stateful import streaming_keep_last

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    # unique global ts in shuffled arrival order → constant churn
    offsets = list(range(120))
    rng.shuffle(offsets)
    rows = [
        (rng.randrange(3), t0 + dt.timedelta(seconds=o), f"tag{o}")
        for o in offsets
    ]
    schema = "k long, ts timestamp, tag string"
    _write_ordered_batches(spark, tmp_path, rows, schema, 4)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in/*")
    )
    q = (
        streaming_keep_last(stream, ["k"], "ts", n=n)
        .writeStream.format("memory")
        .queryName(f"kl_diff_{seed}")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    state: Counter = Counter()
    for r in spark.table(f"kl_diff_{seed}").collect():
        key = tuple(r)[1:]
        state[key] += 1 if r[0] in ("+I", "+U") else -1
    assert all(c in (0, 1) for c in state.values())
    got = sorted(k for k, c in state.items() if c == 1)

    win = Window.partitionBy("k").orderBy(F.desc("ts"))
    exp = sorted(
        (r.k, r.ts, r.tag)
        for r in spark.createDataFrame(rows, schema)
        .withColumn("rn", F.row_number().over(win))
        .filter(f"rn <= {n}")
        .drop("rn")
        .collect()
    )
    assert got == exp


@pytest.mark.parametrize("seed", [41])
def test_over_range_agrees_with_batch_window(spark, tmp_path, seed):
    """Event-time RANGE frame (10-second horizon, NULL-bearing values,
    in-order arrival so nothing is late) across 4 micro-batches vs the
    batch rangeBetween plan."""
    import datetime as dt

    from flink_sql_toolkit_spark.streaming.stateful import streaming_over_range

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows, off = [], 0
    for _ in range(300):
        off += rng.randint(1, 6)
        k = rng.randrange(3)
        v = None if rng.random() < 0.2 else rng.randint(-100, 100)
        rows.append((k, t0 + dt.timedelta(seconds=off), v))
    schema = "k long, ts timestamp, v long"
    _write_ordered_batches(spark, tmp_path, rows, schema, 4)

    got = {
        (r.k, r.ts): (r.v_sum, r.v_cnt, r.v_avg, r.v_min, r.v_max)
        for r in _run_stream(
            spark, tmp_path, schema,
            lambda s: streaming_over_range(
                s, partition_by=["k"], order_by="ts", value_col="v",
                preceding="10 seconds",
            ),
            f"diff_range_{seed}",
        ).collect()
    }
    batch = spark.createDataFrame(rows, schema)
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-10, 0)
    )
    exp_df = batch.select(
        "k", "ts",
        F.sum("v").over(w).alias("s"),
        F.count("v").over(w).alias("c"),
        F.avg("v").over(w).alias("a"),
        F.min("v").over(w).alias("mn"),
        F.max("v").over(w).alias("mx"),
    )
    exp = {(r.k, r.ts): (r.s, r.c, r.a, r.mn, r.mx) for r in exp_df.collect()}
    assert set(got) == set(exp)
    for key, (s, c, a, mn, mx) in exp.items():
        gs, gc, ga, gmn, gmx = got[key]
        assert (gs, gc, gmn, gmx) == (s, c, mn, mx), key
        if a is None:
            assert ga is None, key
        else:
            assert ga == pytest.approx(a), key
