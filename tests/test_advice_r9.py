"""Round-9 regression tests: the ADVICE r8 findings plus the test
debt VERDICT r8 called out (the three round-8 features shipped with
zero coverage — expression-argument OVER routing, streaming LEAD, and
the `lateDropped` accumulator).

ADVICE r8 items covered here:
1. (high) a string literal containing '<alias>.' inside an expression
   argument must survive the qualifier strip — the unmasked re.sub
   corrupted it and silently returned wrong sums.
2. overlapping OVER spans (nested window calls) are a clean typed
   rejection, not a mangled splice / AttributeError.
3. the RANGE route takes no reorder gate, so it must not carry a
   perpetual `lateDropped: 0` accumulator.
4. LAG(v) and LAG(`v`) over one spec route (backtick normalization).
"""

from __future__ import annotations

from fastwrite import write_rows

import datetime as dt

import pytest

# routed temp views from direct rewriter calls are dropped by
# conftest's autouse `_drop_routed_views` fixture (VERDICT r8 ask #1)


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _stream_view(spark, tmp_path, name, schema, files, wm_delay=None):
    """Write each row-list as one parquet file (= one micro-batch via
    maxFilesPerTrigger=1), register the stream as a temp view."""
    for i, rows in enumerate(files):
        write_rows(f"{tmp_path}/{name}/b{i}", rows, schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/{name}/*")
    )
    if wm_delay:
        stream = stream.withWatermark("ts", wm_delay)
    stream.createOrReplaceTempView(name)
    return stream


def _run_routed(spark, tmp_path, routed, sink):
    q = (
        spark.sql(routed)
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{sink}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink)


def _batch_df(spark, tmp_path, name, view):
    spark.read.parquet(f"{tmp_path}/{name}/*").createOrReplaceTempView(view)


# -- ADVICE r8 #1 (high): literal containing '<alias>.' ---------------


def test_expr_arg_literal_with_alias_dot_preserved(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [[
        (1, _t(1), "t.x", 5),
        (1, _t(2), "other", 7),
        (1, _t(3), "t.x", 11),
    ]]
    schema = "k long, ts timestamp, tag string, v long"
    _stream_view(spark, tmp_path, "adot_src", schema, files)
    routed = rewrite_streaming_over_sql(
        spark,
        "SELECT k, ts, SUM(CASE WHEN tag = 't.x' THEN v ELSE 0 END) "
        "OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN 2 PRECEDING AND "
        "CURRENT ROW) AS s FROM adot_src t",
    )
    assert routed is not None
    # the literal must survive the qualifier strip verbatim
    assert "'t.x'" in routed or "_over_out_" in routed
    got = {r.ts: r.s for r in _run_routed(spark, tmp_path, routed, "adot_out").collect()}
    # running frame over [5, 0, 11] — the corrupted literal ('x')
    # matched nothing and returned all-zero sums
    assert got == {_t(1): 5, _t(2): 5, _t(3): 16}


# -- VERDICT r8 ask #2a: expression-argument OVER vs batch oracle -----


def test_expr_arg_over_matches_batch_across_microbatches(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [
        [(1, _t(1), 2, 3), (1, _t(2), 5, 7), (2, _t(1), 1, 1)],
        [(1, _t(3), 11, 13), (2, _t(2), 4, 6)],
    ]
    schema = "k long, ts timestamp, price long, qty long"
    _stream_view(spark, tmp_path, "exprsrc", schema, files)
    sql = (
        "SELECT k, ts, SUM(price * qty) OVER (PARTITION BY k ORDER BY ts "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rev FROM exprsrc"
    )
    routed = rewrite_streaming_over_sql(spark, sql)
    assert routed is not None
    got = sorted(
        (r.k, r.ts, r.rev)
        for r in _run_routed(spark, tmp_path, routed, "expr_out").collect()
    )
    _batch_df(spark, tmp_path, "exprsrc", "exprsrc_b")
    want = sorted(
        (r.k, r.ts, r.rev)
        for r in spark.sql(sql.replace("exprsrc", "exprsrc_b")).collect()
    )
    assert got == want
    # the generated argument column must not leak into the output
    out_cols = spark.table("expr_out").columns
    assert not any(c.startswith("_over_arg") for c in out_cols)


def test_expr_arg_cast_and_qualified_col(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [[(1, _t(1), 3), (1, _t(2), 4), (1, _t(3), 10)]]
    schema = "k long, ts timestamp, v long"
    _stream_view(spark, tmp_path, "castsrc", schema, files)
    sql = (
        "SELECT k, ts, AVG(CAST(v AS DOUBLE)) OVER (PARTITION BY k "
        "ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a, "
        "SUM(t.v) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN 1 "
        "PRECEDING AND CURRENT ROW) AS s FROM castsrc t"
    )
    routed = rewrite_streaming_over_sql(spark, sql)
    assert routed is not None
    got = sorted(
        (r.k, r.ts, r.a, r.s)
        for r in _run_routed(spark, tmp_path, routed, "cast_out").collect()
    )
    _batch_df(spark, tmp_path, "castsrc", "castsrc_b")
    want = sorted(
        (r.k, r.ts, r.a, r.s)
        for r in spark.sql(sql.replace("FROM castsrc t", "FROM castsrc_b t")).collect()
    )
    assert got == want


def test_expr_arg_unparsable_rejected(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "badexpr_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]],
    )
    out = rewrite_streaming_over_sql(
        spark,
        "SELECT k, SUM(v +) OVER (PARTITION BY k ORDER BY ts ROWS "
        "BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM badexpr_src",
    )
    assert out is None  # typed-guidance path, not a downstream crash


# -- ADVICE r8 #2: overlapping (nested) OVER spans ---------------------


def test_nested_over_spans_rejected(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "nest_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]],
    )
    out = rewrite_streaming_over_sql(
        spark,
        "SELECT SUM(AVG(v) OVER (PARTITION BY k ORDER BY ts ROWS "
        "BETWEEN 1 PRECEDING AND CURRENT ROW)) OVER (PARTITION BY k "
        "ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s "
        "FROM nest_src",
    )
    assert out is None  # was: stale-offset splice → AttributeError


# -- ADVICE r8 #5: LAG(v) and LAG(`v`) compare equal -------------------


def test_lag_backtick_arg_routes(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "lbt_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]],
    )
    out = rewrite_streaming_over_sql(
        spark,
        "SELECT k, LAG(v) OVER (PARTITION BY k ORDER BY ts) AS a, "
        "LAG(`v`) OVER (PARTITION BY k ORDER BY ts) AS b FROM lbt_src",
    )
    assert out is not None  # r8 dropped the backtick strip → rejected


# -- VERDICT r8 ask #6: unaliased expression args → EXPR$N -------------


def test_unaliased_expr_arg_named_exprN(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "unal_src", "k long, ts timestamp, v long, w long",
        [[(1, _t(1), 2, 3)]],
    )
    routed = rewrite_streaming_over_sql(
        spark,
        "SELECT k, SUM(v * w) OVER (PARTITION BY k ORDER BY ts ROWS "
        "BETWEEN 1 PRECEDING AND CURRENT ROW) FROM unal_src",
    )
    assert routed is not None and "EXPR$" in routed
    cols = spark.sql(routed).columns
    assert any(c.startswith("EXPR$") for c in cols)
    assert not any(c.startswith("_over_arg") for c in cols)


# -- review r9: EXPR$ splice must respect top-level item boundaries ----


def test_expr_arg_inside_call_splices_bare_name(spark, tmp_path):
    """An expression-argument OVER nested in a function call is NOT a
    bare select item — the EXPR$ rename must not splice an `AS` into
    the middle of COALESCE's argument list (review r9: the comma
    checks matched inside parens and produced unparsable SQL)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [[(1, _t(1), 2, 3), (1, _t(2), 5, 7)]]
    schema = "k long, ts timestamp, v long, w long"
    _stream_view(spark, tmp_path, "coalsrc", schema, files)
    routed = rewrite_streaming_over_sql(
        spark,
        "SELECT k, ts, COALESCE(NULLIF(v, v), SUM(v * w) OVER "
        "(PARTITION BY k ORDER BY ts ROWS BETWEEN 1 PRECEDING AND "
        "CURRENT ROW), v) AS c FROM coalsrc",
    )
    assert routed is not None and "EXPR$" not in routed
    got = {r.ts: r.c for r in _run_routed(spark, tmp_path, routed, "coal_out").collect()}
    # NULLIF(v,v) is NULL → COALESCE falls through to the window sum
    assert got == {_t(1): 6, _t(2): 41}


def test_exprN_uses_select_list_ordinal(spark, tmp_path):
    """EXPR$<n> numbers by select-list position (Flink/Calcite
    convention), not by collected-span index (review r9)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "ordsrc", "k long, ts timestamp, v long, w long",
        [[(1, _t(1), 2, 3)]],
    )
    routed = rewrite_streaming_over_sql(
        spark,
        "SELECT k, ts, SUM(v * w) OVER (PARTITION BY k ORDER BY ts "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM ordsrc",
    )
    assert routed is not None and "EXPR$2" in routed  # third item


def test_nth_value_expression_arg_named_exprN(spark, tmp_path):
    """The offset family's expression arguments get the EXPR$ naming
    too (review r9: only the agg family was covered)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "nthexpr_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 2)]],
    )
    routed = rewrite_streaming_over_sql(
        spark,
        "SELECT k, NTH_VALUE(v * 2, 2) OVER (PARTITION BY k ORDER BY "
        "ts) FROM nthexpr_src",
    )
    assert routed is not None and "EXPR$1" in routed
    cols = spark.sql(routed).columns
    assert not any(c.startswith("_over_arg") for c in cols)


# -- review r9: rank-aware routing edge cases --------------------------


def test_backticked_rn_reference_routes_rank_aware(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    _stream_view(
        spark, tmp_path, "btrn_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]],
    )
    routed = rewrite_streaming_dedup_sql(
        spark,
        "SELECT k, `rn` FROM (SELECT *, ROW_NUMBER() OVER (PARTITION "
        "BY k ORDER BY ts) AS rn FROM btrn_src) WHERE rn <= 2",
    )
    # was: the masked `rn` placeholder never matched → rank-free view
    # → raw UNRESOLVED_COLUMN at execution
    assert routed is not None
    assert spark.sql(routed).columns == ["k", "rn"]


def test_rank_alias_op_collision_rejected(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    _stream_view(
        spark, tmp_path, "oprn_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]],
    )
    out = rewrite_streaming_dedup_sql(
        spark,
        "SELECT k, __op FROM (SELECT *, ROW_NUMBER() OVER (PARTITION "
        "BY k ORDER BY ts DESC) AS __op FROM oprn_src) WHERE __op <= 2",
        changelog=True,
    )
    assert out is None  # would duplicate the RowKind column


# -- ADVICE r8 #3: RANGE route carries no late-drop accumulator --------


def test_range_route_has_no_late_acc(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "rng_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]], wm_delay="10 seconds",
    )
    rng = rewrite_streaming_over_sql(
        spark,
        "SELECT k, ts, SUM(v) OVER (PARTITION BY k ORDER BY ts RANGE "
        "BETWEEN INTERVAL '5' SECOND PRECEDING AND CURRENT ROW) AS s "
        "FROM rng_src",
    )
    assert rng is not None and rng.late_acc is None  # ungated route
    rows = rewrite_streaming_over_sql(
        spark,
        "SELECT k, ts, SUM(v) OVER (PARTITION BY k ORDER BY ts ROWS "
        "BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM rng_src",
    )
    assert rows is not None and rows.late_acc is not None  # gated route


# -- VERDICT r8 ask #2b: streaming LEAD vs the batch oracle ------------


@pytest.mark.parametrize(
    "call",
    ["LEAD(v)", "LEAD(v, 2)", "LEAD(v, 1, -1)"],
    ids=["lead1", "lead2", "lead1_default"],
)
def test_streaming_lead_sql_matches_batch(spark, tmp_path, call):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [
        [(1, _t(1), 10), (1, _t(2), 20), (2, _t(1), 7)],
        [(1, _t(3), 30), (1, _t(4), None), (2, _t(2), 8)],
    ]
    schema = "k long, ts timestamp, v long"
    name = f"leadsrc_{call.count(',')}"
    _stream_view(spark, tmp_path, name, schema, files)
    sql = (
        f"SELECT k, ts, {call} OVER (PARTITION BY k ORDER BY ts) AS nxt "
        f"FROM {name}"
    )
    routed = rewrite_streaming_over_sql(spark, sql)
    assert routed is not None
    sink = f"lead_out_{call.count(',')}"
    got = {
        (r.k, r.ts): r.nxt
        for r in _run_routed(spark, tmp_path, routed, sink).collect()
    }
    _batch_df(spark, tmp_path, name, f"{name}_b")
    want = {
        (r.k, r.ts): r.nxt
        for r in spark.sql(sql.replace(name, f"{name}_b")).collect()
    }
    # emitted rows match batch lead(); the last k rows per key are
    # HELD (their lead row never arrived — an unbounded stream cannot
    # know the input ended), so `got` is the batch result minus them
    k = int(call.rstrip(")").split(",")[1]) if "," in call else 1
    assert got == {
        key: v for key, v in want.items()
        if key in got
    }
    for kk in (1, 2):
        held = sorted(ts for (key, ts) in want if key == kk)[-k:]
        assert all((kk, ts) not in got for ts in held)
    # every non-held row WAS emitted
    assert len(got) == len(want) - 2 * k if k <= 2 else True


def test_streaming_lead_cross_batch_pairing(spark, tmp_path):
    """Row i's lead value arrives in a LATER micro-batch: the pending
    ring must carry the full row across the batch boundary."""
    from flink_sql_toolkit_spark.streaming.stateful import streaming_lead

    files = [
        [(1, _t(1), 10)],
        [(1, _t(2), 20)],
    ]
    schema = "k long, ts timestamp, v long"
    stream = _stream_view(spark, tmp_path, "leadxb", schema, files)
    out = streaming_lead(stream, ["k"], ["ts"], "v", offset=1)
    q = (
        out.writeStream.format("memory")
        .queryName("leadxb_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_leadxb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("leadxb_out").collect()
    assert [(r.ts, r.v, r.v_lead) for r in rows] == [(_t(1), 10, 20)]


def test_lead_lag_default_type_mismatch_typed_error(spark, tmp_path):
    """A default the value column's type cannot hold raises a specific
    typed error, not the generic unsupported-shape guidance (VERDICT
    r8 cosmetic #4)."""
    from flink_sql_toolkit_spark.streaming.stateful import (
        streaming_lag,
        streaming_lead,
    )

    stream = _stream_view(
        spark, tmp_path, "dflt_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]],
    )
    with pytest.raises(NotImplementedError, match="not coercible"):
        streaming_lead(stream, ["k"], ["ts"], "v", default="oops")
    with pytest.raises(NotImplementedError, match="not coercible"):
        streaming_lag(stream, ["k"], ["ts"], "v", default="oops")


def test_streaming_lead_ttl_flush_emits_default(spark, tmp_path):
    """An idle key's pending rows flush with `default` as their lead
    value on TTL expiry — batch end-of-input semantics (the r8
    operator's documented flush policy)."""
    import time

    from flink_sql_toolkit_spark.streaming.stateful import streaming_lead

    schema = "k long, ts timestamp, v long"
    write_rows(f"{tmp_path}/lttl/b0", [(1, _t(1), 10), (1, _t(2), 20)], schema)
    stream = spark.readStream.schema(schema).parquet(f"{tmp_path}/lttl/*")
    out = streaming_lead(stream, ["k"], ["ts"], "v", offset=1, ttl_ms=2000,
                         default=-1)
    q = (
        out.writeStream.format("memory")
        .queryName("lttl_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_lttl"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        # batch 1: (t1,10) completes against (t2,20); (t2,20) pends
        while time.time() < deadline and spark.table("lttl_out").count() < 1:
            time.sleep(0.5)
        time.sleep(3)  # let the 2s TTL lapse with the key idle
        # new data for ANOTHER key triggers the timeout sweep
        spark.createDataFrame([(99, _t(50), 1)], schema).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{tmp_path}/lttl/b1")
        while time.time() < deadline:
            got = {
                (r.k, r.ts): r.v_lead for r in spark.table("lttl_out").collect()
            }
            if (1, _t(2)) in got:
                break
            time.sleep(0.5)
        assert got[(1, _t(1))] == 20
        assert got[(1, _t(2))] == -1  # TTL flush: lead = default
    finally:
        q.stop()


# -- VERDICT r8 ask #4: streaming NTH_VALUE ----------------------------


@pytest.mark.parametrize("frame", ["", " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"])
def test_streaming_nth_value_sql_matches_batch(spark, tmp_path, frame):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [
        [(1, _t(1), 10), (1, _t(2), None), (2, _t(1), 7)],
        [(1, _t(3), 30), (2, _t(2), 8), (2, _t(3), 9)],
    ]
    schema = "k long, ts timestamp, v long"
    name = f"nthsrc_{len(frame)}"
    _stream_view(spark, tmp_path, name, schema, files)
    sql = (
        f"SELECT k, ts, NTH_VALUE(v, 2) OVER (PARTITION BY k ORDER BY "
        f"ts{frame}) AS n2 FROM {name}"
    )
    routed = rewrite_streaming_over_sql(spark, sql)
    assert routed is not None
    sink = f"nth_out_{len(frame)}"
    got = {
        (r.k, r.ts): r.n2
        for r in _run_routed(spark, tmp_path, routed, sink).collect()
    }
    _batch_df(spark, tmp_path, name, f"{name}_b")
    want = {
        (r.k, r.ts): r.n2
        for r in spark.sql(sql.replace(name, f"{name}_b")).collect()
    }
    # RESPECT NULLS: key 1's 2nd row is NULL — n2 stays NULL forever;
    # key 2's 2nd row (t2, v=8) emits from t2 on, across the batch
    # boundary
    assert got == want
    assert got[(1, _t(3))] is None and got[(2, _t(3))] == 8


def test_streaming_nth_value_bounded_frame_rejected(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "nthb_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]],
    )
    out = rewrite_streaming_over_sql(
        spark,
        "SELECT k, NTH_VALUE(v, 2) OVER (PARTITION BY k ORDER BY ts "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n2 FROM nthb_src",
    )
    assert out is None  # sliding nth is not the O(1) running shape


# -- VERDICT r8 ask #3: rank-aware updating Top-N ----------------------


def _collapse_by_rank(rows):
    """Order-insensitive changelog collapse keyed by (k, rank): the
    surviving row per rank is the one added (+I/+U) but never
    retracted (-U/-D)."""
    from collections import Counter

    adds, removes = Counter(), Counter()
    for op, rn, *rest in rows:
        (adds if op in ("+I", "+U") else removes)[(rn, *rest)] += 1
    survivors = adds - removes
    assert all(c == 1 for c in survivors.values())
    return set(survivors)


def test_keep_last_rank_changelog_collapses_to_batch(spark, tmp_path):
    """`rn <= 2` projecting rn: the rank-keyed changelog's collapsed
    view equals the batch ranked result, including the shift-down
    cascade when a later row enters at rank 1 (r7 ask #4 done
    criterion)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    files = [
        [(1, _t(10), "a"), (1, _t(20), "b"), (2, _t(5), "z")],
        [(1, _t(30), "c")],  # displaces: rank1 b→c, rank2 a→b
    ]
    schema = "k long, ts timestamp, tag string"
    _stream_view(spark, tmp_path, "rktop_src", schema, files)
    sql = (
        "SELECT k, tag, rn FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts DESC) AS rn FROM rktop_src) "
        "WHERE rn <= 2"
    )
    routed = rewrite_streaming_dedup_sql(spark, sql, changelog=True)
    assert routed is not None and routed.op_passthrough
    rows = [
        (r["__op"], r.rn, r.k, r.tag)
        for r in _run_routed(spark, tmp_path, routed, "rktop_out")
        .select("__op", "rn", "k", "tag").collect()
    ]
    got = _collapse_by_rank([(op, rn, k, tag) for op, rn, k, tag in rows])
    _batch_df(spark, tmp_path, "rktop_src", "rktop_b")
    want = {
        (r.rn, r.k, r.tag)
        for r in spark.sql(sql.replace("rktop_src", "rktop_b")).collect()
    }
    assert got == want
    # the displacement emitted retractions for BOTH shifted ranks
    ops = [op for op, *_ in rows]
    assert ops.count("-U") == 2 and ops.count("+U") == 2


def test_first_n_rank_output_append(spark, tmp_path):
    """ASC (keep-first) projecting rn: ranks are final at emission —
    append-mode rank output matching the batch recipe."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    files = [
        [(1, _t(10), "a"), (1, _t(20), "b"), (2, _t(5), "z")],
        [(1, _t(30), "c"), (2, _t(6), "y")],
    ]
    schema = "k long, ts timestamp, tag string"
    _stream_view(spark, tmp_path, "fnrk_src", schema, files)
    sql = (
        "SELECT k, tag, rn FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts) AS rn FROM fnrk_src) "
        "WHERE rn <= 2"
    )
    routed = rewrite_streaming_dedup_sql(spark, sql)
    assert routed is not None
    got = {
        (r.k, r.tag, r.rn)
        for r in _run_routed(spark, tmp_path, routed, "fnrk_out").collect()
    }
    _batch_df(spark, tmp_path, "fnrk_src", "fnrk_b")
    want = {
        (r.k, r.tag, r.rn)
        for r in spark.sql(sql.replace("fnrk_src", "fnrk_b")).collect()
    }
    assert got == want and (1, "a", 1) in got and (2, "y", 2) in got


def test_dedup_recipe_residual_predicate_and_lt_form(spark, tmp_path):
    """`WHERE rn < N+1 AND <residual>` — both Flink doc spellings —
    route, with the residual applied post-rank (r9)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    files = [[
        (1, _t(10), "keep"), (1, _t(20), "late-dup"),
        (2, _t(5), "drop-me"), (3, _t(7), "keep2"),
    ]]
    schema = "k long, ts timestamp, tag string"
    _stream_view(spark, tmp_path, "resid_src", schema, files)
    routed = rewrite_streaming_dedup_sql(
        spark,
        "SELECT k, tag FROM (SELECT *, ROW_NUMBER() OVER (PARTITION "
        "BY k ORDER BY ts) AS rn FROM resid_src) "
        "WHERE rn < 2 AND tag LIKE 'keep%'",
    )
    assert routed is not None
    got = sorted(
        (r.k, r.tag)
        for r in _run_routed(spark, tmp_path, routed, "resid_out").collect()
    )
    # rank-1 rows: (1,keep), (2,drop-me), (3,keep2); residual filters
    # the middle one AFTER ranking (drop-me is still key 2's rank 1)
    assert got == [(1, "keep"), (3, "keep2")]


def test_dedup_recipe_residual_referencing_rn(spark, tmp_path):
    """A residual conjunct that references rn forces the rank-aware
    view so it can resolve (r9)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    files = [[(1, _t(1), "a"), (1, _t(2), "b"), (1, _t(3), "c")]]
    schema = "k long, ts timestamp, tag string"
    _stream_view(spark, tmp_path, "rnres_src", schema, files)
    routed = rewrite_streaming_dedup_sql(
        spark,
        "SELECT k, tag FROM (SELECT *, ROW_NUMBER() OVER (PARTITION "
        "BY k ORDER BY ts) AS rn FROM rnres_src) "
        "WHERE rn <= 3 AND rn > 1",
    )
    assert routed is not None
    got = sorted(
        (r.k, r.tag)
        for r in _run_routed(spark, tmp_path, routed, "rnres_out").collect()
    )
    assert got == [(1, "b"), (1, "c")]  # rank 1 excluded post-rank


def test_rank_alias_shadowing_source_column_rejected(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    _stream_view(
        spark, tmp_path, "rnshadow_src", "k long, ts timestamp, rn long",
        [[(1, _t(1), 0)]],
    )
    out = rewrite_streaming_dedup_sql(
        spark,
        "SELECT k, rn2 FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY "
        "k ORDER BY ts) AS rn2 FROM rnshadow_src) WHERE rn2 <= 2",
    )
    # rn2 is fine (no shadow)…
    assert out is not None
    out2 = rewrite_streaming_dedup_sql(
        spark,
        "SELECT k, rn FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY "
        "k ORDER BY ts) AS rn FROM rnshadow_src) WHERE rn <= 2",
    )
    # …but an alias shadowing the source's own `rn` column is ambiguous
    assert out2 is None


# -- r9: streaming ROW_NUMBER() outside the dedup recipe ---------------


def test_streaming_row_number_matches_batch(spark, tmp_path):
    """`ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts)` on a plain
    streaming SELECT routes as the O(1)-state running count and
    matches the batch function across micro-batches (r9)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [
        [(1, _t(1), 5), (1, _t(2), 6), (2, _t(1), 7)],
        [(1, _t(3), 8), (2, _t(2), 9)],
    ]
    schema = "k long, ts timestamp, v long"
    _stream_view(spark, tmp_path, "rnum_src", schema, files)
    sql = (
        "SELECT k, ts, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts) "
        "AS rn, SUM(v) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM rnum_src"
    )
    routed = rewrite_streaming_over_sql(spark, sql)
    assert routed is not None
    got = sorted(
        (r.k, r.ts, r.rn, r.s)
        for r in _run_routed(spark, tmp_path, routed, "rnum_out").collect()
    )
    _batch_df(spark, tmp_path, "rnum_src", "rnum_b")
    want = sorted(
        (r.k, r.ts, r.rn, r.s)
        for r in spark.sql(sql.replace("rnum_src", "rnum_b")).collect()
    )
    assert got == want


def test_streaming_rank_dense_rank_match_batch(spark, tmp_path):
    """RANK()/DENSE_RANK()/ROW_NUMBER() mixed in one streaming SELECT
    route to the O(1)-state rank operator and match the batch
    functions across micro-batches, ties included (r9)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [
        [(1, 10, "a"), (1, 10, "b"), (2, 5, "z")],   # tie on v=10
        [(1, 20, "c"), (1, 20, "d"), (2, 6, "y")],   # tie on v=20
    ]
    schema = "k long, v long, tag string"
    _stream_view(spark, tmp_path, "rkf_src", schema, files)
    sql = (
        "SELECT k, tag, RANK() OVER (PARTITION BY k ORDER BY v) AS r, "
        "DENSE_RANK() OVER (PARTITION BY k ORDER BY v) AS d, "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS n "
        "FROM rkf_src"
    )
    routed = rewrite_streaming_over_sql(spark, sql)
    assert routed is not None
    got = sorted(
        (r.k, r.tag, r.r, r.d, r.n)
        for r in _run_routed(spark, tmp_path, routed, "rkf_out").collect()
    )
    _batch_df(spark, tmp_path, "rkf_src", "rkf_b")
    want = sorted(
        (r.k, r.tag, r.r, r.d, r.n)
        for r in spark.sql(sql.replace("rkf_src", "rkf_b")).collect()
    )
    # ties within a micro-batch: (a,b) share rank 1, (c,d) share rank
    # 3 (RANK) / 2 (DENSE_RANK); row numbers stay distinct
    assert got == want
    # unused rank columns must not leak into a SELECT * view
    view = routed.split("FROM ")[-1].split()[0]
    assert set(spark.table(view).columns) <= {
        "k", "v", "tag", "v_rnk", "v_drnk", "v_rownum"
    }


def test_noframe_aggregate_routes_as_running(spark, tmp_path):
    """`SUM(v) OVER (PARTITION BY k ORDER BY ts)` — SQL's default
    frame with a unique ORDER BY — equals the running aggregate and
    must route instead of falling to typed guidance (r9)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [
        [(1, _t(1), 10), (1, _t(2), 20), (2, _t(1), 5)],
        [(1, _t(3), 30)],
    ]
    schema = "k long, ts timestamp, v long"
    _stream_view(spark, tmp_path, "nfagg_src", schema, files)
    sql = (
        "SELECT k, ts, SUM(v) OVER (PARTITION BY k ORDER BY ts) AS s, "
        "AVG(v) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN 1 "
        "PRECEDING AND CURRENT ROW) AS a FROM nfagg_src"
    )
    routed = rewrite_streaming_over_sql(spark, sql)
    assert routed is not None
    got = sorted(
        (r.k, r.ts, r.s, r.a)
        for r in _run_routed(spark, tmp_path, routed, "nfagg_out").collect()
    )
    _batch_df(spark, tmp_path, "nfagg_src", "nfagg_b")
    want = sorted(
        (r.k, r.ts, r.s, r.a)
        for r in spark.sql(sql.replace("nfagg_src", "nfagg_b")).collect()
    )
    assert got == want


def test_streaming_row_number_range_mix_rejected(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "rnmix_src", "k long, ts timestamp, v long",
        [[(1, _t(1), 1)]],
    )
    out = rewrite_streaming_over_sql(
        spark,
        "SELECT k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts) AS "
        "rn, SUM(v) OVER (PARTITION BY k ORDER BY ts RANGE BETWEEN "
        "INTERVAL '5' SECOND PRECEDING AND CURRENT ROW) AS s "
        "FROM rnmix_src",
    )
    assert out is None  # row-position does not mix with time frames


# -- r9: global (unpartitioned) OVER windows ---------------------------


def test_global_over_window_matches_batch(spark, tmp_path):
    """OVER (ORDER BY …) without PARTITION BY routes through a
    synthesized constant key — Flink's unpartitioned OverAggregate —
    and matches the batch result; the key never leaks (r9)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [
        [(1, _t(1), 10), (2, _t(2), 20)],
        [(3, _t(3), 30)],
    ]
    schema = "k long, ts timestamp, v long"
    _stream_view(spark, tmp_path, "glob_src", schema, files)
    sql = (
        "SELECT k, ts, SUM(v) OVER (ORDER BY ts ROWS BETWEEN 1 "
        "PRECEDING AND CURRENT ROW) AS s, ROW_NUMBER() OVER (ORDER BY "
        "ts) AS rn FROM glob_src"
    )
    routed = rewrite_streaming_over_sql(spark, sql)
    assert routed is not None
    out = _run_routed(spark, tmp_path, routed, "glob_out")
    got = sorted((r.k, r.ts, r.s, r.rn) for r in out.collect())
    _batch_df(spark, tmp_path, "glob_src", "glob_b")
    want = sorted(
        (r.k, r.ts, r.s, r.rn)
        for r in spark.sql(sql.replace("glob_src", "glob_b")).collect()
    )
    assert got == want
    assert "_over_gpk" not in out.columns


def test_global_over_lag_and_rank(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    files = [[(1, _t(1), 10), (2, _t(2), 20), (3, _t(3), 30)]]
    schema = "k long, ts timestamp, v long"
    _stream_view(spark, tmp_path, "globl_src", schema, files)
    for sql, col, expect in [
        (
            "SELECT k, LAG(v) OVER (ORDER BY ts) AS p FROM globl_src",
            "p", [None, 10, 20],
        ),
        (
            "SELECT k, RANK() OVER (ORDER BY ts) AS r FROM globl_src",
            "r", [1, 2, 3],
        ),
    ]:
        routed = rewrite_streaming_over_sql(spark, sql)
        assert routed is not None, sql
        sink = f"globl_out_{col}"
        rows = sorted(
            (r.k, r[col])
            for r in _run_routed(spark, tmp_path, routed, sink).collect()
        )
        assert [v for _k, v in rows] == expect


# -- VERDICT r8 ask #2c: lateDropped is counted and surfaced -----------


def _late_stream(spark, tmp_path, name, schema, rows_late):
    """b0 advances the watermark far ahead; b1 carries a
    beyond-watermark row (plus company to keep batches flowing)."""
    files = [
        [(1, _t(100), 1)],
        rows_late,
        [(3, _t(400), 9)],
    ]
    return _stream_view(
        spark, tmp_path, name, schema, files, wm_delay="5 seconds"
    )


@pytest.mark.parametrize(
    "opname", ["lag", "lead", "first_n", "over_rows", "mr", "rank"]
)
def test_late_dropped_accumulator_nonzero(spark, tmp_path, opname):
    from flink_sql_toolkit_spark.streaming import stateful as st

    schema = "k long, ts timestamp, v long"
    late_rows = [(1, _t(10), 2), (2, _t(300), 3)]  # t10 < wm(t95)
    stream = _late_stream(spark, tmp_path, f"late_{opname}", schema, late_rows)
    acc = spark.sparkContext.accumulator(0)
    if opname == "lag":
        out = st.streaming_lag(stream, ["k"], ["ts"], "v",
                               reorder_wm_col="ts", late_acc=acc)
    elif opname == "lead":
        out = st.streaming_lead(stream, ["k"], ["ts"], "v",
                                reorder_wm_col="ts", late_acc=acc)
    elif opname == "first_n":
        out = st.streaming_first_n(stream, ["k"], ["ts"], 1,
                                   reorder_wm_col="ts", late_acc=acc)
    elif opname == "over_rows":
        out = st.streaming_over_rows(stream, ["k"], ["ts"], "v", 1,
                                     aggs=("sum",), reorder_wm_col="ts",
                                     late_acc=acc)
    elif opname == "rank":
        out = st.streaming_rank(stream, ["k"], ["ts"],
                                reorder_wm_col="ts", late_acc=acc)
    else:
        out = st.streaming_match_recognize(
            stream, partition_by=["k"], order_by=["ts"], pattern="A",
            define={"A": "v >= 0"}, measures={"m_ts": "LAST(A.ts)"},
            reorder_wm_col="ts", late_acc=acc,
        )
    q = (
        out.writeStream.format("memory")
        .queryName(f"late_out_{opname}")
        .option("checkpointLocation", str(tmp_path / f"ckpt_late_{opname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert acc.value >= 1  # the t10 row was dropped beyond-watermark


def test_late_dropped_surfaces_on_result_pages(spark, tmp_path):
    """E2E (engine.py:466-471): a beyond-watermark row arriving after
    the watermark advanced shows up as a nonzero `lateDropped` on the
    streaming SELECT's result pages."""
    import time

    from flink_sql_toolkit_spark.engine import Engine

    schema = "k long, ts timestamp, v long"
    write_rows(f"{tmp_path}/latesql", [(1, _t(100), 1)], schema)
    engine = Engine(spark)
    sess = engine.open_session("late-sql")
    try:
        sess.execute_statement(
            f"""CREATE TABLE late_src (k BIGINT, ts TIMESTAMP, v BIGINT,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
            WITH ('connector'='filesystem', 'path'='{tmp_path}/latesql',
                  'format'='parquet')"""
        )
        op = sess.execute_statement(
            "SELECT k, ts, SUM(v) OVER (PARTITION BY k ORDER BY ts ROWS "
            "BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM late_src"
        )
        deadline = time.time() + 90
        page, token = {}, 0
        # batch 1's row stays HELD by the reorder gate (wm still 0
        # while it runs), so wait on the query's watermark progress:
        # once it shows t95, the appended file lands in a later batch
        q = op._stream_query
        while time.time() < deadline:
            p = q.lastProgress
            wm_str = (p or {}).get("eventTime", {}).get("watermark", "")
            if wm_str.startswith("2024"):
                break
            time.sleep(0.5)
        assert wm_str.startswith("2024"), "watermark never advanced"
        page = op.fetch(token)
        token = page["nextResultToken"]
        assert page.get("lateDropped") == 0  # gate armed, nothing late yet
        # now a beyond-watermark row (t10 << wm t95) arrives
        write_rows(f"{tmp_path}/latesql", [(1, _t(10), 2), (2, _t(300), 3)], schema, mode="append")
        while time.time() < deadline:
            page = op.fetch(token)
            token = page["nextResultToken"]
            if page.get("lateDropped", 0) > 0:
                break
            time.sleep(0.5)
        op.cancel()
        assert page.get("lateDropped", 0) >= 1
    finally:
        sess.close()


def test_dedup_residual_top_level_or_rejected(spark, tmp_path):
    """A top-level OR after the rank predicate changes operator
    precedence ((rn=1 AND a) OR b) — must NOT route as a post-rank
    filter; parenthesized ORs stay routable (review r9)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    files = [[(1, _t(1), "a"), (1, _t(2), "b")]]
    schema = "k long, ts timestamp, tag string"
    _stream_view(spark, tmp_path, "orres_src", schema, files)
    base = (
        "SELECT k, tag FROM (SELECT *, ROW_NUMBER() OVER (PARTITION "
        "BY k ORDER BY ts) AS rn FROM orres_src) WHERE rn = 1 AND "
    )
    assert rewrite_streaming_dedup_sql(spark, base + "tag = 'a' OR tag = 'b'") is None
    assert rewrite_streaming_dedup_sql(spark, base + "tag = 'a' ORDER BY k") is None
    assert rewrite_streaming_dedup_sql(spark, base + "tag = 'a' LIMIT 5") is None
    # parenthesized OR is one conjunct — routes
    routed = rewrite_streaming_dedup_sql(
        spark, base + "(tag = 'a' OR tag = 'z')"
    )
    assert routed is not None
    got = sorted(
        (r.k, r.tag)
        for r in _run_routed(spark, tmp_path, routed, "orres_out").collect()
    )
    assert got == [(1, "a")]


def test_rowtime_auxiliary_parenthesized(spark):
    """TUMBLE_END - TUMBLE_ROWTIME must be +1ms, not -1ms — the
    ROWTIME splice is parenthesized (review r9)."""
    from flink_sql_toolkit_spark.dialect import rewrite

    spark.createDataFrame(
        [(1,)], "v long"
    ).selectExpr("TIMESTAMP '2026-01-01 00:01:00' AS ts").createOrReplaceTempView(
        "rta_src"
    )
    (row,) = spark.sql(
        rewrite(
            "SELECT TUMBLE_END(ts, INTERVAL '5' MINUTE) - "
            "TUMBLE_ROWTIME(ts, INTERVAL '5' MINUTE) AS d FROM rta_src "
            "GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)"
        )
    ).collect()
    assert row.d.total_seconds() == 0.001


def test_json_aggs_nested_args_and_one_arg_ltz(spark):
    """JSON_ARRAYAGG/OBJECTAGG accept nested calls in arguments;
    TO_TIMESTAMP_LTZ(numeric) defaults to millisecond precision
    (review r9)."""
    import json
    from datetime import datetime

    from flink_sql_toolkit_spark.dialect import rewrite

    (arr,) = spark.sql(
        rewrite(
            "SELECT JSON_ARRAYAGG(UPPER(x)) AS a FROM (VALUES ('p'),('q')) AS t(x)"
        )
    ).collect()
    assert sorted(json.loads(arr.a)) == ["P", "Q"]
    (obj,) = spark.sql(
        rewrite(
            "SELECT JSON_OBJECTAGG(KEY lower(k) VALUE v + 1) AS o "
            "FROM (VALUES ('A', 1)) AS t(k, v)"
        )
    ).collect()
    assert json.loads(obj.o) == {"a": 2}
    (ts,) = spark.sql(rewrite("SELECT TO_TIMESTAMP_LTZ(1500) AS t")).collect()
    assert ts.t == datetime(1970, 1, 1, 0, 0, 1, 500000)
    (ts2,) = spark.sql(
        rewrite("SELECT TO_TIMESTAMP_LTZ(CAST(1 AS BIGINT) * 1500, 3) AS t")
    ).collect()
    assert ts2.t == datetime(1970, 1, 1, 0, 0, 1, 500000)


def test_keep_last_rank_star_puts_rn_last(spark, tmp_path):
    """SELECT * on the rank-aware changelog view: rn is the LAST data
    column (Flink's ranked Top-N star order, and consistent with the
    ASC first_n route — review r9: it previously led the columns)."""
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    files = [[(1, _t(10), "a"), (1, _t(20), "b")]]
    schema = "k long, ts timestamp, tag string"
    _stream_view(spark, tmp_path, "rkstar_src", schema, files)
    sql = (
        "SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts DESC) AS rn FROM rkstar_src) "
        "WHERE rn <= 2 AND rn >= 1"  # rn residual forces the rank-aware view
    )
    routed = rewrite_streaming_dedup_sql(spark, sql, changelog=True)
    assert routed is not None
    out = _run_routed(spark, tmp_path, routed, "rkstar_out")
    assert out.columns[0] == "__op" and out.columns[-1] == "rn"
    assert out.columns[1:-1] == ["k", "ts", "tag"]
    # rank values land in the rn column, not a data column
    vals = {(r.tag, r.rn) for r in out.collect()}
    assert vals == {("b", 1), ("a", 2)}
