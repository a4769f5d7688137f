"""applyInPandasWithState operators: state must survive micro-batch
boundaries (forced with maxFilesPerTrigger=1 over a file source)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_sql_toolkit_spark.streaming.stateful import streaming_dedup, streaming_funnel


def _write_batches(spark, path):
    """Two files = two micro-batches; the A-rows of user 7's match
    arrive in batch 1, the closing B-row in batch 2."""
    b1 = [
        (7, dt.datetime(2024, 1, 1, 0, 0, 1), "view"),
        (7, dt.datetime(2024, 1, 1, 0, 0, 2), "view"),
        (8, dt.datetime(2024, 1, 1, 0, 0, 3), "view"),
        (8, dt.datetime(2024, 1, 1, 0, 0, 4), "purchase"),
    ]
    b2 = [
        (7, dt.datetime(2024, 1, 1, 0, 1, 0), "purchase"),
        (9, dt.datetime(2024, 1, 1, 0, 1, 1), "purchase"),  # no A → no match
    ]
    schema = "user_id long, ts timestamp, event_type string"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(f"{path}/in/b1")
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("overwrite").parquet(f"{path}/in/b2")


def test_funnel_state_crosses_microbatches(spark, tmp_path):
    _write_batches(spark, tmp_path)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in/*")
    )
    out = streaming_funnel(
        stream, "user_id", "ts", "event_type <> 'purchase'", "event_type = 'purchase'"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.user_id: r for r in spark.table("funnel_out").collect()}
    assert set(rows) == {7, 8}  # user 9 never matched
    assert rows[8].n_before == 1
    # user 7's A-rows were in batch 1, B in batch 2 → state crossed
    assert rows[7].n_before == 2
    assert rows[7].start_ts == dt.datetime(2024, 1, 1, 0, 0, 1)
    assert rows[7].purchase_ts == dt.datetime(2024, 1, 1, 0, 1, 0)


def test_streaming_dedup_keep_first(spark, tmp_path):
    data = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), "first"),
        (1, dt.datetime(2024, 1, 1, 0, 0, 5), "dup"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 2), "only"),
    ]
    schema = "k long, ts timestamp, tag string"
    spark.createDataFrame(data, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/in"
    )
    stream = spark.readStream.schema(schema).parquet(f"{tmp_path}/in")
    out = streaming_dedup(stream, ["k"], "ts", "10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedup_out").collect()
    assert len(rows) == 2
    assert {r.k for r in rows} == {1, 2}


# -- general streaming MATCH_RECOGNIZE (VERDICT r4 ask #6) ------------


def _run_stream_mr(spark, tmp_path, files, name, **mr_kwargs):
    from flink_sql_toolkit_spark.streaming.stateful import streaming_match_recognize

    schema = "user_id long, seq long, event_type string"
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/in/b{i}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in/*")
    )
    out = streaming_match_recognize(
        stream,
        partition_by=["user_id"],
        order_by=["seq"],
        **mr_kwargs,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name).collect()


def test_streaming_mr_match_spans_batches(spark, tmp_path):
    """The corpus pattern (A+ B) across 3 micro-batches with the
    match spanning batch boundaries — must agree with the batch
    operator over the full input (syntax-test.fsql:467-482)."""
    from flink_sql_toolkit_spark.operators.match_recognize import match_recognize

    b0 = [(1, 1, "view"), (1, 2, "view"), (2, 1, "purchase")]
    b1 = [(1, 3, "view"), (1, 4, "purchase"), (2, 2, "view")]
    b2 = [(1, 5, "view"), (1, 6, "purchase"), (2, 3, "purchase")]
    kwargs = dict(
        pattern="A+ B",
        define={"A": "event_type <> 'purchase'", "B": "event_type = 'purchase'"},
        measures={
            "start_seq": "FIRST(A.seq)",
            "end_seq": "LAST(B.seq)",
            "n_before": "COUNT(A.*)",
            "mn": "MATCH_NUMBER()",
        },
    )
    got = sorted(
        (r.user_id, r.start_seq, r.end_seq, r.n_before, r.mn)
        for r in _run_stream_mr(spark, tmp_path, [b0, b1, b2], "smr1", **kwargs)
    )
    # user 1: A(1,2,3)+B(4) spans b0→b1; then A(5)+B(6) inside b2.
    # user 2: first purchase has no A before; A(2)+B(3) spans b1→b2.
    assert got == [(1, 1, 4, 3, 1), (1, 5, 6, 1, 2), (2, 2, 3, 1, 1)]
    batch_df = spark.createDataFrame(
        b0 + b1 + b2, "user_id long, seq long, event_type string"
    )
    batch = sorted(
        (r.user_id, r.start_seq, r.end_seq, r.n_before, r.mn)
        for r in match_recognize(
            batch_df, partition_by=["user_id"], order_by=["seq"], **kwargs
        ).collect()
    )
    assert got == batch


def test_streaming_mr_holds_extensible_match(spark, tmp_path):
    """A match that could still grow (trailing Z?) must be HELD at
    the batch boundary and emitted only once decidable — prefix-
    stable emission, not eager emission."""
    b0 = [(1, 1, "view"), (1, 2, "purchase")]  # A B ... Z? undecided
    b1 = [(1, 3, "refund")]                    # Z arrives → match is A B Z
    b2 = [(1, 4, "view"), (1, 5, "purchase"), (1, 6, "view")]  # A B, Z? decided by 'view'
    rows = _run_stream_mr(
        spark,
        tmp_path,
        [b0, b1, b2],
        "smr2",
        pattern="A B Z?",
        define={
            "A": "event_type = 'view'",
            "B": "event_type = 'purchase'",
            "Z": "event_type = 'refund'",
        },
        measures={"s": "FIRST(A.seq)", "z": "FIRST(Z.seq)", "cls": "CLASSIFIER()"},
    )
    got = sorted((r.s, r.z, r.cls) for r in rows)
    # first match waited for b1 and includes the Z row; second match's
    # Z? was refuted by the trailing view row inside b2
    assert got == [(1, 3, "Z"), (4, None, "B")]


def test_streaming_mr_typed_rejections(spark):
    from flink_sql_toolkit_spark.streaming.stateful import streaming_match_recognize
    import pytest as _pytest

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("value AS user_id", "value AS seq", "'x' AS event_type")
    )
    with _pytest.raises(NotImplementedError, match="PREV"):
        streaming_match_recognize(
            stream,
            partition_by=["user_id"],
            order_by=["seq"],
            pattern="A B",
            define={"A": "seq > 0", "B": "seq > PREV(seq)"},
            measures={"n": "COUNT(A.*)"},
        )


def test_streaming_over_rows_frame_crosses_batches(spark, tmp_path):
    """Flink-style streaming OVER with a ROWS frame: per-row running
    aggregates whose frame spans micro-batch boundaries."""
    from flink_sql_toolkit_spark.streaming.stateful import streaming_over_rows

    schema = "k long, seq long, v long"
    b0 = [(1, 1, 10), (1, 2, 20)]
    b1 = [(1, 3, 30), (2, 1, 5)]
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/in/b{i}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in/*")
    )
    out = streaming_over_rows(
        stream, partition_by=["k"], order_by=["seq"], value_col="v", n_preceding=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("over_rows")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.seq): (r.v_sum, r.v_cnt, r.v_avg, r.v_min, r.v_max)
        for r in spark.table("over_rows").collect()
    }
    assert got == {
        (1, 1): (10, 1, 10.0, 10, 10),
        (1, 2): (30, 2, 15.0, 10, 20),
        # frame (20, 30) spans the b0→b1 boundary via state
        (1, 3): (50, 2, 25.0, 20, 30),
        (2, 1): (5, 1, 5.0, 5, 5),
    }


def test_streaming_over_sql_typed_rejection(spark, tmp_path):
    """An OVER window in a streaming SELECT surfaces the engine's
    typed guidance, not Spark's raw analysis error."""
    import pytest as _pytest

    from flink_sql_toolkit_spark.engine import Engine

    engine = Engine(spark)
    sess = engine.open_session("over-reject")
    try:
        sess.execute_statement(
            "CREATE TABLE over_src (v BIGINT) WITH "
            "('connector'='datagen', 'rows-per-second'='1')"
        )
        with _pytest.raises(NotImplementedError, match="streaming_over_rows"):
            sess.execute_statement(
                "SELECT v, SUM(v) OVER (ORDER BY v) AS s FROM over_src"
            )
    finally:
        sess.close()


def test_streaming_mr_to_next_row_agrees_with_batch(spark, tmp_path):
    """SKIP TO NEXT ROW (overlapping matches) across batch boundaries
    agrees with the batch operator."""
    from flink_sql_toolkit_spark.operators.match_recognize import match_recognize

    b0 = [(1, 1, "a"), (1, 2, "a")]
    b1 = [(1, 3, "a"), (1, 4, "b")]
    kwargs = dict(
        pattern="A+ B",
        define={"A": "event_type = 'a'", "B": "event_type = 'b'"},
        measures={"f": "FIRST(A.seq)", "n": "COUNT(A.*)"},
        after_match="to_next_row",
    )
    got = sorted(
        (r.f, r.n)
        for r in _run_stream_mr(spark, tmp_path, [b0, b1], "smr_tnr", **kwargs)
    )
    batch = sorted(
        (r.f, r.n)
        for r in match_recognize(
            spark.createDataFrame(
                b0 + b1, "user_id long, seq long, event_type string"
            ),
            partition_by=["user_id"],
            order_by=["seq"],
            **kwargs,
        ).collect()
    )
    # overlapping matches: starts at 1, 2, 3 with shrinking A-runs
    assert got == batch == [(1, 3), (2, 2), (3, 1)]


def test_streaming_mr_buffer_cap_drops_oldest(spark):
    """The state buffer is bounded: with max_buffer_rows=3, a long
    undecided A-run keeps only its newest 3 rows (pressure valve,
    documented lossy like Flink CEP without WITHIN)."""
    import pickle

    from flink_sql_toolkit_spark.operators.match_recognize import match_recognize

    # drive run_nfa's streaming mode directly — the Spark wiring is
    # covered by the other tests; this one pins the cap arithmetic.
    compiled = match_recognize(
        spark.createDataFrame([], "user_id long, seq long, event_type string"),
        partition_by=["user_id"],
        order_by=["seq"],
        pattern="A+ B",
        define={"A": "event_type = 'a'", "B": "event_type = 'b'"},
        measures={"n": "COUNT(A.*)"},
        _compile_only=True,
    )
    import pandas as pd

    # emulate one operator call with 10 undecided A-rows and apply
    # the wrapper's cap + pickle round-trip to the retained suffix
    rows = pd.DataFrame(
        {
            "user_id": [1] * 10,
            "seq": list(range(10)),
            "event_type": ["a"] * 10,
            "_sym_A": [True] * 10,
            "_sym_B": [False] * 10,
        }
    )
    run_nfa = compiled["run_nfa"]
    out_df, keep_from, match_no = run_nfa(rows, streaming=True, match_no_base=0)
    assert len(out_df) == 0 and keep_from == 0  # all 10 rows undecided
    kept = rows.iloc[keep_from:]
    capped = kept.iloc[-3:]
    assert list(capped["seq"]) == [7, 8, 9]
    # round-trip through the pickle the operator uses for state
    blob = pickle.dumps(capped)
    assert list(pickle.loads(blob)["seq"]) == [7, 8, 9]


def test_streaming_mr_cross_symbol_define_spans_batches(spark, tmp_path):
    """Dynamic (cross-symbol) DEFINE predicates evaluate against the
    partial match context carried across micro-batches."""
    # seq as both order and value: B fires only when its value exceeds
    # the LAST A value times 2 (dynamic predicate with SQL division)
    b0 = [(1, 10, "x")]          # A(10) ... B undecided
    b1 = [(1, 21, "x")]          # 21 > 10*2 → but is 21 an A or a B?
    kwargs = dict(
        pattern="A B",
        define={"A": "event_type = 'x'", "B": "B.seq > A.seq * 2"},
        measures={"a": "FIRST(A.seq)", "b": "LAST(B.seq)"},
    )
    got = sorted(
        (r.a, r.b)
        for r in _run_stream_mr(spark, tmp_path, [b0, b1], "smr_dyn", **kwargs)
    )
    from flink_sql_toolkit_spark.operators.match_recognize import match_recognize

    batch = sorted(
        (r.a, r.b)
        for r in match_recognize(
            spark.createDataFrame(
                b0 + b1, "user_id long, seq long, event_type string"
            ),
            partition_by=["user_id"],
            order_by=["seq"],
            **kwargs,
        ).collect()
    )
    assert got == batch == [(10, 21)]
