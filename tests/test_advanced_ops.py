"""Tests for as-of join, MATCH_RECOGNIZE, and multimodal plumbing."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.operators.asof import asof_join
from flink_sql_toolkit_spark.operators.match_recognize import (
    match_recognize,
    match_recognize_funnel,
)
from flink_sql_toolkit_spark.operators.multimodal import decode_image, extract_media_features
from flink_sql_toolkit_spark.operators.registry import QUERIES


def test_asof_join_picks_latest_version(spark):
    probe = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10)), (2, dt.datetime(2024, 1, 1))], ["id", "ts"]
    )
    build = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), "v1"),
            (1, dt.datetime(2024, 1, 5), "v2"),
            (1, dt.datetime(2024, 1, 20), "v3"),  # future → invisible
            (9, dt.datetime(2024, 1, 1), "other-key"),
        ],
        ["bid", "vts", "version"],
    )
    out = asof_join(
        probe,
        build,
        (probe.id == build.bid) & (build.vts <= probe.ts),
        version_order=[F.desc("vts")],
        probe_unique=["id"],
    ).collect()
    by_id = {r.id: r.version for r in out}
    assert by_id[1] == "v2"
    assert by_id[2] is None  # no version yet → left join null


def test_match_recognize_simple_pattern(spark):
    rows = [
        ("u1", 1, "view"),
        ("u1", 2, "view"),
        ("u1", 3, "purchase"),
        ("u1", 4, "purchase"),   # no A before → not a match
        ("u1", 5, "view"),
        ("u1", 6, "purchase"),
        ("u2", 1, "purchase"),   # partition starts with B → no match
    ]
    df = spark.createDataFrame(rows, ["user_id", "seq", "event_type"])
    out = match_recognize(
        df,
        partition_by=["user_id"],
        order_by=["seq"],
        pattern="A+ B",
        define={"A": "event_type <> 'purchase'", "B": "event_type = 'purchase'"},
        measures={"first_seq": "FIRST(A.seq)", "buy_seq": "LAST(B.seq)", "n": "COUNT(A.*)"},
    ).collect()
    matches = sorted([(r.user_id, r.first_seq, r.buy_seq, r.n) for r in out])
    assert matches == [("u1", 1, 3, 2), ("u1", 5, 6, 1)]


def test_match_recognize_optional_and_star(spark):
    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, 5.0), ("k", 3, 8.0)], ["k", "seq", "v"]
    )
    # DOWN then zero-or-more UP: greedy
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="D U*",
        define={"D": "v < PREV(v)", "U": "v > PREV(v)"},
        measures={"d_seq": "FIRST(D.seq)", "last_seq": "LAST(U.seq)"},
    ).collect()
    assert [(r.d_seq, r.last_seq) for r in out] == [(2, 3)]


def test_fast_path_matches_generic_nfa(spark, sf_dir):
    """The vectorized A+ B path must be byte-identical to the generic
    NFA (forced by a 3-token pattern with an always-false filler)."""
    from flink_sql_toolkit_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    common = dict(
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        define={"A": "event_type <> 'purchase'", "B": "event_type = 'purchase'", "Z": "false"},
        measures={"s": "FIRST(A.ts)", "p": "LAST(B.ts)", "n": "COUNT(A.*)"},
    )
    fast = match_recognize(ev, pattern="A+ B", **common)
    generic = match_recognize(ev, pattern="A+ B Z?", **common)  # 3 tokens → generic
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, generic.collect()))


def test_fast_path_falls_back_on_overlap(spark):
    """Overlapping symbol predicates must route to the generic NFA."""
    df = spark.createDataFrame(
        [("k", 1, "x"), ("k", 2, "x"), ("k", 3, "y")], ["k", "seq", "v"]
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B",
        define={"A": "v IN ('x', 'y')", "B": "v = 'y'"},  # overlap on 'y'
        measures={"first_a": "FIRST(A.seq)", "b": "LAST(B.seq)", "n": "COUNT(A.*)"},
    ).collect()
    # greedy A+ consumes rows 1,2 then B matches row 3
    assert [(r.first_a, r.b, r.n) for r in out] == [(1, 3, 2)]


def test_match_recognize_agg_measures(spark):
    """AVG/SUM/MIN/MAX over a symbol's rows — fast path (A+ B) vs
    hand-computed values."""
    rows = [
        ("k", 1, 4.0, "a"), ("k", 2, 10.0, "a"), ("k", 3, 1.0, "a"),
        ("k", 4, 99.0, "b"),
        ("k", 5, 7.0, "a"), ("k", 6, 50.0, "b"),
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "v", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B",
        define={"A": "t = 'a'", "B": "t = 'b'"},
        measures={
            "avg_v": "AVG(A.v)", "sum_v": "SUM(A.v)",
            "min_v": "MIN(A.v)", "max_v": "MAX(A.v)", "b_v": "LAST(B.v)",
        },
    ).collect()
    got = sorted((r.avg_v, r.sum_v, r.min_v, r.max_v, r.b_v) for r in out)
    assert got == [(5.0, 15.0, 1.0, 10.0, 99.0), (7.0, 7.0, 7.0, 7.0, 50.0)]
    # generic NFA path (3-token pattern) must agree
    out2 = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B Z?",
        define={"A": "t = 'a'", "B": "t = 'b'", "Z": "false"},
        measures={
            "avg_v": "AVG(A.v)", "sum_v": "SUM(A.v)",
            "min_v": "MIN(A.v)", "max_v": "MAX(A.v)", "b_v": "LAST(B.v)",
        },
    ).collect()
    assert sorted((r.avg_v, r.sum_v, r.min_v, r.max_v, r.b_v) for r in out2) == got


def test_match_recognize_int_sum_and_skip_to_next_row(spark):
    rows = [("k", 1, 2, "a"), ("k", 2, 3, "a"), ("k", 3, 0, "b")]
    df = spark.createDataFrame(rows, ["k", "seq", "iv", "t"])
    common = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B",
        define={"A": "t = 'a'", "B": "t = 'b'"},
        measures={"s": "SUM(A.iv)", "f": "FIRST(A.seq)"},
    )
    out = match_recognize(df, **common).collect()
    assert out[0].s == 5 and isinstance(out[0].s, int)
    # SKIP TO NEXT ROW restarts at match-start+1 → overlapping matches
    out2 = match_recognize(df, **common, after_match="to_next_row").collect()
    assert sorted((r.f, r.s) for r in out2) == [(1, 5), (2, 3)]


def test_match_recognize_sql_via_engine(spark):
    """The reference corpus statement shape (syntax-test.fsql:467-482)
    through the engine's SQL interception path."""
    from flink_sql_toolkit_spark.engine import Engine

    engine = Engine(spark)
    sess = engine.open_session("mr_sql_test")
    sess.spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, s), 50.0 + s) for s in range(3)
        ] + [(1, dt.datetime(2024, 1, 1, 0, 0, 3), 150.0)],
        ["customer_id", "order_time", "price"],
    ).createOrReplaceTempView("orders_mr")
    op = sess.execute_statement("""
        SELECT *
        FROM orders_mr
        MATCH_RECOGNIZE (
            PARTITION BY customer_id
            ORDER BY order_time
            MEASURES
                FIRST(A.order_time) AS start_time,
                LAST(B.order_time) AS end_time,
                AVG(A.price) AS avg_price
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE
                A AS A.price < 100,
                B AS B.price >= 100
        )""")
    assert [c["name"] for c in op._columns] == [
        "customer_id", "start_time", "end_time", "avg_price"
    ]
    rows = op.fetch()["data"]
    assert len(rows) == 1
    assert rows[0][3] == pytest.approx(51.0)
    # ALL ROWS PER MATCH: every matched input row, running measures
    op2 = sess.execute_statement(
        "SELECT * FROM orders_mr MATCH_RECOGNIZE (PARTITION BY customer_id "
        "ORDER BY order_time MEASURES COUNT(A.*) AS n ALL ROWS PER MATCH "
        "PATTERN (A+) DEFINE A AS A.price < 100)"
    )
    assert [c["name"] for c in op2._columns] == [
        "customer_id", "order_time", "price", "n"
    ]
    assert [r[3] for r in op2.fetch()["data"]] == [1, 2, 3]  # running COUNT
    sess.close()


def test_match_recognize_rejects_unsupported(spark):
    df = spark.createDataFrame([("k", 1)], ["k", "seq"])
    with pytest.raises(ValueError):
        # anchors are outside the subset ({n,m} itself is supported, r6)
        match_recognize(df, ["k"], ["seq"], "^ A $", {}, {"x": "FIRST(A.seq)"})
    with pytest.raises(ValueError):
        # malformed bound body
        match_recognize(df, ["k"], ["seq"], "A{2,1}", {}, {"x": "FIRST(A.seq)"})
    with pytest.raises(ValueError):
        match_recognize(df, ["k"], ["seq"], "A | ", {}, {"x": "FIRST(A.seq)"})
    with pytest.raises(ValueError):
        match_recognize(df, ["k"], ["seq"], "(A B", {}, {"x": "FIRST(A.seq)"})
    with pytest.raises(ValueError):
        match_recognize(df, ["k"], ["seq"], "A", {}, {"x": "STDDEV(A.seq)"})
    with pytest.raises(ValueError):
        match_recognize(df, ["k"], ["seq"], "A", {}, {"x": "FIRST(A.seq)"}, after_match="to_last_a")
    with pytest.raises(ValueError):
        # SKIP TO a symbol the pattern doesn't contain
        match_recognize(df, ["k"], ["seq"], "A", {}, {"x": "FIRST(A.seq)"}, after_match="to_last Z")


def test_match_recognize_nested_group_pattern(spark):
    """((A B)+ C): one-or-more A-B pairs followed by a C — the
    quantified-group shape the reference grammar declares
    (tmLanguage.json:363-367). Greedy: the pair run extends as far
    as possible before C."""
    rows = [
        ("k", 1, "a"), ("k", 2, "b"), ("k", 3, "a"), ("k", 4, "b"),
        ("k", 5, "c"),
        ("k", 6, "a"), ("k", 7, "c"),          # dangling A: (A B)+ fails
        ("k", 8, "a"), ("k", 9, "b"), ("k", 10, "c"),
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="(A B)+ C",
        define={"A": "t = 'a'", "B": "t = 'b'", "C": "t = 'c'"},
        measures={
            "start": "FIRST(A.seq)", "end_": "LAST(C.seq)",
            "pairs": "COUNT(A.*)",
        },
    ).collect()
    assert sorted((r.start, r.end_, r.pairs) for r in out) == [
        (1, 5, 2), (8, 10, 1)
    ]


def test_match_recognize_group_alternation_and_star(spark):
    """(A | B)* C — alternation inside a starred group; every row
    before the C classifies as A (preferred branch) or B."""
    rows = [("k", 1, "a"), ("k", 2, "b"), ("k", 3, "c"), ("k", 4, "c")]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="(A | B)* C",
        define={"A": "t = 'a'", "B": "t = 'b'", "C": "t = 'c'"},
        measures={"na": "COUNT(A.*)", "nb": "COUNT(B.*)", "c_seq": "FIRST(C.seq)"},
    ).collect()
    assert sorted((r.na, r.nb, r.c_seq) for r in out) == [(0, 0, 4), (1, 1, 3)]


def test_match_recognize_skip_to_last(spark):
    """A B+ with AFTER MATCH SKIP TO LAST B: the next match attempt
    re-anchors AT the last B row, so a B row that also satisfies A
    can start the following match (overlapping chains)."""
    rows = [("k", 1, 10), ("k", 2, 20), ("k", 3, 30), ("k", 4, 40)]
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    common = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B+",
        define={"A": "true", "B": "v > PREV(v)"},
        measures={"f": "FIRST(A.seq)", "l": "LAST(B.seq)"},
    )
    # SKIP PAST LAST ROW: one maximal chain 1→4
    assert [(r.f, r.l) for r in match_recognize(df, **common).collect()] == [(1, 4)]
    # SKIP TO LAST B re-anchors at row 4 → no further match (no B after)
    out = match_recognize(df, **common, after_match="to_last B").collect()
    assert [(r.f, r.l) for r in out] == [(1, 4)]
    # rows where chains break: 1..3 ascending, 4 drops, 5..6 ascending
    rows2 = [("k", 1, 10), ("k", 2, 20), ("k", 3, 30), ("k", 4, 5), ("k", 5, 50)]
    df2 = spark.createDataFrame(rows2, ["k", "seq", "v"])
    out2 = match_recognize(df2, **common, after_match="to_last B").collect()
    # chain 1→3; re-anchor AT row 3: A=row3 but B fails at row4
    # (5 < 30); scan on: A=row4, B=row5 (50 > 5) → second match 4→5
    assert sorted((r.f, r.l) for r in out2) == [(1, 3), (4, 5)]


def test_match_recognize_skip_to_first_infinite_loop_rejected(spark):
    rows = [("k", 1, "a"), ("k", 2, "b")]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    with pytest.raises(Exception, match="infinite loop"):
        match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern="A B",
            define={"A": "t = 'a'", "B": "t = 'b'"},
            measures={"f": "FIRST(A.seq)"},
            after_match="to_first A",
        ).collect()


def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"payload")
    w, h = decode_image(b"payload", deterministic_fake=True)
    assert 64 <= w < 256 and 64 <= h < 256
    assert (w, h) == decode_image(b"payload", deterministic_fake=True)


def test_media_feature_schema(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG12345678"), "image/png")],
        "doc_id long, payload binary, media_type string",
    )
    out = extract_media_features(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_bytes == 12
    assert r.header_hex == b"\x89PNG1234".hex()
    assert len(r.content_sha256) == 64


def test_funnel_query_counts(spark, sf_dir):
    out = match_recognize_funnel(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r.n_before >= 1 for r in out)
    assert all(r.start_ts <= r.purchase_ts for r in out)


def test_match_recognize_fast_path_equals_nfa_randomized(spark):
    """Property check: on random symbol sequences (runs, barriers,
    neither-rows, duplicate values) the vectorized (A+ B) fast path
    and the generic NFA produce identical matches and measures."""
    import random

    rng = random.Random(20260813)
    rows = [
        (f"k{rng.randrange(20)}", i, rng.randrange(-5, 50), rng.choice("aabbn"))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "v", "t"])
    measures = {
        "f": "FIRST(A.seq)", "l": "LAST(A.seq)", "n": "COUNT(A.*)",
        "avg_v": "AVG(A.v)", "sum_v": "SUM(A.v)",
        "min_v": "MIN(A.v)", "max_v": "MAX(A.v)", "b_v": "LAST(B.v)",
    }
    common = dict(
        partition_by=["k"], order_by=["seq"],
        define={"A": "t = 'a'", "B": "t = 'b'"}, measures=measures,
    )
    fast = match_recognize(df, pattern="A+ B", **common).collect()
    # Z matches nothing → same language, but 3 tokens forces the NFA
    nfa = match_recognize(
        df, pattern="A+ B Z?",
        partition_by=["k"], order_by=["seq"],
        define={"A": "t = 'a'", "B": "t = 'b'", "Z": "false"},
        measures=measures,
    ).collect()
    as_tuples = lambda out: sorted(  # noqa: E731
        (r.k, r.f, r.l, r.n, r.avg_v, r.sum_v, r.min_v, r.max_v, r.b_v) for r in out
    )
    assert len(fast) > 20  # the generator actually produced matches
    assert as_tuples(fast) == as_tuples(nfa)


def test_match_recognize_all_rows_per_match(spark):
    """ALL ROWS PER MATCH emits every matched input row with RUNNING
    measures over the match prefix."""
    rows = [
        ("k", 1, 50.0, "a"), ("k", 2, 52.0, "a"), ("k", 3, 150.0, "b"),
        ("k", 4, 99.0, "n"),  # not part of any match
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "v", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B",
        define={"A": "t = 'a'", "B": "t = 'b'"},
        measures={"avg_a": "AVG(A.v)", "n_a": "COUNT(A.*)", "b_v": "LAST(B.v)"},
        all_rows=True,
    ).collect()
    got = [(r.seq, r.v, r.avg_a, r.n_a, r.b_v) for r in sorted(out, key=lambda r: r.seq)]
    assert got == [
        (1, 50.0, 50.0, 1, None),
        (2, 52.0, 51.0, 2, None),
        (3, 150.0, 51.0, 2, 150.0),
    ]
    with pytest.raises(ValueError, match="collides"):
        match_recognize(
            df, ["k"], ["seq"], "A+ B",
            {"A": "t = 'a'", "B": "t = 'b'"}, {"v": "LAST(B.v)"}, all_rows=True,
        )


def test_classifier_and_match_number(spark):
    rows = [
        ("k", 1, "a"), ("k", 2, "b"),        # match 1
        ("k", 3, "a"), ("k", 4, "a"), ("k", 5, "b"),  # match 2
        ("j", 1, "a"), ("j", 2, "b"),        # other key → numbering restarts
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    common = dict(
        partition_by=["k"], order_by=["seq"],
        define={"A": "t = 'a'", "B": "t = 'b'"},
        measures={"mn": "MATCH_NUMBER()", "cls": "CLASSIFIER()", "f": "FIRST(A.seq)"},
    )
    # fast path (A+ B): FINAL classifier is the B row's symbol
    fast = match_recognize(df, pattern="A+ B", **common).collect()
    assert sorted((r.k, r.mn, r.cls, r.f) for r in fast) == [
        ("j", 1, "B", 1), ("k", 1, "B", 1), ("k", 2, "B", 3),
    ]
    # generic NFA must agree
    nfa = match_recognize(
        df, pattern="A+ B Z?",
        partition_by=["k"], order_by=["seq"],
        define={"A": "t = 'a'", "B": "t = 'b'", "Z": "false"},
        measures=common["measures"],
    ).collect()
    assert sorted((r.k, r.mn, r.cls, r.f) for r in nfa) == sorted(
        (r.k, r.mn, r.cls, r.f) for r in fast
    )
    # ALL ROWS: running classifier is the current row's symbol
    all_rows = match_recognize(df, pattern="A+ B", all_rows=True, **common).collect()
    k1 = [(r.seq, r.cls, r.mn) for r in sorted(all_rows, key=lambda r: (r.k, r.seq)) if r.k == "k"]
    assert k1 == [(1, "A", 1), (2, "B", 1), (3, "A", 2), (4, "A", 2), (5, "B", 2)]


def test_match_recognize_alternation_ordered_choice(spark):
    """PATTERN (P | H): a row satisfying both branches classifies as
    the LEFTMOST branch (SQL:2016 ordered choice)."""
    rows = [
        ("u", 1, "purchase", 10.0),   # P only
        ("u", 2, "view", 90.0),       # H only
        ("u", 3, "purchase", 99.0),   # both -> must be P
        ("u", 4, "view", 5.0),        # neither -> no match
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "t", "v"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="P | H",
        define={"P": "t = 'purchase'", "H": "v > 75"},
        measures={"cls": "CLASSIFIER()", "mn": "MATCH_NUMBER()",
                  "p_seq": "FIRST(P.seq)", "h_seq": "FIRST(H.seq)"},
    ).collect()
    got = sorted((r.mn, r.cls, r.p_seq, r.h_seq) for r in out)
    assert got == [(1, "P", 1, None), (2, "H", None, 2), (3, "P", 3, None)]


def test_match_recognize_alternation_multi_token_branch(spark):
    """PATTERN (A B | C): the two-row branch is preferred where it
    fits; SKIP PAST LAST ROW advances past the whole branch match."""
    rows = [
        ("u", 1, "a"),  # A
        ("u", 2, "b"),  # B -> match 1 = (A B), skips past seq 2
        ("u", 3, "c"),  # match 2 = (C)
        ("u", 4, "a"),  # A with no following B -> no match
        ("u", 5, "c"),  # match 3 = (C)
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B | C",
        define={"A": "t = 'a'", "B": "t = 'b'", "C": "t = 'c'"},
        measures={"cls": "CLASSIFIER()", "mn": "MATCH_NUMBER()",
                  "a_seq": "FIRST(A.seq)", "c_seq": "FIRST(C.seq)"},
    ).collect()
    got = sorted((r.mn, r.cls, r.a_seq, r.c_seq) for r in out)
    assert got == [(1, "B", 1, None), (2, "C", None, 3), (3, "C", None, 5)]


def test_match_recognize_alternation_sql_path(spark):
    """Alternation through the MATCH_RECOGNIZE SQL clause."""
    from flink_sql_toolkit_spark.dialect.mr_sql import rewrite_match_recognize_sql

    rows = [("u", 1, "x"), ("u", 2, "y"), ("u", 3, "z")]
    spark.createDataFrame(rows, ["k", "seq", "t"]).createOrReplaceTempView("alt_src")
    stmt = rewrite_match_recognize_sql(
        spark,
        """
        SELECT k, cls FROM alt_src
        MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY seq
            MEASURES CLASSIFIER() AS cls
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (X | Y)
            DEFINE X AS X.t = 'x', Y AS Y.t = 'y'
        )
        """,
    )
    got = sorted(r.cls for r in spark.sql(stmt).collect())
    assert got == ["X", "Y"]


def test_match_recognize_permute(spark):
    """PATTERN (PERMUTE(A, B)) = A B | B A (SQL:2016 expansion in
    declaration order): matches both orderings; a lone symbol with no
    partner does not match."""
    rows = [
        ("u", 1, "a"),  # A
        ("u", 2, "b"),  # B -> match 1 via branch (A B)
        ("u", 3, "b"),  # B
        ("u", 4, "a"),  # A -> match 2 via branch (B A)
        ("u", 5, "a"),  # A alone -> no match
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="PERMUTE(A, B)",
        define={"A": "t = 'a'", "B": "t = 'b'"},
        measures={"cls": "CLASSIFIER()", "mn": "MATCH_NUMBER()",
                  "a_seq": "FIRST(A.seq)", "b_seq": "FIRST(B.seq)"},
    ).collect()
    got = sorted((r.mn, r.cls, r.a_seq, r.b_seq) for r in out)
    # match 1: branch A B -> last row is B; match 2: branch B A -> last row is A
    assert got == [(1, "B", 1, 2), (2, "A", 4, 3)]


def test_match_recognize_permute_equals_manual_alternation(spark):
    """PERMUTE(X, Y, Z) must agree with its hand-written 6-branch
    alternation on a randomized-ish event tape."""
    tape = "xyzzyxzxyyzxzyx"
    rows = [("u", i, c) for i, c in enumerate(tape)]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    common = dict(
        partition_by=["k"], order_by=["seq"],
        define={"X": "t = 'x'", "Y": "t = 'y'", "Z": "t = 'z'"},
        measures={"mn": "MATCH_NUMBER()", "cls": "CLASSIFIER()",
                  "fx": "FIRST(X.seq)", "fy": "FIRST(Y.seq)", "fz": "FIRST(Z.seq)"},
    )
    perm = match_recognize(df, pattern="PERMUTE(X, Y, Z)", **common).collect()
    manual = match_recognize(
        df,
        pattern="X Y Z | X Z Y | Y X Z | Y Z X | Z X Y | Z Y X",
        **common,
    ).collect()
    key = lambda r: (r.mn, r.cls, r.fx, r.fy, r.fz)  # noqa: E731
    assert sorted(map(key, perm)) == sorted(map(key, manual))
    assert len(perm) > 0


def test_match_recognize_permute_sql_path(spark):
    """PERMUTE through the SQL clause — exercises balanced-paren
    PATTERN extraction (nested parens inside PATTERN (...))."""
    from flink_sql_toolkit_spark.dialect.mr_sql import rewrite_match_recognize_sql

    rows = [("u", 1, "b"), ("u", 2, "a"), ("u", 3, "a"), ("u", 4, "b")]
    spark.createDataFrame(rows, ["k", "seq", "t"]).createOrReplaceTempView(
        "permute_src"
    )
    stmt = rewrite_match_recognize_sql(
        spark,
        """
        SELECT k, cls, fa FROM permute_src
        MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY seq
            MEASURES CLASSIFIER() AS cls, FIRST(A.seq) AS fa
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (PERMUTE(A, B))
            DEFINE A AS A.t = 'a', B AS B.t = 'b'
        )
        """,
    )
    got = sorted((r.cls, r.fa) for r in spark.sql(stmt).collect())
    # rows 1-2 match branch (B A) ending on A; rows 3-4 match (A B) ending on B
    assert got == [("A", 2), ("B", 3)]


def test_match_recognize_permute_group_factor_rejected(spark):
    """PERMUTE inside a larger pattern is supported now; only
    parenthesized-GROUP factors remain outside the subset."""
    rows = [("u", 1, "a")]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    with pytest.raises(NotImplementedError, match="PERMUTE"):
        match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern="PERMUTE((A B), C)",
            define={"A": "t = 'a'", "B": "t = 'b'", "C": "t = 'c'"},
            measures={"cls": "CLASSIFIER()"},
        )


def _png(w, h):
    import struct
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0) + b"\x00" * 4)


def _jpeg(w, h):
    import struct
    # SOI, APP0 stub, SOF0, (truncated — probe only needs headers)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof0


def _gif(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 3


def _wav(rate, channels, seconds):
    import struct
    byte_rate = rate * channels * 2
    data = b"\x00" * (byte_rate * seconds)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    dat = b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(dat)) + b"WAVE" + fmt + dat


def _mp4(duration_s, timescale=1000):
    import struct
    mvhd_body = b"\x00" * 4 + b"\x00" * 8 + struct.pack(
        ">II", timescale, duration_s * timescale) + b"\x00" * 80
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    return ftyp + moov


def test_media_probe_real_headers():
    """The header parsers are real from-spec decoders — bit-valid
    synthesized containers round-trip their declared geometry."""
    from flink_sql_toolkit_spark.operators.media_probe import probe_media

    png = probe_media(_png(640, 480))
    assert (png.format, png.kind, png.width, png.height) == ("png", "image", 640, 480)
    jpg = probe_media(_jpeg(1920, 1080))
    assert (jpg.format, jpg.width, jpg.height) == ("jpeg", 1920, 1080)
    gif = probe_media(_gif(32, 16))
    assert (gif.format, gif.width, gif.height) == ("gif", 32, 16)
    wav = probe_media(_wav(16000, 2, 3))
    assert (wav.format, wav.kind, wav.channels, wav.sample_rate, wav.duration_ms) == (
        "wav", "audio", 2, 16000, 3000)
    mp4 = probe_media(_mp4(42))
    assert (mp4.format, mp4.kind, mp4.duration_ms) == ("mp4", "video", 42000)
    unk = probe_media(b"just some text")
    assert (unk.format, unk.kind) == ("unknown", "unknown")


def test_decode_image_real_headers_no_fake_needed():
    w, h = decode_image(_png(800, 600))
    assert (w, h) == (800, 600)
    assert decode_image(_jpeg(64, 32)) == (64, 32)


def test_probe_media_features_through_spark(spark):
    """The typed-metadata extraction runs through Arrow-batched
    mapInPandas with nullable int columns for absent fields."""
    from flink_sql_toolkit_spark.operators.multimodal import probe_media_features

    rows = [
        (0, bytearray(_png(10, 20))),
        (1, bytearray(_wav(8000, 1, 2))),
        (2, bytearray(_mp4(5))),
        (3, bytearray(b"not media")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r.doc_id: r for r in probe_media_features(df).collect()}
    assert (out[0].format, out[0].width, out[0].height) == ("png", 10, 20)
    assert (out[1].kind, out[1].sample_rate, out[1].duration_ms) == ("audio", 8000, 2000)
    assert (out[2].format, out[2].duration_ms) == ("mp4", 5000)
    assert out[3].format == "unknown" and out[3].width is None


def test_match_recognize_long_run_no_recursion_limit(spark):
    """A 5000-row A-run through the GENERIC NFA (3-token pattern
    forces it off the numpy fast path) must not hit Python's
    recursion limit — symbol quantifiers scan iteratively."""
    rows = [("k", i, "a") for i in range(5000)] + [("k", 5000, "b")]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B Z?",
        define={"A": "t = 'a'", "B": "t = 'b'", "Z": "false"},
        measures={"n": "COUNT(A.*)", "b": "FIRST(B.seq)"},
    ).collect()
    assert [(r.n, r.b) for r in out] == [(5000, 5000)]


def test_cross_symbol_define_first_nav_and_group(spark):
    """C fires only when its value exceeds the FIRST A row's value —
    navigation against the match context, inside a quantified
    pattern (A B+ C)."""
    rows = [("k", 1, 10.0, "a"), ("k", 2, 1.0, "b"), ("k", 3, 2.0, "b"),
            ("k", 4, 15.0, "c"),
            ("k", 5, 50.0, "a"), ("k", 6, 1.0, "b"), ("k", 7, 20.0, "c")]
    df = spark.createDataFrame(rows, ["k", "seq", "v", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B+ C",
        define={
            "A": "t = 'a'",
            "B": "t = 'b'",
            "C": "t = 'c' AND C.v > FIRST(A.v)",
        },
        measures={"a": "FIRST(A.seq)", "c": "FIRST(C.seq)", "nb": "COUNT(B.*)"},
    ).collect()
    # first window: C.v=15 > A.v=10 → match; second: 20 > 50 fails
    assert sorted((r.a, r.c, r.nb) for r in out) == [(1, 4, 2)]


def test_cross_symbol_define_null_is_unknown(spark):
    """A NULL navigated value makes the predicate UNKNOWN → row not
    matched (SQL three-valued logic), not an error."""
    rows = [("k", 1, None, "a"), ("k", 2, 20.0, "b")]
    df = spark.createDataFrame(rows, "k string, seq int, v double, t string")
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B",
        define={"A": "t = 'a'", "B": "t = 'b' AND B.v > A.v"},
        measures={"b": "FIRST(B.seq)"},
    ).collect()
    assert out == []


def test_cross_symbol_define_own_running_nav_rejected(spark):
    df = spark.createDataFrame([("k", 1, 1.0)], ["k", "seq", "v"])
    with pytest.raises(NotImplementedError, match="running"):
        match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern="A B+",
            define={"B": "B.v > LAST(B.v) AND B.v > A.v"},
            measures={"n": "COUNT(B.*)"},
        ).collect()


def test_cross_symbol_define_sql_clause(spark):
    """The Flink-classic price-dip shape through the SQL surface:
    recovery row must beat the pre-dip price."""
    from flink_sql_toolkit_spark.dialect.mr_sql import rewrite_match_recognize_sql

    rows = [("u", 1, 100.0), ("u", 2, 90.0), ("u", 3, 80.0), ("u", 4, 120.0)]
    spark.createDataFrame(rows, ["k", "seq", "price"]).createOrReplaceTempView(
        "ticks_mr"
    )
    stmt = rewrite_match_recognize_sql(
        spark,
        """
        SELECT * FROM ticks_mr
        MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES FIRST(S.price) AS start_price,
                     LAST(U.price) AS recovery_price
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (S D+ U)
            DEFINE D AS D.price < PREV(D.price),
                   U AS U.price > S.price
        )
        """,
    )
    out = spark.sql(stmt).collect()
    assert [(r.start_price, r.recovery_price) for r in out] == [(100.0, 120.0)]


def test_running_vs_final_measures_all_rows(spark):
    """Explicit RUNNING/FINAL prefixes (SQL:2016 12.4): under ALL
    ROWS PER MATCH, RUNNING COUNT grows per row while FINAL COUNT is
    the whole-match value on every row; under ONE ROW PER MATCH both
    are final (covered implicitly by every other test)."""
    rows = [("k", 1, "a"), ("k", 2, "a"), ("k", 3, "b")]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B",
        define={"A": "t = 'a'", "B": "t = 'b'"},
        measures={
            "rc": "RUNNING COUNT(A.*)",
            "fc": "FINAL COUNT(A.*)",
            "fcls": "FINAL CLASSIFIER()",
        },
        all_rows=True,
    ).collect()
    got = sorted((r.seq, r.rc, r.fc, r.fcls) for r in out)
    assert got == [(1, 1, 2, "B"), (2, 2, 2, "B"), (3, 2, 2, "B")]


def test_permute_inside_larger_pattern(spark):
    """PERMUTE composes with surrounding pattern elements now that it
    expands to an ordinary alternation group: S PERMUTE(A, B) means
    S then A B or B A."""
    rows = [("k", 1, "s"), ("k", 2, "b"), ("k", 3, "a"),
            ("k", 4, "s"), ("k", 5, "a"), ("k", 6, "b"),
            ("k", 7, "s"), ("k", 8, "a"), ("k", 9, "x")]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="S PERMUTE(A, B)",
        define={"S": "t = 's'", "A": "t = 'a'", "B": "t = 'b'"},
        measures={"s": "FIRST(S.seq)", "a": "FIRST(A.seq)", "b": "FIRST(B.seq)"},
    ).collect()
    assert sorted((r.s, r.a, r.b) for r in out) == [(1, 3, 2), (4, 5, 6)]


def test_nfa_matches_regex_oracle_randomized(spark):
    """Property test for the tree NFA: SQL:2016 row-pattern
    preference (greedy quantifiers, leftmost alternation branch,
    non-empty match, SKIP PAST LAST ROW restart) is exactly Python
    re's leftmost-greedy semantics when each row satisfies at most
    one symbol. Random patterns × random row sequences are compared
    span-for-span against the independent regex engine."""
    import random
    import re as pyre

    rng = random.Random(20260813)

    def rand_item(depth):
        q = rng.choice(["", "", "+", "*", "?"])
        if depth > 0 and rng.random() < 0.4:
            inner = rand_alt(depth - 1)
            return f"( {inner} ){q}", None
        sym = rng.choice("ABC")
        return f"{sym}{q}", sym

    def rand_seq(depth):
        return " ".join(rand_item(depth)[0] for _ in range(rng.randint(1, 3)))

    def rand_alt(depth):
        branches = [rand_seq(depth) for _ in range(rng.randint(1, 2))]
        return " | ".join(branches)

    def to_regex(pat):
        out = pat.replace("( ", "(?:").replace(" )", ")")
        for sym, ch in (("A", "a"), ("B", "b"), ("C", "c")):
            out = out.replace(sym, ch)
        return pyre.compile(out.replace(" ", ""))

    def regex_spans(rx, s):
        spans, pos = [], 0
        while pos < len(s):
            m = rx.match(s, pos)
            if m and m.end() > m.start():
                spans.append((m.start(), m.end() - 1))
                pos = m.end()
            else:
                pos += 1
        return spans

    tested = 0
    for _trial in range(40):
        if tested >= 8:
            break
        pat = rand_alt(2)
        rx = to_regex(pat)
        seqs = {
            f"k{i}": "".join(rng.choice("abcx") for _ in range(rng.randint(0, 14)))
            for i in range(6)
        }
        rows = [
            (k, i, ch) for k, s in seqs.items() for i, ch in enumerate(s)
        ]
        if not rows:
            continue
        df = spark.createDataFrame(rows, ["k", "seq", "t"])
        try:
            out = match_recognize(
                df,
                partition_by=["k"],
                order_by=["seq"],
                pattern=pat,
                define={"A": "t = 'a'", "B": "t = 'b'", "C": "t = 'c'"},
                measures={"mn": "MATCH_NUMBER()"},
                all_rows=True,
            ).collect()
        except NotImplementedError:
            continue  # nullable pattern — rejected by design
        tested += 1
        got: dict = {}
        for r in out:
            lo, hi = got.setdefault(r.k, {}).setdefault(r.mn, [10**9, -1])
            got[r.k][r.mn] = [min(lo, r.seq), max(hi, r.seq)]
        for k, s in seqs.items():
            expected = regex_spans(rx, s)
            actual = [tuple(v) for _, v in sorted(got.get(k, {}).items())]
            assert actual == expected, (
                f"pattern {pat!r} key {k} seq {s!r}: "
                f"engine {actual} != regex {expected}"
            )


def test_nullable_pattern_rejected(spark):
    """Flink's restriction, adopted verbatim: a pattern whose
    preferred match can be empty is rejected up front."""
    df = spark.createDataFrame([("k", 1, "a")], ["k", "seq", "t"])
    for pat in ("A*", "A? B?", "( A+ | B* ) C?"):
        with pytest.raises(NotImplementedError, match="empty matches"):
            match_recognize(
                df,
                partition_by=["k"],
                order_by=["seq"],
                pattern=pat,
                define={"A": "t = 'a'", "B": "t = 'b'", "C": "t = 'c'"},
                measures={"n": "COUNT(A.*)"},
            )


def test_cross_symbol_null_equality_is_unknown(spark):
    """SQL three-valued logic for =/<> too: NULL = x and NULL <> x
    are UNKNOWN -> no match (a plain-None evaluator would answer
    False/True and silently invert <>)."""
    rows = [("k", 1, None, "a"), ("k", 2, 20.0, "b")]
    df = spark.createDataFrame(rows, "k string, seq int, v double, t string")
    for op in ("=", "<>"):
        out = match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern="A B",
            define={"A": "t = 'a'", "B": f"t = 'b' AND B.v {op} A.v"},
            measures={"b": "FIRST(B.seq)"},
        ).collect()
        assert out == [], f"NULL {op} x must be UNKNOWN, not a match"
    # IS NULL still works against the sentinel
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B",
        define={"A": "t = 'a'", "B": "t = 'b' AND A.v IS NULL"},
        measures={"b": "FIRST(B.seq)"},
    ).collect()
    assert [r.b for r in out] == [2]


def test_cross_symbol_unknown_qualifier_in_nav_rejected(spark):
    """A typo'd FIRST/LAST qualifier in a dynamic DEFINE must fail at
    compile, not silently navigate to nothing and never match. (With
    no genuine cross-symbol ref the condition stays on the static
    JVM path, where Spark raises its own analysis error.)"""
    df = spark.createDataFrame([("k", 1, 1.0)], ["k", "seq", "v"])
    with pytest.raises(NotImplementedError, match="unknown qualifier"):
        match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern="A B",
            # A.v makes it dynamic; AA is a typo, not a symbol
            define={"B": "B.v > A.v AND B.v > LAST(AA.v)"},
            measures={"n": "COUNT(B.*)"},
        )


def test_cross_symbol_division_sql_semantics(spark):
    """Int '/' in a dynamic DEFINE must truncate toward zero (Flink),
    not Python-floor/true-divide: -7 / 2 = -3, not -3.5 or -4."""
    rows = [("k", 1, -7), ("k", 2, -3)]
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B",
        define={"B": "B.v = A.v / 2"},
        measures={"bv": "LAST(B.v)"},
    ).collect()
    assert [r.bv for r in out] == [-3]


def test_cross_symbol_modulo_sql_semantics(spark):
    """'%' in a dynamic DEFINE carries the dividend's sign (SQL MOD):
    -7 % 2 = -1, where Python's % gives 1."""
    rows = [("k", 1, 2), ("k", 2, -7)]
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A B",
        define={"B": "B.v % A.v = 0 - 1"},
        measures={"bv": "LAST(B.v)"},
    ).collect()
    assert [r.bv for r in out] == [-7]


def test_final_measures_dict_not_mutated(spark):
    """The caller's measures dict must survive two calls with FINAL
    semantics intact."""
    rows = [("k", 1, "a"), ("k", 2, "a"), ("k", 3, "b")]
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    measures = {"fc": "FINAL COUNT(A.*)"}
    common = dict(
        partition_by=["k"], order_by=["seq"], pattern="A+ B",
        define={"A": "t = 'a'", "B": "t = 'b'"}, measures=measures,
        all_rows=True,
    )
    first = sorted(r.fc for r in match_recognize(df, **common).collect())
    assert measures == {"fc": "FINAL COUNT(A.*)"}
    second = sorted(r.fc for r in match_recognize(df, **common).collect())
    assert first == second == [2, 2, 2]


def test_quantified_group_long_run(spark):
    """(A B)+ C over ~1500 pair repetitions — the recursion-limit
    guard must carry it (one frame per repetition)."""
    rows = []
    for i in range(1500):
        rows.append(("k", 2 * i, "a"))
        rows.append(("k", 2 * i + 1, "b"))
    rows.append(("k", 3000, "c"))
    df = spark.createDataFrame(rows, ["k", "seq", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="(A B)+ C",
        define={"A": "t = 'a'", "B": "t = 'b'", "C": "t = 'c'"},
        measures={"pairs": "COUNT(A.*)"},
    ).collect()
    assert [r.pairs for r in out] == [1500]


def test_mp4_largesize_and_to_eof_boxes():
    """ISO-BMFF 64-bit largesize (mdat > 4 GiB shape) and size==0
    (box-to-EOF) headers must not hide a later/earlier moov."""
    import struct

    from flink_sql_toolkit_spark.operators.media_probe import probe_media

    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    mvhd_body = b"\x00" * 4 + b"\x00" * 8 + struct.pack(">II", 1000, 7000) + b"\x00" * 80
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    # largesize mdat before moov (size field == 1, 64-bit size follows)
    payload = b"\x00" * 32
    mdat_large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    info = probe_media(ftyp + mdat_large + moov)
    assert (info.format, info.duration_ms) == ("mp4", 7000)
    # trailing size==0 box (extends to EOF) before... after moov
    free_to_eof = struct.pack(">I", 0) + b"free" + b"\x00" * 10
    info2 = probe_media(ftyp + moov + free_to_eof)
    assert (info2.format, info2.duration_ms) == ("mp4", 7000)


def test_ogg_ts_ms_is_timezone_independent(spark):
    """_ts_ms must be the true epoch of the UTC op_ts string, not a
    session-timezone-shifted value (debezium/canal carry real epoch
    millis — mixing CDC sources would mis-order events)."""
    import json as _json

    from flink_sql_toolkit_spark.sources.connectors import _decode_payload
    from tests.test_connectors import kafka_frame, table_for

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = {"before": None, "after": {"id": 1, "name": "x"}, "op_type": "I",
              "op_ts": "2020-05-13 15:40:06.000000"}
        raw = kafka_frame(spark, [_json.dumps(ev)])
        out = _decode_payload(raw, table_for("ogg-json")).collect()
        assert out[0]._ts_ms == 1589384406000
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def _bmp(w, h):
    import struct
    # valid BITMAPINFOHEADER: reserved=0, dib=40, planes=1
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", 14 + 40 + len(dib), 0, 0, 54) + dib


def test_bmp_probe_validates_header_fields():
    """ASCII text starting 'BM' must not be misread as a bitmap —
    reserved/DIB-size/planes are validated, and a real BMP parses."""
    from flink_sql_toolkit_spark.operators.media_probe import probe_media

    text = b"BMW sales rose sharply in the third quarter of the year."
    assert probe_media(text).format == "unknown"
    bmp = probe_media(_bmp(320, 200))
    assert (bmp.format, bmp.width, bmp.height) == ("bmp", 320, 200)
    # bottom-up rows (negative height) normalize to positive
    assert probe_media(_bmp(320, -200)).height == 200


def test_mp4_truncated_v1_mvhd_degrades():
    """A version-1 mvhd cut off mid-duration must yield MediaInfo
    ('mp4', ...) without duration — not a struct.error from the
    mapInPandas job."""
    import struct

    from flink_sql_toolkit_spark.operators.media_probe import probe_media

    # v1 mvhd with only 24 bytes of body (needs 32 for the v1 reads)
    mvhd_body = b"\x01" + b"\x00" * 23
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    info = probe_media(ftyp + moov)
    assert (info.format, info.kind, info.duration_ms) == ("mp4", "video", None)


def test_match_recognize_bounded_quantifiers(spark):
    """SQL:2016 bounded quantifiers {n} {n,m} {n,} (reference grammar
    tmLanguage.json:363-367): greedy takes as many rows as the bound
    allows, earliest match start wins."""

    def run(pattern, events):
        rows = [("k", i + 1, e) for i, e in enumerate(events)]
        df = spark.createDataFrame(rows, "k string, seq long, ev string")
        out = match_recognize(
            df, ["k"], ["seq"], pattern,
            {"A": "ev = 'a'", "B": "ev = 'b'"},
            {"s": "FIRST(A.seq)", "e": "LAST(A.seq)", "n": "COUNT(A.*)"},
        )
        return sorted(tuple(r) for r in out.select("s", "e", "n").collect())

    # exactly two: the contiguous pair immediately before the b
    assert run("A{2} B", "aaab") == [(2, 3, 2)]
    # greedy 2..3: takes 3 when available
    assert run("A{2,3} B", "aaaab") == [(2, 4, 3)]
    # at least two
    assert run("A{2,} B", "abaaab") == [(3, 5, 3)]
    # bounded tiling without a closer: greedy chunks of 3, then a
    # 2-chunk remainder; a lone trailing row stays unmatched
    assert run("A{2,3}", "aaaaa") == [(1, 3, 3), (4, 5, 2)]
    # reluctant tiling: stops at the minimum every time
    assert run("A{2,3}?", "aaaaa") == [(1, 2, 2), (3, 4, 2)]
    # reluctant +?: earliest start still wins, so the full run is
    # consumed when the closer only appears at its end
    assert run("A+? B", "aaab") == [(1, 3, 3)]
    # bounded group quantifier
    rows = [("k", i + 1, e) for i, e in enumerate("ababc")]
    df = spark.createDataFrame(rows, "k string, seq long, ev string")
    out = match_recognize(
        df, ["k"], ["seq"], "(A B){2} C",
        {"A": "ev = 'a'", "B": "ev = 'b'", "C": "ev = 'c'"},
        {"s": "FIRST(A.seq)", "e": "LAST(B.seq)", "n": "COUNT(A.*)"},
    )
    assert [tuple(r) for r in out.select("s", "e", "n").collect()] == [(1, 4, 2)]


def test_match_recognize_within_backtracks(spark):
    """PATTERN (...) WITHIN (Flink time constraint, r7): enforced
    inside the NFA, so greedy B+ backtracks to the longest IN-WINDOW
    match instead of the whole run being discarded; a pattern that
    cannot complete inside the window yields no match."""
    from datetime import datetime

    t = lambda m: datetime(2026, 1, 1, 10, m)  # noqa: E731
    rows = [
        ("u", t(0), "a"),   # A — attempt clock starts here
        ("u", t(5), "b"),   # B in window
        ("u", t(8), "b"),   # B in window
        ("u", t(15), "b"),  # B past 10:00+10min → excluded
        ("v", t(0), "a"),   # A whose only B is out of window
        ("v", t(20), "b"),
        ("w", t(0), "a"),   # boundary: B at EXACTLY first+interval is
        ("w", t(10), "b"),  # out — Flink requires gap < interval
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "t"])
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["ts"],
        pattern="A B+",
        define={"A": "t = 'a'", "B": "t = 'b'"},
        measures={"nb": "COUNT(B.ts)", "last_b": "LAST(B.ts)"},
        within_us=10 * 60 * 1_000_000,
    )
    got = {(r.k): (r.nb, r.last_b) for r in out.collect()}
    assert got == {"u": (2, t(8))}  # v, w: no match at all


def test_match_recognize_within_sql_path(spark):
    """WITHIN INTERVAL parses from the SQL clause and a non-timestamp
    ORDER BY is a typed rejection."""
    import pytest as _pytest

    from flink_sql_toolkit_spark.dialect.mr_sql import rewrite_match_recognize_sql
    from datetime import datetime

    t = lambda m: datetime(2026, 1, 1, 10, m)  # noqa: E731
    rows = [("u", t(0), "a"), ("u", t(5), "b"), ("u", t(30), "b")]
    spark.createDataFrame(rows, ["k", "ts", "t"]).createOrReplaceTempView("win_src")
    stmt = rewrite_match_recognize_sql(
        spark,
        """
        SELECT k, nb FROM win_src
        MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY ts
            MEASURES COUNT(B.ts) AS nb
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B+) WITHIN INTERVAL '10' MINUTE
            DEFINE A AS A.t = 'a', B AS B.t = 'b'
        )
        """,
    )
    got = [(r.k, r.nb) for r in spark.sql(stmt).collect()]
    assert got == [("u", 1)]  # the 10:30 B is outside the window

    rows2 = [("u", 1, "a"), ("u", 2, "b")]
    spark.createDataFrame(rows2, ["k", "seq", "t"]).createOrReplaceTempView(
        "win_bad_src"
    )
    with _pytest.raises(NotImplementedError, match="WITHIN supports"):
        rewrite_match_recognize_sql(
            spark,
            """
            SELECT k FROM win_src
            MATCH_RECOGNIZE (
                PARTITION BY k
                ORDER BY ts
                MEASURES COUNT(B.ts) AS nb
                ONE ROW PER MATCH
                AFTER MATCH SKIP PAST LAST ROW
                PATTERN (A B) WITHIN INTERVAL 10 MINUTE
                DEFINE A AS A.t = 'a', B AS B.t = 'b'
            )
            """,
        )

    with _pytest.raises(NotImplementedError, match="TIMESTAMP rowtime"):
        rewrite_match_recognize_sql(
            spark,
            """
            SELECT k FROM win_bad_src
            MATCH_RECOGNIZE (
                PARTITION BY k
                ORDER BY seq
                MEASURES COUNT(B.seq) AS nb
                ONE ROW PER MATCH
                AFTER MATCH SKIP PAST LAST ROW
                PATTERN (A B) WITHIN INTERVAL '10' MINUTE
                DEFINE A AS A.t = 'a', B AS B.t = 'b'
            )
            """,
        )


def test_measures_aggregates_skip_nulls(spark):
    """SQL NULL semantics in MEASURES (r11 differential find): COUNT
    of a column counts only non-NULL values, SUM/AVG/MIN/MAX skip
    NULLs (NULL over an all-null symbol set), AVG divides by the
    NON-NULL count — on BOTH the vectorized (A+ B) fast path and the
    generic NFA. FIRST/LAST stay navigation (a NULL row's value is
    NULL, not skipped). Before the fix, COUNT(A.v) counted NULL rows,
    the NFA's aggregates NaN-poisoned to NULL whenever any row was
    NULL, and the fast path's AVG divided by the row count."""
    rows = [
        (1, 1, "a", 10),
        (1, 2, "a", None),  # A-run ENDS with NULL (fast-path cum slot)
        (1, 3, "b", None),
        (2, 1, "a", None),  # all-NULL A-run
        (2, 2, "b", 5),
        (3, 1, "a", 7),
        (3, 2, "a", 3),
        (3, 3, "b", 1),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, t string, v long")
    measures = {
        "cnt_star": "COUNT(A.*)",
        "cnt_av": "COUNT(A.v)",
        "sum_av": "SUM(A.v)",
        "avg_av": "AVG(A.v)",
        "min_av": "MIN(A.v)",
        "max_av": "MAX(A.v)",
        "last_av": "LAST(A.v)",
        "cnt_bv": "COUNT(B.v)",
        "sum_bv": "SUM(B.v)",
    }
    expected = {
        1: (2, 1, 10, 10.0, 10, 10, None, 0, None),
        2: (1, 0, None, None, None, None, None, 1, 5),
        3: (2, 2, 10, 5.0, 3, 7, 3, 1, 1),
    }
    for pat in ("A+ B", "A{1,} B"):  # fast path vs generic NFA
        out = match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern=pat,
            define={"A": "t = 'a'", "B": "t = 'b'"},
            measures=dict(measures),
        ).collect()
        got = {
            r.k: (r.cnt_star, r.cnt_av, r.sum_av, r.avg_av, r.min_av,
                  r.max_av, r.last_av, r.cnt_bv, r.sum_bv)
            for r in out
        }
        assert got == expected, pat


def test_measures_star_outside_count_rejected(spark):
    """FIRST(A.*) has no SQL meaning — typed rejection instead of a
    KeyError('*') from the NFA's column extraction."""
    df = spark.createDataFrame([(1, 1, "a")], "k long, seq long, t string")
    with pytest.raises(ValueError, match=r"only valid inside COUNT"):
        match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern="A B",
            define={"A": "t = 'a'", "B": "t = 'b'"},
            measures={"x": "FIRST(A.*)"},
        )


def test_measures_over_unmatched_third_symbol(spark):
    """A measure over a DEFINEd symbol the two-token pattern never
    maps (COUNT(C.*) under PATTERN (A+ B)) must fall back to the
    generic NFA: COUNT = 0 and navigation/aggregates NULL — the
    vectorized fast path used to attribute everything not-A to the
    B-row (review r11)."""
    rows = [(1, 1, "a", 10), (1, 2, "b", 5)]
    df = spark.createDataFrame(rows, "k long, seq long, t string, v long")
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B",
        define={"A": "t = 'a'", "B": "t = 'b'", "C": "t = 'c'"},
        measures={
            "n_c": "COUNT(C.*)",
            "n_cv": "COUNT(C.v)",
            "first_cv": "FIRST(C.v)",
            "max_cv": "MAX(C.v)",
            "n_a": "COUNT(A.*)",
        },
    ).collect()
    assert [(r.n_c, r.n_cv, r.first_cv, r.max_cv, r.n_a) for r in out] == [
        (0, 0, None, None, 1)
    ]


def test_measures_unknown_column_rejected_at_plan_time(spark):
    """COUNT(A.typo) is a typed plan-time error, not an executor-side
    KeyError from the pandas stage (review r11)."""
    df = spark.createDataFrame([(1, 1, "a")], "k long, seq long, t string")
    with pytest.raises(ValueError, match=r"unknown column 'typo'"):
        match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern="A B",
            define={"A": "t = 'a'", "B": "t = 'b'"},
            measures={"n": "COUNT(A.typo)"},
        )


def test_probe_media_never_crashes():
    """probe_media's contract: malformed bytes degrade to 'unknown',
    never an exception (it runs inside mapInPandas). Random bytes,
    truncations of valid headers, and the nested-moov recursion bomb
    (one walk() frame per nesting level — r11: RecursionError was not
    in the degrade set) all must return a MediaInfo."""
    import random as _random
    import struct as _struct

    from flink_sql_toolkit_spark.operators.media_probe import probe_media

    rng = _random.Random(77)
    valid_prefixes = [
        b"\x89PNG\r\n\x1a\n" + bytes(20),
        b"GIF89a" + bytes(8),
        b"BM" + bytes(30),
        b"RIFF" + bytes(4) + b"WAVE" + bytes(30),
        bytes(4) + b"ftyp" + bytes(30),
        b"\xff\xd8\xff\xe0" + bytes(30),
    ]
    for _ in range(300):
        n = rng.randint(0, 64)
        payload = bytes(rng.randrange(256) for _ in range(n))
        assert probe_media(payload) is not None
    for base in valid_prefixes:
        for cut in range(len(base)):
            assert probe_media(base[:cut]) is not None
        for _ in range(50):
            b = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            assert probe_media(bytes(b)) is not None
    # nested-moov bomb: depth beyond any recursion limit
    depth = 60_000
    bomb = bytearray(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00")
    for lvl in range(depth):
        remaining = 8 * (depth - lvl)
        bomb += _struct.pack(">I", remaining) + b"moov"
    info = probe_media(bytes(bomb))
    assert info is not None  # degraded, not crashed
