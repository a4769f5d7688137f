"""Property-based tests for the dialect text layer.

The streaming SQL routers and the rewriter are regex/text-based — the
repo's highest bug-density surface (every ADVICE round found masking /
splicing edge cases there). These properties pin the invariants the
routers rely on, over arbitrary generated inputs rather than
hand-picked cases. Pure-Python: no Spark session needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_sql_toolkit_spark.dialect.rewriter import _mask, _split_args, _unmask
from flink_sql_toolkit_spark.dialect.splitter import split_statements
from flink_sql_toolkit_spark.sources.ddl import _split_top

# SQL-ish text: identifiers, operators, quotes, comments, parens
_sql_alphabet = st.sampled_from(
    list("abcXY Z019_.,;()<>'`\"*+-=\n\t") + ["--", "/*", "*/", "''"]
)
_sql_text = st.lists(_sql_alphabet, max_size=60).map("".join)


class TestMaskRoundTrip:
    @given(_sql_text)
    @settings(max_examples=300, deadline=None)
    def test_mask_unmask_identity(self, sql):
        """_unmask(_mask(x)) == x for ANY input — the routers edit the
        masked form and rely on exact restoration of every literal,
        quoted identifier, and comment."""
        masked, lits = _mask(sql)
        assert _unmask(masked, lits) == sql

    @given(_sql_text)
    @settings(max_examples=300, deadline=None)
    def test_masked_form_has_no_quotes_outside_placeholders(self, sql):
        """After masking, no raw single-quote remains outside an
        UNTERMINATED literal at end-of-input — regexes over the masked
        text must never see literal content."""
        masked, _ = _mask(sql)
        body = masked.rsplit("'", 1)[0] if masked.count("'") == 1 else masked
        if "'" in body:
            # a quote may survive only when the input ends inside an
            # unterminated literal (nothing after it to protect)
            assert sql.count("'") % 2 == 1

    @given(st.lists(st.sampled_from(["a", "'x;y'", "b", "';'", ";"]), max_size=20).map("".join))
    @settings(max_examples=200, deadline=None)
    def test_split_never_loses_text(self, script):
        """Splitting preserves every non-separator character: the
        engine dispatches each piece, so dropped text would silently
        skip statements."""
        parts = split_statements(script)
        # every returned statement is a substring of the original
        for p in parts:
            assert p.strip() == "" or p in script or p.strip() in script


class TestDepthAwareSplits:
    @given(st.lists(st.sampled_from(["a", "f(x, y)", "m<k, v>", "'l,it'", "b c"]), min_size=1, max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_split_top_respects_nesting(self, items):
        """_split_top on a comma-join of nest-free items returns
        exactly those items — commas inside (), <>, and literals never
        split."""
        joined = ", ".join(items)
        assert _split_top(joined) == items

    @given(st.lists(st.sampled_from(["INT", "MAP<STRING, INT>", "ROW<a INT, b STRING>", "ARRAY<MAP<INT, STRING>>"]), min_size=1, max_size=5))
    @settings(max_examples=200, deadline=None)
    def test_split_top_round_trips_types(self, types):
        assert _split_top(", ".join(types)) == types

    @given(st.lists(st.sampled_from(["x", "g(a, b)", "'q,r'", "t.col"]), min_size=1, max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_split_args_matches_manual_join(self, args):
        masked, _lits = _mask(", ".join(args))
        got = _split_args(masked)
        assert len(got) == len(args)


_fuzz_tokens = st.sampled_from([
    "SELECT", "FROM", "WHERE", "OVER", "(", ")", ",", "'lit'", "a", "b.c",
    "SUM", "TUMBLE", "TABLE", "DESCRIPTOR", "INTERVAL", "'5'", "SECOND",
    "ARRAY", "[", "]", "MAP", "<", ">", "CAST", "AS", "TIMESTAMP(3)", "ROW",
    "GROUPS", "BETWEEN", "PRECEDING", "CURRENT", "--x\n", "/*y*/", "0xFF",
    "UNKNOWN", "LAG", "TO_TIMESTAMP_LTZ", ";", "`q`", "''", "1.5", "*",
    "HOP", "SESSION", "CUMULATE", "TUMBLE_START", "HOP_END", "WINDOW",
    "ROWS", "FETCH", "FIRST",
])


class TestRewriteRobustness:
    @given(st.lists(_fuzz_tokens, max_size=16).map(" ".join))
    @settings(max_examples=500, deadline=None)
    def test_rewrite_never_crashes_unexpectedly(self, sql):
        """rewrite() on arbitrary token soup either returns a string or
        raises a TYPED error (ValueError/NotImplementedError) — never
        IndexError/AttributeError (a malformed-arity TUMBLE(...) used
        to IndexError inside the legacy group-window rewrite)."""
        from flink_sql_toolkit_spark.dialect.rewriter import rewrite

        try:
            out = rewrite(sql)
        except (ValueError, NotImplementedError):
            return
        assert isinstance(out, str)


class TestSynthesizeRoundTrip:
    """parse → synthesize_ddl → parse is a fixed point: SHOW CREATE
    TABLE returns the synthesized text after every ALTER, so a lossy
    round-trip would corrupt the table on the next engine restart or
    LIKE copy."""

    _types = st.sampled_from([
        "INT", "BIGINT", "DOUBLE", "STRING", "DECIMAL(10,2)", "BOOLEAN",
        "TIMESTAMP(3)", "TIMESTAMP_LTZ(3)", "BYTES", "ARRAY<STRING>",
        "MAP<STRING, INT>", "ROW<x INT, y STRING>",
    ])

    @given(
        st.lists(
            st.tuples(st.sampled_from(list("abcdefgh")), _types, st.booleans()),
            min_size=1, max_size=6, unique_by=lambda t: t[0],
        ),
        st.booleans(),  # watermark
        st.booleans(),  # primary key
        st.booleans(),  # distributed
    )
    @settings(max_examples=150, deadline=None)
    def test_fixed_point(self, cols, wm, pk, dist):
        from flink_sql_toolkit_spark.sources.ddl import (
            parse_create_table,
            synthesize_ddl,
        )

        parts = [f"{n} {t}{'' if nullable else ' NOT NULL'}" for n, t, nullable in cols]
        parts.append("ts TIMESTAMP(3)")
        if wm:
            parts.append("WATERMARK FOR ts AS ts - INTERVAL '5' SECOND")
        if pk:
            parts.append(f"PRIMARY KEY ({cols[0][0]}) NOT ENFORCED")
        ddl = f"CREATE TABLE t ({', '.join(parts)})"
        if dist:
            ddl += f" DISTRIBUTED BY HASH({cols[0][0]}) INTO 4 BUCKETS"
        ddl += " WITH ('connector'='blackhole', 'opt'='v''q')"
        t1 = parse_create_table(ddl + ";")
        t2 = parse_create_table(synthesize_ddl(t1) + ";")
        assert [(c.name, c.spark_type, c.nullable) for c in t2.columns] == [
            (c.name, c.spark_type, c.nullable) for c in t1.columns
        ]
        assert (t2.watermark is None) == (t1.watermark is None)
        if t1.watermark:
            assert t2.watermark.delay == t1.watermark.delay
        assert t2.primary_key == t1.primary_key
        assert (t2.distributed_by, t2.bucket_count) == (t1.distributed_by, t1.bucket_count)
        assert t2.options == t1.options


class TestDedupShapeRouting:
    """The rank-aware dedup router's r9 text surface (VERDICT r9 ask
    #3): _DEDUP_SHAPE's residual-conjunct capture and the rn-reference
    scan are regex routing over MASKED text — literals must never
    change a routing decision, and depth-0 operators always must."""

    _safe_conjuncts = st.sampled_from(
        [
            "v = 1",
            "v > 3",
            "v = 'a OR b'",
            "v = 'x ORDER BY y'",
            "v = 'rn'",
            "(v = 1 OR v = 2)",
            "v IN (1, 2)",
            "`v` <= 9",
            "v = ' AND '",
        ]
    )

    @staticmethod
    def _stmt(residual: str, outer: str = "k, v", rn: str = "rn") -> str:
        tail = f" AND {residual}" if residual else ""
        return (
            f"SELECT {outer} FROM (SELECT *, ROW_NUMBER() OVER "
            f"(PARTITION BY k ORDER BY ts) AS {rn} FROM src) "
            f"WHERE {rn} = 1{tail}"
        )

    @given(st.lists(_safe_conjuncts, min_size=1, max_size=4))
    @settings(max_examples=300, deadline=None)
    def test_safe_residual_matches_and_round_trips(self, conjuncts):
        """AND-chains of OR-free conjuncts (including literals that
        CONTAIN ' OR ' / 'ORDER BY' / the rn alias) match the shape,
        pass the depth-0 gate, and unmask back to the exact text."""
        from flink_sql_toolkit_spark.dialect.over_sql import (
            _DEDUP_SHAPE,
            _depth0_search,
        )

        residual = " AND ".join(conjuncts)
        masked, lits = _mask(self._stmt(residual))
        m = _DEDUP_SHAPE.match(masked)
        assert m is not None, residual
        assert not _depth0_search(
            m.group("residual"),
            r"(?is)\b(OR|ORDER\s+BY|LIMIT|OFFSET|GROUP\s+BY|HAVING|"
            r"UNION|INTERSECT|EXCEPT|WINDOW)\b",
        ), residual
        assert _unmask(m.group("residual"), lits) == residual

    @given(
        st.lists(_safe_conjuncts, max_size=2),
        st.sampled_from(
            ["v = 1 OR v = 2", "1 = 1 ORDER BY v", "v = 2 LIMIT 3",
             "v = 1 GROUP BY v", "v = 0 UNION SELECT 1"]
        ),
    )
    @settings(max_examples=200, deadline=None)
    def test_depth0_operator_always_gates(self, prefix, unsafe):
        """A depth-0 OR (precedence change) or trailing clause keyword
        anywhere in the residual chain trips the gate — routing it
        would silently change semantics."""
        from flink_sql_toolkit_spark.dialect.over_sql import (
            _DEDUP_SHAPE,
            _depth0_search,
        )

        residual = " AND ".join([*prefix, unsafe])
        masked, _lits = _mask(self._stmt(residual))
        m = _DEDUP_SHAPE.match(masked)
        if m is None:
            return  # not matching at all is equally safe
        assert _depth0_search(
            m.group("residual"),
            r"(?is)\b(OR|ORDER\s+BY|LIMIT|OFFSET|GROUP\s+BY|HAVING|"
            r"UNION|INTERSECT|EXCEPT|WINDOW)\b",
        ), residual

    @given(
        st.sampled_from(
            ["k, v, 'rn'", "k, 'has rn inside'", "k, v, ' rn '"]
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_rn_inside_literal_never_selects_rank_mode(self, outer):
        """The wants_rank scan runs over MASKED text: an rn spelling
        inside a string literal is a placeholder by then and must not
        flip the output mode (the r8 qualifier-strip bug class)."""
        import re as _re

        from flink_sql_toolkit_spark.dialect.over_sql import _DEDUP_SHAPE

        masked, _lits = _mask(self._stmt("", outer=outer))
        m = _DEDUP_SHAPE.match(masked)
        assert m is not None
        rn_scan = f"{m.group('outer')} {m.group('residual') or ''}"
        assert not _re.search(r"(?i)\brn\b", rn_scan)

    @given(st.sampled_from(["k, rn", "k, rn + 1", "k, `rn`", "rn, k, v"]))
    @settings(max_examples=100, deadline=None)
    def test_bare_or_backticked_rn_reference_is_seen(self, outer):
        import re as _re

        from flink_sql_toolkit_spark.dialect.over_sql import _DEDUP_SHAPE

        masked, lits = _mask(self._stmt("", outer=outer))
        m = _DEDUP_SHAPE.match(masked)
        assert m is not None
        rn_scan = f"{m.group('outer')} {m.group('residual') or ''}"
        seen = bool(_re.search(r"(?i)\brn\b", rn_scan))
        if not seen:  # the router's backtick fallback
            for pm in _re.finditer("\x00(\\d+)\x00", rn_scan):
                lit = lits[int(pm.group(1))]
                if lit.startswith("`") and lit.strip("`").lower() == "rn":
                    seen = True
        assert seen, outer


class TestNotebookRoundTrip:
    _cell_text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
    )

    @given(
        st.lists(
            st.tuples(st.sampled_from([1, 2]), _cell_text, _cell_text),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_serialize_parse_identity(self, raw):
        """serialize → parse is the identity for ANY cell content —
        quotes, unicode, newlines, semicolons; the reference stores
        notebooks as JSON so the contract is exact round-tripping."""
        from flink_sql_toolkit_spark.notebook import (
            NotebookCell,
            parse_notebook,
            serialize_notebook,
        )

        cells = [NotebookCell(k, lang, val) for k, lang, val in raw]
        assert parse_notebook(serialize_notebook(cells)) == cells

    @given(st.text(max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_parse_never_raises(self, garbage):
        from flink_sql_toolkit_spark.notebook import parse_notebook

        cells = parse_notebook(garbage)
        assert len(cells) >= 1  # malformed → the one-empty-cell contract


class TestGatewayJsonSafety:
    _value = st.recursive(
        st.one_of(
            st.none(),
            st.booleans(),
            st.integers(),
            st.floats(allow_nan=True, allow_infinity=True),
            st.text(max_size=10),
            st.binary(max_size=8),
            st.decimals(allow_nan=False, allow_infinity=False),
            st.datetimes(),
        ),
        lambda children: st.one_of(
            st.lists(children, max_size=4),
            st.dictionaries(st.text(max_size=5), children, max_size=4),
        ),
        max_leaves=12,
    )

    @given(_value)
    @settings(max_examples=300, deadline=None)
    def test_reply_serialization_total(self, obj):
        """Any result-page content — NaN/Infinity floats, bytes,
        datetimes, decimals, arbitrary nesting — serializes to VALID
        JSON (parseable by the strictest client) without raising."""
        import json as _json

        from flink_sql_toolkit_spark.gateway import _finite, _json_default

        payload = _json.dumps(
            _finite(obj), default=_json_default, allow_nan=False
        )
        _json.loads(payload)  # round-trips as strict JSON
