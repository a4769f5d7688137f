"""MATCH_RECOGNIZE (CEP) — restricted pattern subset (SURVEY.md §2.11).

The reference corpus uses PARTITION BY / ORDER BY / MEASURES with
FIRST/LAST / ONE ROW PER MATCH / AFTER MATCH SKIP PAST LAST ROW /
PATTERN with quantifiers / DEFINE with PREV()
(test/syntax-test.fsql:467-482). Spark has no CEP operator; this is
the (b)-tier custom operator from the build rules:

1. **Symbol predicates are evaluated in Spark** — each DEFINE
   condition becomes a boolean column via ``F.expr`` (PREV(col)
   rewritten to a lag column), so the Python stage sees only
   booleans; the expression work stays JVM-side.
2. **The NFA runs per partition-key group in ``applyInPandas``** —
   greedy quantifier matching with backtracking and AFTER MATCH SKIP
   PAST LAST ROW. Group state is one user's ordered events: bounded,
   Arrow-batched.

Supported: concatenation, quantifiers ``+ * ?``, bounded quantifiers
``{n} {n,} {n,m} {,m}`` and reluctant variants (``+? *? ?? {n,m}?``,
prefer-fewest; the full SQL:2016 quantifier set the reference grammar
declares at syntaxes/flink.tmLanguage.json:363-367), alternation
``A B | C`` (SQL:2016 ordered choice, leftmost branch preferred),
nested parenthesized groups
with quantifiers (``((A B)+ C)``), ``PERMUTE(A, B, ...)``
anywhere in the pattern (expanded per SQL:2016 into the alternation
of all permutations in declaration order; tmLanguage.json:363-367
declares it too), measures
``FIRST/LAST(S.col) | COUNT(S.*) | AVG/SUM/MIN/MAX(S.col) |
CLASSIFIER() | MATCH_NUMBER()``, ONE ROW PER MATCH and ALL ROWS PER
MATCH (running measures per matched row; explicit ``RUNNING`` /
``FINAL`` measure prefixes per SQL:2016 12.4), AFTER MATCH SKIP PAST LAST
ROW / SKIP TO NEXT ROW / SKIP TO FIRST|LAST <sym> (with the SQL:2016
runtime rejection of a skip that re-anchors at the match's start),
cross-symbol DEFINE navigation (``B AS B.price > LAST(A.price)``,
compiled to dynamic predicates evaluated against the match context —
see ``_compile_dynamic_define``).
(PERMUTE with parenthesized-group factors / own-symbol running
navigation / empty-branch matches: rejected with a clear error.)
"""

from __future__ import annotations

import ast
import itertools
import math
import numbers
import re
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.operators.registry import register
from flink_sql_toolkit_spark.tables import load_table


@dataclass
class PatternToken:
    symbol: str
    quantifier: str  # '', '+', '*', '?', '{n}', '{n,}', '{n,m}', reluctant trailing '?'


@dataclass
class PatternAlt:
    """Ordered-choice alternation of concatenation branches, with an
    optional quantifier when it came from a parenthesized group —
    ``((A B)+ C)`` parses to Alt[[Alt[[A, B]]+ , C]]."""

    branches: list[list]  # each branch: list[PatternToken | PatternAlt]
    quantifier: str = ""


def _parse_pattern(pattern: str) -> PatternAlt:
    """Recursive-descent parse of the ``PATTERN`` body (SQL:2016
    row-pattern grammar subset: symbols, quantifiers ``+ * ?``,
    ordered-choice ``|``, and parenthesized groups — nested and
    quantified, e.g. ``((A B)+ C)``; reference grammar
    syntaxes/flink.tmLanguage.json:363-367). ``PERMUTE(A, B, ...)``
    anywhere in the pattern expands to its SQL:2016 definition — the
    alternation of every permutation in declaration order."""
    # PERMUTE(A, B, ...) — anywhere in the pattern — expands to its
    # SQL:2016 definition: the ordered-choice alternation of every
    # permutation of the factors, as a parenthesized group the tree
    # parser handles like any other. Innermost-first loop, so
    # PERMUTE composing with groups/quantifiers around it is fine;
    # only group-valued FACTORS (PERMUTE((A B), C)) stay rejected.
    while True:
        perm = re.search(r"(?is)\bPERMUTE\s*\(([^()]*)\)", pattern)
        if not perm:
            break
        factors = [f.strip() for f in perm.group(1).split(",") if f.strip()]
        if len(factors) < 2:
            raise ValueError(f"PERMUTE needs >= 2 factors in PATTERN '{pattern}'")
        alt = " | ".join(
            "( " + " ".join(p) + " )" for p in itertools.permutations(factors)
        )
        pattern = f"{pattern[: perm.start()]}( {alt} ){pattern[perm.end():]}"
    if re.search(r"(?i)\bPERMUTE\b", pattern):
        raise NotImplementedError(
            f"PERMUTE with parenthesized-group factors ('{pattern}') is "
            "outside the supported subset — use symbol factors"
        )
    toks = re.findall(r"\w+|[(){}|+*?,]", pattern)
    unknown = re.sub(r"\w+|[(){}|+*?,]|\s+", "", pattern)
    if unknown:
        raise ValueError(
            f"unsupported PATTERN characters {unknown!r} in '{pattern}' "
            "(subset: symbols, + * ? {n} {n,m}, reluctant '?' suffix, "
            "|, parenthesized groups)"
        )
    pos = 0

    def parse_alt() -> PatternAlt:
        nonlocal pos
        branches = [parse_seq()]
        while pos < len(toks) and toks[pos] == "|":
            pos += 1
            branches.append(parse_seq())
        return PatternAlt(branches)

    def parse_seq() -> list:
        nonlocal pos
        items: list = []
        while pos < len(toks) and toks[pos] not in ("|", ")"):
            items.append(parse_item())
        if not items:
            raise ValueError(f"empty alternation branch in PATTERN '{pattern}'")
        return items

    def parse_item():
        nonlocal pos
        if toks[pos] == "(":
            pos += 1
            inner = parse_alt()
            if pos >= len(toks) or toks[pos] != ")":
                raise ValueError(f"unbalanced parentheses in PATTERN '{pattern}'")
            pos += 1
            inner.quantifier = _take_quant()
            return inner
        tok = toks[pos]
        if not re.match(r"^\w+$", tok):
            raise ValueError(f"unexpected '{tok}' in PATTERN '{pattern}'")
        pos += 1
        return PatternToken(tok, _take_quant())

    def _take_quant() -> str:
        nonlocal pos
        q = ""
        if pos < len(toks) and toks[pos] in ("+", "*", "?"):
            q = toks[pos]
            pos += 1
        elif pos < len(toks) and toks[pos] == "{":
            # bounded quantifier {n} / {n,} / {n,m} / {,m}
            # (SQL:2016 row-pattern quantifiers; reference grammar
            # syntaxes/flink.tmLanguage.json:363-367)
            end = pos + 1
            while end < len(toks) and toks[end] != "}":
                end += 1
            if end >= len(toks):
                raise ValueError(f"unbalanced '{{' in PATTERN '{pattern}'")
            body = "".join(toks[pos + 1 : end])
            if not re.match(r"^(\d+|\d+,\d*|,\d+)$", body):
                raise ValueError(
                    f"bad bounded quantifier '{{{body}}}' in PATTERN "
                    f"'{pattern}' (use {{n}}, {{n,}}, {{n,m}} or {{,m}})"
                )
            q = "{" + body + "}"
            pos = end + 1
        # reluctant suffix: +? *? ?? {n,m}? — prefer FEWER repetitions
        if q and pos < len(toks) and toks[pos] == "?":
            q += "?"
            pos += 1
        return q

    tree = parse_alt()
    if pos != len(toks):
        raise ValueError(f"trailing '{toks[pos]}' in PATTERN '{pattern}'")
    return tree


def _pattern_symbols(node) -> set[str]:
    if isinstance(node, PatternToken):
        return {node.symbol}
    syms: set[str] = set()
    for br in node.branches:
        for item in br:
            syms |= _pattern_symbols(item)
    return syms


def _quant_bounds(q: str) -> tuple[int, int | None, bool]:
    """Quantifier text → (min, max, greedy); max=None is unbounded.
    '' → exactly once; a trailing '?' on any real quantifier flips it
    reluctant (prefer fewer repetitions, SQL:2016 / regex semantics).
    """
    greedy = True
    if q.endswith("?") and q != "?":
        greedy = False
        q = q[:-1]
    if q == "":
        return 1, 1, True
    if q == "+":
        return 1, None, greedy
    if q == "*":
        return 0, None, greedy
    if q == "?":
        return 0, 1, greedy
    m = re.match(r"^\{(\d*)(,(\d*))?\}$", q)
    if not m:
        raise ValueError(f"bad quantifier '{q}'")
    mn = int(m.group(1)) if m.group(1) else 0
    if m.group(2) is None:
        mx: int | None = mn  # {n}
    else:
        mx = int(m.group(3)) if m.group(3) else None  # {n,} / {n,m} / {,m}
    if mx is not None and mx < mn:
        raise ValueError(f"quantifier '{q}' has max < min")
    return mn, mx, greedy


def _nullable(node) -> bool:
    """Can the (sub)pattern match zero rows?"""
    if _quant_bounds(node.quantifier)[0] == 0:
        return True
    if isinstance(node, PatternToken):
        return False
    return any(all(_nullable(i) for i in br) for br in node.branches)


_MEASURE_RE = re.compile(
    r"(?i)^(FIRST|LAST|COUNT|AVG|SUM|MIN|MAX)\s*\(\s*(\w+)\.(\w+|\*)\s*\)$"
)

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _strip_symbol_quals(cond: str, own: str, others: set[str]) -> str:
    """Inside ``DEFINE <own> AS ...``, ``<own>.col`` means "the current
    row being classified", so that qualifier drops out. Conditions
    naming a DIFFERENT symbol route through the dynamic-predicate
    compiler instead (``_compile_dynamic_define``)."""
    return re.sub(rf"(?i)\b{re.escape(own)}\s*\.\s*", "", cond)


_DEFINE_TOKEN = re.compile(
    r"\s+|'(?:[^']|'')*'|>=|<=|<>|!=|=|[<>()+\-*/%]|"
    r"[A-Za-z_][A-Za-z_0-9]*(?:\s*\.\s*[A-Za-z_0-9]+)?|\d+(?:\.\d+)?|(.)"
)
_DEFINE_KEYWORDS = {"and": "and", "or": "or", "not": "not",
                    "true": "True", "false": "False", "null": "_NULL"}


class _NullType:
    """SQL NULL sentinel for dynamic DEFINE evaluation: every
    comparison/arithmetic touching it raises TypeError, which the
    evaluator maps to UNKNOWN → row not matched. A plain ``None``
    can't do this — Python happily answers ``None == x`` (False) and
    ``None != x`` (True), silently inverting SQL's NULL semantics
    for the ``=``/``<>`` operators."""

    def _unknown(self, *_a):
        raise TypeError("SQL NULL in comparison")

    __eq__ = __ne__ = __lt__ = __le__ = __gt__ = __ge__ = _unknown
    __add__ = __radd__ = __sub__ = __rsub__ = _unknown
    __mul__ = __rmul__ = __truediv__ = __rtruediv__ = _unknown
    __bool__ = _unknown
    __hash__ = None  # type: ignore[assignment]

    def __repr__(self) -> str:
        return "NULL"


_NULL = _NullType()


class _SqlArithRewriter(ast.NodeTransformer):
    """Rewrite ``/`` and ``%`` in compiled DEFINEs to SQL-semantics
    helpers: Flink integer division and MOD truncate toward zero
    (remainder takes the dividend's sign) while Python floors, so an
    int-typed cross-symbol DEFINE like ``B.v = A.v / 2`` could flip
    truth value between the static JVM path and this dynamic path."""

    def visit_BinOp(self, node: ast.BinOp) -> ast.AST:
        self.generic_visit(node)
        if isinstance(node.op, (ast.Div, ast.Mod)):
            fn = "_sqldiv" if isinstance(node.op, ast.Div) else "_sqlmod"
            return ast.copy_location(
                ast.Call(
                    func=ast.Name(id=fn, ctx=ast.Load()),
                    args=[node.left, node.right],
                    keywords=[],
                ),
                node,
            )
        return node


def _sqldiv(a, b):
    """SQL division: integer operands truncate toward zero; anything
    else (floats, _NULL → TypeError → UNKNOWN) defers to Python."""
    if isinstance(a, numbers.Integral) and isinstance(b, numbers.Integral):
        q = a // b
        if q < 0 and q * b != a:
            q += 1
        return q
    return a / b


def _sqlmod(a, b):
    """SQL MOD: remainder carries the DIVIDEND's sign (Python's %
    carries the divisor's)."""
    if isinstance(a, numbers.Integral) and isinstance(b, numbers.Integral):
        return a - _sqldiv(a, b) * b
    return math.fmod(a, b)


def _compile_dynamic_define(
    cond: str, own: str, others: set[str]
) -> tuple["object", dict[str, str], set[str]]:
    """Compile a cross-symbol DEFINE condition (``B AS B.price >
    LAST(A.price)`` — Flink: navigate rows already mapped in the
    current match attempt) into a Python code object evaluated during
    NFA matching with the partial assignment as context.

    Supported subset: comparisons and arithmetic over columns,
    numeric/string literals, AND/OR/NOT, IS [NOT] NULL, PREV(col)
    (pre-computed JVM lag), ``X.col`` / ``LAST(X.col)`` (last row
    mapped to X so far), ``FIRST(X.col)``. NULL handling: navigated/
    column NULLs are a sentinel whose comparisons (including ``=`` /
    ``<>``) raise → UNKNOWN → row not matched. This is pessimistic
    three-valued logic: an evaluated UNKNOWN subterm fails the whole
    predicate even where SQL's ``UNKNOWN OR TRUE = TRUE`` would
    rescue it, unless Python's short-circuit already skipped it —
    sound (never emits a match SQL would reject), documented
    approximation. Own-symbol FIRST/LAST (running navigation over
    the symbol's own rows) and ``%`` are rejected.

    Returns (code, lag_columns, referenced_columns)."""
    toks: list[str] = []
    for m in _DEFINE_TOKEN.finditer(cond):
        if m.group(1):
            raise NotImplementedError(
                f"unsupported character {m.group(1)!r} in cross-symbol "
                f"DEFINE {cond.strip()!r}"
            )
        if not m.group(0).isspace():
            toks.append(m.group(0))
    out: list[str] = []
    lags: dict[str, str] = {}
    refcols: set[str] = set()
    i = 0
    while i < len(toks):
        t = toks[i]
        low = t.lower()
        nxt = toks[i + 1] if i + 1 < len(toks) else ""
        if t.startswith("'"):
            out.append(repr(t[1:-1].replace("''", "'")))
            i += 1
        elif t == "=":
            out.append("==")
            i += 1
        elif t == "<>":
            out.append("!=")
            i += 1
        elif low == "is":
            rest = [x.lower() for x in toks[i + 1 : i + 3]]
            if rest[:1] == ["null"]:
                out.append("is _NULL")
                i += 2
            elif rest == ["not", "null"]:
                out.append("is not _NULL")
                i += 3
            else:
                raise NotImplementedError(f"IS … in DEFINE {cond.strip()!r}")
        elif low in _DEFINE_KEYWORDS:
            out.append(_DEFINE_KEYWORDS[low])
            i += 1
        elif low in ("first", "last", "prev") and nxt == "(":
            if i + 3 >= len(toks) or toks[i + 3] != ")":
                raise NotImplementedError(
                    f"{t}() needs a single column argument in "
                    f"DEFINE {cond.strip()!r}"
                )
            arg = re.sub(r"\s+", "", toks[i + 2])
            if low == "prev":
                col = arg.split(".")[-1]  # PREV(S.col) ≡ PREV(col)
                name = f"_prev_{col}"
                lags[name] = col
                refcols.add(name)
                out.append(f"_cur({name!r})")
            else:
                if "." not in arg:
                    raise NotImplementedError(
                        f"{t}() in DEFINE needs a sym.col argument"
                    )
                sym, col = arg.split(".", 1)
                if sym == own:
                    raise NotImplementedError(
                        f"{t}({arg}) navigates '{own}''s own rows inside "
                        "its own DEFINE (running greedy state) — outside "
                        "the supported subset"
                    )
                if sym not in others:
                    raise NotImplementedError(
                        f"unknown qualifier '{sym}' in {t}({arg}) — not a "
                        f"PATTERN symbol (DEFINE {cond.strip()!r})"
                    )
                refcols.add(col)
                out.append(f"_{low}({sym!r}, {col!r})")
            i += 4
        elif re.match(r"^[A-Za-z_]", t):
            ident = re.sub(r"\s+", "", t)
            if nxt == "(":
                raise NotImplementedError(
                    f"function {ident}() in cross-symbol DEFINE "
                    f"{cond.strip()!r} is outside the supported subset"
                )
            if "." in ident:
                sym, col = ident.split(".", 1)
                refcols.add(col)
                if sym == own:
                    out.append(f"_cur({col!r})")
                elif sym in others:
                    # bare X.col = the LAST row mapped to X (Flink)
                    out.append(f"_last({sym!r}, {col!r})")
                else:
                    raise NotImplementedError(
                        f"unknown qualifier '{sym}' in DEFINE "
                        f"{cond.strip()!r}"
                    )
            else:
                refcols.add(ident)
                out.append(f"_cur({ident!r})")
            i += 1
        else:  # numbers, operators ('/' and '%' rewritten below), parens
            out.append(t)
            i += 1
    tree = ast.parse(" ".join(out), mode="eval")
    tree = ast.fix_missing_locations(_SqlArithRewriter().visit(tree))
    return compile(tree, "<define>", "eval"), lags, refcols


def _rewrite_prev(cond: str, order_cols: list[str]) -> tuple[str, dict[str, str]]:
    """PREV(col) → a generated lag column reference."""
    lags: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        col = m.group(1)
        name = f"_prev_{col}"
        lags[name] = col
        return name

    return re.sub(r"(?i)\bPREV\s*\(\s*(\w+)\s*\)", repl, cond), lags


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: str,
    define: dict[str, str],
    measures: dict[str, str],
    after_match: str = "past_last_row",
    all_rows: bool = False,
    within_us: int | None = None,
    _compile_only: bool = False,
    _defer_lags: bool = False,
) -> DataFrame:
    """``within_us`` is Flink's ``PATTERN (...) WITHIN INTERVAL``
    time constraint (Flink docs "Pattern Recognition § Time
    constraint"): a match must complete within the interval of its
    first row's event time. Enforced INSIDE the NFA — a row past the
    attempt's time limit is rejected like a failed predicate, so
    greedy quantifiers still backtrack to a shorter in-window match
    (a post-filter would wrongly kill those) — which is also what
    bounds CEP state in Flink. Requires the leading ORDER BY column
    to be a TIMESTAMP rowtime."""
    if within_us is not None:
        if within_us <= 0:
            raise ValueError(f"WITHIN interval must be positive, got {within_us}")
        otypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        if not otypes.get(order_by[0], "").startswith("timestamp"):
            raise NotImplementedError(
                "PATTERN ... WITHIN requires the leading ORDER BY column "
                f"to be a TIMESTAMP rowtime; '{order_by[0]}' is "
                f"{otypes.get(order_by[0], 'missing')}"
            )
    skip_to_sym: str | None = None
    skip_to_first = False
    skip_m = re.match(r"(?i)^to_(first|last)\s+(\w+)$", after_match)
    if skip_m:
        # AFTER MATCH SKIP TO FIRST|LAST <sym>: resume AT the first/
        # last row the match mapped to <sym> (that row participates
        # in the next match attempt) — SQL:2016 / Flink semantics,
        # including the runtime rejection of a skip that would
        # re-anchor at the match's own start row (infinite loop).
        skip_to_first = skip_m.group(1).lower() == "first"
        skip_to_sym = skip_m.group(2)
    elif after_match not in ("past_last_row", "to_next_row"):
        raise ValueError(
            f"unsupported AFTER MATCH strategy '{after_match}' "
            "(subset: past_last_row, to_next_row, to_first <sym>, "
            "to_last <sym>)"
        )
    skip_past = after_match == "past_last_row"
    tree = _parse_pattern(pattern)
    if _nullable(tree):
        # Flink's rule, adopted verbatim: a pattern whose preferred
        # match can be EMPTY ("A*", "(B? | C*)") is rejected up front.
        # Silently skipping the empty match and backtracking to a
        # longer candidate would invert SQL:2016's preference order.
        raise NotImplementedError(
            f"PATTERN '{pattern}' can produce empty matches, which is "
            "not supported (same restriction as Flink CEP) — anchor "
            "the pattern with at least one required symbol"
        )
    if skip_to_sym is not None and skip_to_sym not in _pattern_symbols(tree):
        raise ValueError(
            f"AFTER MATCH SKIP TO references '{skip_to_sym}', which is "
            f"not a PATTERN symbol of '{pattern}'"
        )
    for sym in sorted(_pattern_symbols(tree)):
        if sym not in define:
            # undefined symbols match every row (SQL standard default)
            define[sym] = "true"
    symbols = _pattern_symbols(tree) | set(define)
    # Cross-symbol DEFINEs (navigate rows already mapped in the match
    # attempt) can't be pre-computed as boolean columns — they compile
    # to dynamic predicates the NFA evaluates with the partial
    # assignment; everything else stays on the JVM fast path.
    static_define: dict[str, str] = {}
    dynamic_src: dict[str, str] = {}
    for s, c in define.items():
        if any(
            re.search(rf"(?i)\b{re.escape(o)}\s*\.\s*\w", c)
            for o in symbols - {s}
        ):
            dynamic_src[s] = c
        elif _defer_lags and re.search(r"(?i)\bPREV\s*\(", c):
            # streaming: no JVM lag() windows — a PREV condition is
            # compiled as a dynamic predicate over the pandas-side
            # lag columns the stateful operator materializes per key
            dynamic_src[s] = c
        else:
            static_define[s] = _strip_symbol_quals(c, s, symbols - {s})

    # 1) JVM-side: lag columns for PREV + boolean symbol predicates
    from pyspark.sql import Window as W  # noqa: PLC0415

    w = W.partitionBy(*partition_by).orderBy(*order_by)
    all_lags: dict[str, str] = {}
    sym_cols: dict[str, str] = {}
    work = df
    for sym, cond in static_define.items():
        rewritten, lags = _rewrite_prev(cond, order_by)
        all_lags.update(lags)
        sym_cols[sym] = rewritten
    compiled_dynamic: dict[str, tuple[object, set[str]]] = {}
    for sym, cond in dynamic_src.items():
        code, lags, refcols = _compile_dynamic_define(cond, sym, symbols - {sym})
        all_lags.update(lags)
        compiled_dynamic[sym] = (code, refcols)
    if not _defer_lags:
        for lag_name, col in all_lags.items():
            work = work.withColumn(lag_name, F.lag(col).over(w))
    for sym, cond in sym_cols.items():
        work = work.withColumn(f"_sym_{sym}", F.coalesce(F.expr(cond), F.lit(False)))
    in_cols = set(work.columns)
    if _defer_lags:
        # the lag columns exist only pandas-side (per-key shift in the
        # stateful operator), not in the JVM frame
        in_cols |= set(all_lags)
    for sym, (_code, refcols) in compiled_dynamic.items():
        missing = refcols - in_cols
        if missing:
            raise ValueError(
                f"DEFINE for '{sym}' references unknown column(s) "
                f"{sorted(missing)}"
            )

    # 2) measures → output schema + per-match evaluation plan
    plans = []  # (out_name, fn, symbol, col)
    out_fields = []
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    # ALL ROWS PER MATCH keeps every input column (SQL:2016 row-per-
    # matched-row output); ONE ROW PER MATCH keeps the partition keys
    emit_cols = list(in_schema) if all_rows else list(partition_by)
    for key in emit_cols:
        out_fields.append(f"{key} {in_schema[key]}")
    # explicit RUNNING|FINAL measure prefixes (SQL:2016 12.4): the two
    # only differ under ALL ROWS PER MATCH, where RUNNING (the
    # default) evaluates over the match prefix up to the current row
    # and FINAL over the whole match on every row; under ONE ROW PER
    # MATCH both are the final value.
    final_measures: set[str] = set()
    measures = dict(measures)  # never mutate the caller's dict
    for out_name, mexpr in list(measures.items()):
        pm = re.match(r"(?is)^(RUNNING|FINAL)\s+(.*)$", mexpr.strip())
        if pm:
            measures[out_name] = mexpr = pm.group(2)
            if pm.group(1).upper() == "FINAL":
                final_measures.add(out_name)
    for out_name, mexpr in measures.items():
        nm = re.match(r"(?i)^(CLASSIFIER|MATCH_NUMBER)\s*\(\s*\)$", mexpr.strip())
        if nm:
            fn = nm.group(1).upper()
            if all_rows and out_name in in_schema:
                raise ValueError(f"measure '{out_name}' collides with an input column")
            plans.append((out_name, fn, None, None))
            out_fields.append(f"{out_name} {'string' if fn == 'CLASSIFIER' else 'bigint'}")
            continue
        m = _MEASURE_RE.match(mexpr.strip())
        if not m:
            raise ValueError(
                f"unsupported MEASURE '{mexpr}' (subset: FIRST/LAST/COUNT/AVG/SUM/"
                "MIN/MAX(sym.col), CLASSIFIER(), MATCH_NUMBER())"
            )
        fn, sym, col = m.group(1).upper(), m.group(2), m.group(3)
        if col == "*" and fn != "COUNT":
            raise ValueError(
                f"unsupported MEASURE '{mexpr}': '{sym}.*' is only valid "
                "inside COUNT()"
            )
        if col != "*" and col not in in_schema:
            # validate at plan time for every function — COUNT's
            # output type never consults in_schema, so a typo would
            # otherwise surface as an executor-side KeyError (r11)
            raise ValueError(
                f"MEASURE '{mexpr}' references unknown column '{col}'"
            )
        if all_rows and out_name in in_schema:
            raise ValueError(
                f"measure '{out_name}' collides with an input column "
                "(ALL ROWS PER MATCH emits every input column)"
            )
        plans.append((out_name, fn, sym, col))
        if fn == "COUNT":
            otype = "bigint"
        elif fn == "AVG":
            otype = "double"
        elif fn == "SUM":
            otype = "bigint" if in_schema[col] in _INT_TYPES else "double"
        else:  # FIRST/LAST/MIN/MAX keep the input type
            otype = in_schema[col]
        out_fields.append(f"{out_name} {otype}")
    out_schema = ", ".join(out_fields)

    sort_cols = list(order_by)
    key_cols = list(partition_by)

    # every measure's value column, including COUNT(sym.col) — SQL
    # COUNT over a column counts only non-NULL values, so the NFA
    # needs the data to test (COUNT(sym.*) counts rows; no column)
    measure_cols = {
        col for _, _fn, _, col in plans if col is not None and col != "*"
    }

    # Vectorized fast path for PATTERN (A+ B): a match is a maximal
    # run of A-rows immediately followed by a B-row — computable with
    # numpy run-length arithmetic, no per-row python. Valid whenever
    # the two symbols are disjoint within the group (a row satisfying
    # both forces the generic backtracking NFA). Produces exactly the
    # greedy + SKIP PAST LAST ROW result: runs cannot cross a B-row
    # (disjointness) nor a neither-row (breaks the run), which is
    # precisely where the NFA restarts.
    two_sym_plus = (
        skip_past
        and within_us is None  # WITHIN needs the NFA's per-attempt clock
        and not all_rows
        and not compiled_dynamic
        and tree.quantifier == ""
        and len(tree.branches) == 1
        and len(tree.branches[0]) == 2
        and all(isinstance(t, PatternToken) for t in tree.branches[0])
        and tree.branches[0][0].quantifier == "+"
        and tree.branches[0][1].quantifier == ""
        # every measure symbol must BE one of the two pattern symbols:
        # the emission loop below attributes everything not-A to the
        # B-row, so a measure over a defined-but-unmatched third
        # symbol (COUNT(C.*) = 0 in the NFA) would silently read
        # B/A-run values (review r11)
        and all(
            sym in (tree.branches[0][0].symbol, tree.branches[0][1].symbol)
            for _, _fn, sym, _col in plans
            if sym is not None
        )
    )
    fast_tokens = tree.branches[0] if two_sym_plus else None

    def run_fast_plus(pdf: pd.DataFrame):
        """Whole-partition vectorized matcher for PATTERN (A+ B).

        One numpy pass over the sorted partition — group boundaries
        are run barriers, so no per-key pandas grouping at all. A
        match is a maximal A-run immediately followed by a B-row in
        the same group, which is exactly the greedy NFA + SKIP PAST
        LAST ROW outcome when A and B are disjoint (a row satisfying
        both falls back to the generic NFA).
        """
        import numpy as np  # noqa: PLC0415

        a_sym, b_sym = fast_tokens[0].symbol, fast_tokens[1].symbol
        a = pdf[f"_sym_{a_sym}"].to_numpy(dtype=bool)
        b = pdf[f"_sym_{b_sym}"].to_numpy(dtype=bool)
        if (a & b).any():
            return None  # overlapping predicates → generic NFA
        n = len(pdf)
        idx = np.arange(n)
        if len(key_cols) == 1:
            keys = pdf[key_cols[0]].to_numpy()
            group_start = np.ones(n, dtype=bool)
            group_start[1:] = keys[1:] != keys[:-1]
        else:
            kf = pdf[key_cols]
            group_start = np.ones(n, dtype=bool)
            group_start[1:] = (kf.iloc[1:].values != kf.iloc[:-1].values).any(axis=1)
        # run barrier value per position: a non-A row resets at its own
        # index; a group start additionally bars anything before it
        val = np.where(~a, idx, -1)
        val = np.maximum(val, np.where(group_start, idx - 1, -1))
        last_reset = np.maximum.accumulate(val)
        b_pos = idx[b]
        prev = np.maximum(b_pos - 1, 0)
        run = b_pos - 1 - last_reset[prev]
        run = np.where(group_start[b_pos], 0, run)
        keep = run >= 1
        b_pos, run = b_pos[keep], run[keep]
        out_cols = key_cols + [p[0] for p in plans]
        if not len(b_pos):
            return pd.DataFrame(columns=out_cols)
        col_vals = {c: pdf[c].to_numpy() for c in measure_cols}
        # A-side AVG/SUM/MIN/MAX need per-run aggregates; computable
        # with reset-at-barrier cumulative aggregates (groups keyed by
        # last_reset are exactly {barrier} ∪ run) — but only for
        # numeric columns (the ±inf identity trick).
        for out_name, fn, sym, col in plans:
            if fn in ("AVG", "SUM", "MIN", "MAX") and sym == a_sym:
                if not np.issubdtype(col_vals[col].dtype, np.number):
                    return None  # non-numeric A-agg → generic NFA

        cum_cache: dict = {}
        _notna_cache: dict = {}

        def notna(col: str) -> "np.ndarray":
            # lazy per-column non-null mask — FIRST/LAST/CLASSIFIER
            # workloads never pay the isna pass (review r11)
            if col not in _notna_cache:
                _notna_cache[col] = ~pd.isna(col_vals[col])
            return _notna_cache[col]

        def a_run_agg(fn: str, col: str) -> "np.ndarray":
            """Aggregate of col over each match's A-run, one value
            per kept B-row. Cumulative agg grouped by last_reset:
            within a group, rows before the run contribute the
            identity, so the value at b_pos-1 is the run aggregate.
            NULL slots contribute the identity too (SQL aggregates
            skip NULLs); 'CNT' is the per-run NON-NULL count that
            COUNT(A.col) and the AVG denominator need."""
            key = (fn, col)
            if key not in cum_cache:
                vals = col_vals[col]
                ann = a & notna(col)  # NaN slots never selected below
                if fn == "CNT":
                    contrib = ann.astype("int64")
                    cum = pd.Series(contrib).groupby(last_reset).cumsum().to_numpy()
                elif fn in ("SUM", "AVG"):
                    contrib = np.where(
                        ann, vals if fn == "SUM" else vals.astype("float64"), 0
                    )
                    cum = pd.Series(contrib).groupby(last_reset).cumsum().to_numpy()
                elif fn == "MIN":
                    contrib = np.where(ann, vals.astype("float64"), np.inf)
                    cum = pd.Series(contrib).groupby(last_reset).cummin().to_numpy()
                else:
                    contrib = np.where(ann, vals.astype("float64"), -np.inf)
                    cum = pd.Series(contrib).groupby(last_reset).cummax().to_numpy()
                cum_cache[key] = cum
            return cum_cache[key][b_pos - 1]

        out = {k: pdf[k].to_numpy()[b_pos] for k in key_cols}
        for out_name, fn, sym, col in plans:
            if fn == "CLASSIFIER":
                # FINAL semantics: the symbol of the match's last row
                out[out_name] = np.full(len(b_pos), b_sym, dtype=object)
            elif fn == "MATCH_NUMBER":
                gid = np.cumsum(group_start)[b_pos]
                out[out_name] = pd.Series(gid).groupby(gid).cumcount().to_numpy() + 1
            elif fn == "COUNT":
                # COUNT(sym.*) counts mapped rows; COUNT(sym.col)
                # counts the non-NULL values among them (SQL)
                if col == "*":
                    out[out_name] = run if sym == a_sym else np.ones_like(run)
                elif sym == a_sym:
                    out[out_name] = a_run_agg("CNT", col)
                else:
                    out[out_name] = notna(col)[b_pos].astype("int64")
            elif sym == b_sym:
                v = col_vals[col][b_pos]
                out[out_name] = v.astype("float64") if fn == "AVG" else v
            elif fn == "FIRST":
                out[out_name] = col_vals[col][b_pos - run]
            elif fn == "LAST":
                out[out_name] = col_vals[col][b_pos - 1]
            else:  # AVG/SUM/MIN/MAX over the A-run, NULLs skipped;
                # an all-NULL run aggregates to NULL (NaN here — an
                # integer column can't reach it: no NULLs → cnt == run)
                v = a_run_agg(fn, col)
                if fn == "AVG":
                    cnt = a_run_agg("CNT", col)
                    out[out_name] = np.where(
                        cnt > 0, v / np.maximum(cnt, 1), np.nan
                    )
                elif np.issubdtype(col_vals[col].dtype, np.integer):
                    # no NULLs possible (else the dtype were float):
                    # cnt == run > 0, skip the CNT cumulative entirely
                    if fn in ("MIN", "MAX"):
                        v = v.astype(col_vals[col].dtype)
                    out[out_name] = v
                else:
                    cnt = a_run_agg("CNT", col)
                    out[out_name] = np.where(cnt > 0, v, np.nan)
        return pd.DataFrame(out, columns=out_cols)

    def _has_quantified_group(node) -> bool:
        if isinstance(node, PatternToken):
            return False
        mx = _quant_bounds(node.quantifier)[1]
        if mx is None or mx > 1:
            return True
        return any(
            _has_quantified_group(i) for br in node.branches for i in br
        )

    quantified_groups = _has_quantified_group(tree)

    def run_nfa(
        pdf: pd.DataFrame, streaming: bool = False, match_no_base: int = 0
    ):
        """Run the NFA over one sorted key group.

        Batch mode returns the output DataFrame. Streaming mode
        (``streaming=True``) additionally enforces *prefix-stable*
        emission: a match is emitted only if NO higher-preference
        candidate ran out of input while it was being selected — the
        ``probe`` flag below records every predicate test past the
        last buffered row, and since the backtracking generators
        yield in SQL:2016 preference order, everything explored
        before the first yield IS higher-preference. A probed match
        (or a probed failure) means future rows could change the
        answer, so the loop stops and the caller retains the suffix.
        Returns (out_df, keep_from, match_no): rows < keep_from are
        decided forever; rows >= keep_from must be re-presented with
        the next micro-batch.
        """
        # rows arrive pre-sorted by (partition_by, order_by)
        n = len(pdf)
        probe = {"end": False}  # any predicate test at p >= n
        if quantified_groups:
            # group repetitions recurse one frame each (symbols scan
            # iteratively) — size the limit to the group, but cap WELL
            # below where CPython's C stack becomes the real bound:
            # each nested-generator level burns C stack when resumed,
            # so a too-generous Python limit lets the worker segfault
            # before RecursionError ever fires. 18k stays comfortably
            # inside the default 8 MiB thread stack; past it the
            # RecursionError below turns into a typed error instead
            # of a dead executor.
            import sys  # noqa: PLC0415

            sys.setrecursionlimit(max(sys.getrecursionlimit(), min(8 * n + 2000, 18000)))
        sym_vals = {
            sym: pdf[f"_sym_{sym}"].to_numpy()
            for sym in _pattern_symbols(tree)
            if sym not in compiled_dynamic
        }
        # numpy views for measure extraction — .iloc per match is slow
        col_vals = {c: pdf[c].to_numpy() for c in measure_cols}
        key_row = {k: pdf.iloc[0][k] for k in key_cols}
        # WITHIN: event-time clock per match attempt (µs); the limit
        # cell is rewritten by match_any at every attempt start
        if within_us is not None:
            ts_us = (
                pdf[order_by[0]].to_numpy("datetime64[ns]").astype("int64")
                // 1000
            )
        att_limit = [0]

        # dynamic (cross-symbol) predicates: evaluate the compiled
        # condition with the partial assignment as navigation context
        dyn_preds: dict = {}
        for dsym, (code, refcols) in compiled_dynamic.items():
            arrays = {c: pdf[c].to_numpy() for c in refcols}

            def make_pred(code=code, arrays=arrays):
                def pred(p: int, ctx: list) -> bool:
                    def _cur(col):
                        v = arrays[col][p]
                        return _NULL if pd.isna(v) else v

                    def _nav(sym2, col, first):
                        it = ctx if first else reversed(ctx)
                        for idx, s2 in it:
                            if s2 == sym2:
                                v = arrays[col][idx]
                                return _NULL if pd.isna(v) else v
                        return _NULL

                    try:
                        return bool(
                            eval(  # noqa: S307 — compiled from the
                                # whitelisted-token translation above
                                code,
                                {"__builtins__": {}},
                                {
                                    "_cur": _cur,
                                    "_last": lambda s2, c: _nav(s2, c, False),
                                    "_first": lambda s2, c: _nav(s2, c, True),
                                    "_NULL": _NULL,
                                    "_sqldiv": _sqldiv,
                                    "_sqlmod": _sqlmod,
                                },
                            )
                        )
                    except TypeError:  # NULL operand → UNKNOWN
                        return False

                return pred

            dyn_preds[dsym] = make_pred()

        # Generator-based backtracking over the pattern TREE: each
        # generator yields (end_pos, [(row_idx, symbol)]) candidates
        # in greedy-preference order (more repetitions first, leftmost
        # alternation branch first), so the first yield of the root is
        # the SQL:2016 preferred match. ``ctx`` is the assignment
        # accumulated left-to-right in the current candidate — the
        # navigation context for cross-symbol DEFINE predicates.
        # Recursion depth is bounded by pattern size + group
        # repetitions (per-row symbol runs scan iteratively).

        def gen_seq(items: list, i: int, pos: int, ctx: list):
            if i == len(items):
                yield pos, []
                return
            for p1, a1 in gen_item(items[i], pos, ctx):
                for p2, a2 in gen_seq(items, i + 1, p1, ctx + a1):
                    yield p2, a1 + a2

        def gen_alt_body(node: PatternAlt, pos: int, ctx: list):
            for br in node.branches:
                yield from gen_seq(br, 0, pos, ctx)

        def gen_item(node, pos: int, ctx: list):
            mn, mx, greedy_q = _quant_bounds(node.quantifier)
            if isinstance(node, PatternToken):
                sym = node.symbol
                if sym in dyn_preds:
                    pred = dyn_preds[sym]

                    def okfn(p: int) -> bool:
                        # other symbols' rows are frozen during this
                        # symbol's scan (own-symbol running navigation
                        # is rejected at compile), so ctx is constant
                        # across the run
                        if p >= n:
                            probe["end"] = True
                            return False
                        if within_us is not None and ts_us[p] >= att_limit[0]:
                            # row at/past the attempt's WITHIN bound: a
                            # definite reject (its own timestamp), not
                            # an end-of-input probe. Flink requires the
                            # first-to-last gap be STRICTLY smaller
                            # than the interval (docs "Pattern
                            # Recognition § Time constraint"; CEP NFA
                            # times out at duration >= window), so
                            # exactly-at-bound rows are out (review r7)
                            return False
                        return pred(p, ctx)

                else:
                    ok = sym_vals[sym]

                    def okfn(p: int) -> bool:
                        if p >= n:
                            probe["end"] = True
                            return False
                        if within_us is not None and ts_us[p] >= att_limit[0]:
                            return False
                        return bool(ok[p])

                if (mn, mx) == (1, 1):
                    if okfn(pos):
                        yield pos + 1, [(pos, sym)]
                    return
                # quantified SYMBOL: iterative scan — recursion here
                # would be one frame per matched row and overflow on
                # long runs (a 10^4-row A-run under `A+ B Z?` is a
                # normal CEP input). The scan stops at the upper bound,
                # so a bounded quantifier never consumes past its max.
                max_k = 0
                while (mx is None or max_k < mx) and okfn(pos + max_k):
                    max_k += 1
                ks = (
                    range(max_k, mn - 1, -1)  # greedy: more rows first
                    if greedy_q
                    else range(mn, max_k + 1)  # reluctant: fewer first
                )
                for k in ks:
                    yield pos + k, [(pos + i, sym) for i in range(k)]
                return

            if (mn, mx) == (1, 1):
                yield from gen_alt_body(node, pos, ctx)
                return
            # quantified GROUP: recursion is one frame per group
            # REPETITION (not per row) — bounded by match length /
            # group width, and by mx when the quantifier is bounded

            def reps(p: int, count: int, rctx: list):
                stop_ok = count >= mn
                if not greedy_q and stop_ok:
                    # reluctant: offer the shorter expansion FIRST
                    yield p, []
                empty_iter = False
                if mx is None or count < mx:
                    for p1, a1 in gen_alt_body(node, p, rctx):
                        if p1 == p:
                            # zero-width body match: regex/SQL:2016
                            # semantics — it ends the iteration but
                            # COUNTS toward the quantifier minimum
                            # ((C*)+ over no Cs still satisfies +)
                            empty_iter = True
                            continue
                        for p2, a2 in reps(p1, count + 1, rctx + a1):
                            yield p2, a1 + a2
                if greedy_q and (stop_ok or empty_iter):
                    yield p, []
                elif not greedy_q and not stop_ok and empty_iter:
                    yield p, []

            yield from reps(pos, 0, ctx)

        def match_any(pos: int) -> tuple[list[tuple[int, str]] | None, bool]:
            """First non-empty candidate of the root = the SQL:2016
            preferred (greedy, leftmost-branch) match at ``pos``.
            Second element: True if selecting it (or failing) probed
            past the end of input — the result is provisional."""
            probe["end"] = False
            if within_us is not None:
                att_limit[0] = ts_us[pos] + within_us
            for _end, assignment in gen_alt_body(tree, pos, []):
                if assignment:
                    return assignment, probe["end"]
            return None, probe["end"]

        def fill_measures(
            row: dict,
            assigned: list[tuple[int, str]],
            match_no: int,
            full: list[tuple[int, str]] | None = None,
        ) -> None:
            for out_name, fn, sym, col in plans:
                use = (
                    full
                    if full is not None and out_name in final_measures
                    else assigned
                )
                if fn == "CLASSIFIER":
                    row[out_name] = use[-1][1]  # current/last row's symbol
                    continue
                if fn == "MATCH_NUMBER":
                    row[out_name] = match_no
                    continue
                idxs = [i for i, s in use if s == sym]
                if fn == "COUNT":
                    # SQL COUNT: sym.* counts mapped rows; sym.col
                    # counts non-NULL values among them
                    if col == "*":
                        row[out_name] = len(idxs)
                    else:
                        vals = col_vals[col][idxs]
                        row[out_name] = int((~pd.isna(vals)).sum())
                elif not idxs:
                    row[out_name] = None
                elif fn == "FIRST":
                    # FIRST/LAST are SQL:2016 row-pattern NAVIGATION
                    # (the value of that row, NULL and all) — only the
                    # aggregates below skip NULLs
                    row[out_name] = col_vals[col][idxs[0]]
                elif fn == "LAST":
                    row[out_name] = col_vals[col][idxs[-1]]
                else:
                    vals = col_vals[col][idxs]
                    vals = vals[~pd.isna(vals)]  # aggregates skip NULLs
                    if not len(vals):
                        row[out_name] = None
                    elif fn == "AVG":
                        row[out_name] = float(vals.mean())
                    elif fn == "SUM":
                        row[out_name] = vals.sum()
                    elif fn == "MIN":
                        row[out_name] = vals.min()
                    else:
                        row[out_name] = vals.max()

        in_vals = {c: pdf[c].to_numpy() for c in emit_cols} if all_rows else {}
        out_rows = []
        pos = 0
        # run_nfa sees one key group → counter is per-key; streaming
        # continues the count carried in operator state
        match_no = match_no_base
        while pos < n:
            try:
                assignment, pending = match_any(pos)
            except RecursionError as exc:
                raise ValueError(
                    f"PATTERN '{pattern}': a quantified group repeated "
                    f"past the supported depth (~{n} rows in this key "
                    "group) — split the input or bound the group"
                ) from exc
            if streaming and pending:
                # provisional: a higher-preference candidate (or this
                # failure) probed past the buffer end — future rows
                # could change the outcome. Hold everything from here.
                break
            if assignment:
                match_no += 1
                if all_rows:
                    # one output row per matched input row, measures
                    # evaluated RUNNING (over the match prefix)
                    for j, (idx, _) in enumerate(assignment):
                        row = {c: in_vals[c][idx] for c in emit_cols}
                        fill_measures(
                            row, assignment[: j + 1], match_no, assignment
                        )
                        out_rows.append(row)
                else:
                    row = dict(key_row)
                    fill_measures(row, assignment, match_no)
                    out_rows.append(row)
                # AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW |
                # TO FIRST/LAST <sym>
                if skip_to_sym is not None:
                    targets = [i for i, s in assignment if s == skip_to_sym]
                    if not targets:
                        raise ValueError(
                            f"AFTER MATCH SKIP TO "
                            f"{'FIRST' if skip_to_first else 'LAST'} "
                            f"{skip_to_sym}: the match mapped no row to "
                            f"'{skip_to_sym}'"
                        )
                    target = targets[0] if skip_to_first else targets[-1]
                    if target == assignment[0][0]:
                        raise ValueError(
                            f"AFTER MATCH SKIP TO "
                            f"{'FIRST' if skip_to_first else 'LAST'} "
                            f"{skip_to_sym} re-anchors at the match's own "
                            "start row — infinite loop (SQL:2016 rejects "
                            "this at runtime)"
                        )
                    pos = target
                elif skip_past:
                    pos = assignment[-1][0] + 1
                else:  # to_next_row
                    pos = assignment[0][0] + 1
            else:
                pos += 1
        cols = emit_cols + [p[0] for p in plans]
        out = pd.DataFrame(out_rows, columns=cols)
        if streaming:
            return out, pos, match_no
        return out

    out_cols = emit_cols + [p[0] for p in plans]

    def process_partition(batches) -> "pd.DataFrame":
        """Run the NFA over a whole sorted partition.

        applyInPandas pays per-group invocation overhead — with many
        small key groups (the normal CEP shape) that dominates wall
        time. Here the partition is hash-distributed by key and
        sorted (key, time), so groups are contiguous: buffer rows
        across Arrow batch boundaries, flush every completed group
        through the NFA. One python call per partition, not per key.
        """
        if two_sym_plus:
            # partition-level vectorized path: one concat, one numpy
            # pass, group boundaries handled as run barriers
            all_batches = [p for p in batches if len(p)]
            if not all_batches:
                return
            whole = (
                pd.concat(all_batches, ignore_index=True)
                if len(all_batches) > 1
                else all_batches[0]
            )
            fast = run_fast_plus(whole)
            if fast is not None:
                if len(fast):
                    yield fast
                return
            batches = iter([whole])  # overlap detected → generic loop
        leftover: pd.DataFrame | None = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if not len(pdf):
                continue
            keys = pdf[key_cols[0]] if len(key_cols) == 1 else list(
                zip(*[pdf[k] for k in key_cols])
            )
            keys = pd.Series(keys)
            last_key = keys.iloc[-1]
            complete = pdf[keys != last_key]
            leftover = pdf[keys == last_key]
            if len(complete):
                groups = [g for _, g in complete.groupby(key_cols, sort=False)]
                results = [run_nfa(g.reset_index(drop=True)) for g in groups]
                results = [r for r in results if len(r)]
                if results:
                    yield pd.concat(results, ignore_index=True)
        if leftover is not None and len(leftover):
            r = run_nfa(leftover.reset_index(drop=True))
            if len(r):
                yield r

    if _compile_only:
        # internal hook for streaming_match_recognize: the JVM-side
        # prepared frame + the per-group NFA runner, no batch plan
        return {
            "work": work,
            "run_nfa": run_nfa,
            "out_schema": out_schema,
            "out_cols": out_cols,
            "key_cols": key_cols,
            "sort_cols": sort_cols,
            "has_lags": bool(all_lags),
            "lags": dict(all_lags),
        }
    return (
        work.repartition(*partition_by)
        .sortWithinPartitions(*(partition_by + order_by))
        .mapInPandas(process_partition, out_schema)
    )


def match_recognize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATTERN (A+ B): one-or-more non-purchase events followed by a
    purchase, per user, AFTER MATCH SKIP PAST LAST ROW — the classic
    funnel. The oracle reconstructs identical matches with window
    SQL (possible for this pattern because B-rows can't also be
    A-rows, so matches never overlap)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    out = match_recognize(
        ev,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern="A+ B",
        define={
            "A": "event_type <> 'purchase'",
            "B": "event_type = 'purchase'",
        },
        measures={
            "start_ts": "FIRST(A.ts)",
            "purchase_ts": "LAST(B.ts)",
            "n_before": "COUNT(A.*)",
        },
    )
    return out.select("user_id", "start_ts", "purchase_ts", "n_before")


@register(
    "match_recognize_alternation",
    # Single-row branches make every match reconstructible row-wise:
    # a row matches P (purchase) or else H (high-value); ordered
    # choice means a high-value purchase classifies as 'P'. Match
    # numbering restarts per user and counts matches in event order.
    oracle="""
    SELECT user_id,
           event_id,
           CASE WHEN event_type = 'purchase' THEN 'P' ELSE 'H' END AS kind,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS mn
    FROM events
    WHERE event_type = 'purchase' OR value > 75
    ORDER BY user_id, mn
    """,
)
def match_recognize_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATTERN (P | H): alternation with overlapping DEFINEs — a row
    that is both a purchase and high-value must classify as 'P'
    (SQL:2016 leftmost-branch preference). CLASSIFIER() +
    MATCH_NUMBER() prove which branch won and per-key numbering."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    out = match_recognize(
        ev,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern="P | H",
        define={
            "P": "event_type = 'purchase'",
            "H": "value > 75",
        },
        measures={
            "p_event": "FIRST(P.event_id)",
            "h_event": "FIRST(H.event_id)",
            "kind": "CLASSIFIER()",
            "mn": "MATCH_NUMBER()",
        },
    )
    return out.select(
        "user_id",
        F.coalesce("p_event", "h_event").alias("event_id"),
        "kind",
        "mn",
    ).orderBy("user_id", "mn")


def match_recognize_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same funnel expressed as MATCH_RECOGNIZE *SQL syntax*
    (reference: test/syntax-test.fsql:467-482) — exercises the
    dialect/mr_sql.py parse → CEP operator → temp-view rewrite path,
    plus the MIN/MAX aggregate measures (exact, order-insensitive,
    so they hash-match the DuckDB oracle; AVG/SUM float measures are
    covered by unit tests instead)."""
    from flink_sql_toolkit_spark.dialect.mr_sql import (  # noqa: PLC0415
        rewrite_match_recognize_sql,
    )

    load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    ).createOrReplaceTempView("events_mr_sql")
    stmt = rewrite_match_recognize_sql(
        spark,
        """
        SELECT user_id, start_ts, purchase_ts, n_before, min_value, max_value
        FROM events_mr_sql
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES
                FIRST(A.ts) AS start_ts,
                LAST(B.ts) AS purchase_ts,
                COUNT(A.*) AS n_before,
                MIN(A.value) AS min_value,
                MAX(A.value) AS max_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE
                A AS A.event_type <> 'purchase',
                B AS B.event_type = 'purchase'
        )
        """,
    )
    return spark.sql(stmt)


@register(
    "match_recognize_batch",
    # FAMILY entry (registry cap): the DataFrame-operator funnel, the
    # SQL-clause funnel, and three quantifier variants on one (variant,
    # user_id, start_ts, purchase_ts, n_before, min_value, max_value,
    # n_matches, rows_matched) schema — proves the CEP engine, the
    # dialect/mr_sql parse path, and the SQL:2016 bounded/reluctant
    # quantifiers (r6) against closed-form window-SQL oracles.
    #
    # Quantifier oracles: a pattern of just `A{...}` (A = non-purchase)
    # tiles each maximal non-purchase run independently from its start
    # (earliest-match preference + SKIP PAST LAST ROW), so per-run
    # match counts have closed forms in the run length n:
    #   A{2,3} greedy    → chunks of 3, plus one 2-chunk iff n%3=2:
    #                      n//3 + (n%3=2), rows n - (n%3=1)
    #   A{2,3}? reluctant→ stops at 2 every time: n//2 pairs, rows 2*(n//2)
    #   A{2,}  greedy    → one match consuming the whole run iff n>=2
    #
    # WITHIN oracle (r11): PATTERN (A B) WITHIN INTERVAL '8' HOUR over
    # disjoint symbol classes — matches are exactly the adjacent
    # (non-purchase, purchase) row pairs with a strictly-sub-8h gap
    # (the NFA rejects a row at ts >= first_ts + within), closed-form
    # via LAG. ~half the 1550 candidate pairs at sf0.01 pass the gate,
    # so both accept and reject paths are exercised.
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, ts, event_type, value,
             CASE WHEN value > 75 THEN NULL ELSE value END AS v2,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_before
      FROM events
    ),
    seg AS (
      SELECT user_id, p_before AS seg_id, COUNT(*) AS n_before, MIN(ts) AS start_ts,
             MIN(value) AS min_value, MAX(value) AS max_value
      FROM base WHERE event_type <> 'purchase'
      GROUP BY user_id, p_before
    ),
    matches AS (
      SELECT b.user_id AS user_id, s.start_ts, b.ts AS purchase_ts, s.n_before,
             s.min_value, s.max_value
      FROM base b JOIN seg s ON s.user_id = b.user_id AND s.seg_id = b.p_before
      WHERE b.event_type = 'purchase'
    ),
    quant AS (
      SELECT variant, user_id,
             MIN(CASE WHEN n_before >= 2 THEN start_ts END) AS start_ts,
             CAST(SUM(n_matches) AS BIGINT) AS n_matches,
             CAST(SUM(rows_matched) AS BIGINT) AS rows_matched
      FROM (
        SELECT 'q_bounded' AS variant, user_id, n_before, start_ts,
               n_before // 3 + CASE WHEN n_before % 3 = 2 THEN 1 ELSE 0 END AS n_matches,
               n_before - CASE WHEN n_before % 3 = 1 THEN 1 ELSE 0 END AS rows_matched
        FROM seg
        UNION ALL
        SELECT 'q_reluctant', user_id, n_before, start_ts,
               n_before // 2, 2 * (n_before // 2)
        FROM seg
        UNION ALL
        SELECT 'q_atleast', user_id, n_before, start_ts,
               CASE WHEN n_before >= 2 THEN 1 ELSE 0 END,
               CASE WHEN n_before >= 2 THEN n_before ELSE 0 END
        FROM seg
      )
      GROUP BY variant, user_id
      HAVING SUM(n_matches) > 0
    ),
    segn AS (
      -- per-A-run COUNT/MIN/MAX over the NULLABLE v2 (SQL aggregate
      -- NULL skipping — the q_nullagg variant's oracle)
      SELECT user_id, p_before AS seg_id,
             COUNT(v2) AS cnt_v2, MIN(v2) AS min_v2, MAX(v2) AS max_v2
      FROM base WHERE event_type <> 'purchase'
      GROUP BY user_id, p_before
    ),
    nullagg AS (
      SELECT b.user_id AS user_id,
             CAST(SUM(s.cnt_v2) AS BIGINT) AS n_matches,
             CAST(COUNT(*) AS BIGINT) AS rows_matched,
             MIN(s.min_v2) AS min_value, MAX(s.max_v2) AS max_value
      FROM base b JOIN segn s ON s.user_id = b.user_id AND s.seg_id = b.p_before
      WHERE b.event_type = 'purchase'
      GROUP BY b.user_id
    ),
    within_m AS (
      SELECT user_id, MIN(prev_ts) AS start_ts,
             CAST(COUNT(*) AS BIGINT) AS n_matches,
             CAST(2 * COUNT(*) AS BIGINT) AS rows_matched
      FROM (
        SELECT user_id, ts, event_type,
               LAG(ts) OVER w AS prev_ts,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      WHERE event_type = 'purchase' AND prev_type <> 'purchase'
        AND epoch_us(ts) - epoch_us(prev_ts) < 28800000000
      GROUP BY user_id
    )
    SELECT 'df' AS variant, user_id, start_ts, purchase_ts, n_before,
           CAST(NULL AS DOUBLE) AS min_value, CAST(NULL AS DOUBLE) AS max_value,
           CAST(NULL AS BIGINT) AS n_matches, CAST(NULL AS BIGINT) AS rows_matched
    FROM matches
    UNION ALL
    SELECT 'sql', user_id, start_ts, purchase_ts, n_before, min_value, max_value,
           NULL, NULL
    FROM matches
    UNION ALL
    SELECT variant, user_id, start_ts, CAST(NULL AS TIMESTAMP), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), n_matches, rows_matched
    FROM quant
    UNION ALL
    SELECT 'q_within', user_id, start_ts, CAST(NULL AS TIMESTAMP),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           n_matches, rows_matched
    FROM within_m
    UNION ALL
    SELECT 'q_nullagg', user_id, CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS BIGINT), min_value, max_value, n_matches, rows_matched
    FROM nullagg
    """,
)
def match_recognize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATTERN (A+ B) through BOTH surfaces — the DataFrame CEP
    operator (`match_recognize_funnel`) and the MATCH_RECOGNIZE SQL
    clause (`match_recognize_sql`, dialect/mr_sql.py) — plus the
    SQL:2016 bounded/reluctant quantifier variants (``A{2,3}``,
    ``A{2,3}?``, ``A{2,}``; reference grammar
    syntaxes/flink.tmLanguage.json:363-367) aggregated per user,
    tagged and concatenated against one window-SQL oracle."""
    pad = [
        F.lit(None).cast("bigint").alias("n_matches"),
        F.lit(None).cast("bigint").alias("rows_matched"),
    ]
    df_path = match_recognize_funnel(spark, sf_dir).select(
        F.lit("df").alias("variant"),
        "user_id",
        "start_ts",
        "purchase_ts",
        "n_before",
        F.lit(None).cast("double").alias("min_value"),
        F.lit(None).cast("double").alias("max_value"),
        *pad,
    )
    sql_path = match_recognize_sql(spark, sf_dir).select(
        F.lit("sql").alias("variant"),
        "user_id",
        "start_ts",
        "purchase_ts",
        "n_before",
        "min_value",
        "max_value",
        *pad,
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )

    def pad_quant(tag: str, agg) -> DataFrame:
        """(user_id, start_ts, n_matches, rows_matched) → the family
        entry's 9-column shape, funnel columns null-padded — shared by
        every quantifier/WITHIN variant so the union schema has one
        definition (review r11)."""
        return agg.select(
            F.lit(tag).alias("variant"),
            "user_id",
            "start_ts",
            F.lit(None).cast("timestamp").alias("purchase_ts"),
            F.lit(None).cast("bigint").alias("n_before"),
            F.lit(None).cast("double").alias("min_value"),
            F.lit(None).cast("double").alias("max_value"),
            "n_matches",
            "rows_matched",
        )

    def quant_variant(tag: str, pattern: str) -> DataFrame:
        out = match_recognize(
            ev,
            partition_by=["user_id"],
            order_by=["ts", "event_id"],
            pattern=pattern,
            define={"A": "event_type <> 'purchase'"},
            measures={"first_ts": "FIRST(A.ts)", "n": "COUNT(A.*)"},
        )
        return pad_quant(tag, out.groupBy("user_id").agg(
            F.min("first_ts").alias("start_ts"),
            F.count("*").cast("bigint").alias("n_matches"),
            F.sum("n").cast("bigint").alias("rows_matched"),
        ))

    def within_variant() -> DataFrame:
        """PATTERN (A B) WITHIN INTERVAL '8' HOUR through the SQL
        clause (dialect/mr_sql.py WITHIN parse → NFA per-attempt
        clock) — disjoint symbol classes make the match set
        closed-form (see the oracle's within_m CTE)."""
        from flink_sql_toolkit_spark.dialect.mr_sql import (  # noqa: PLC0415
            rewrite_match_recognize_sql,
        )

        ev.createOrReplaceTempView("events_mr_within")
        stmt = rewrite_match_recognize_sql(
            spark,
            """
            SELECT user_id, start_ts
            FROM events_mr_within
            MATCH_RECOGNIZE (
                PARTITION BY user_id
                ORDER BY ts, event_id
                MEASURES FIRST(A.ts) AS start_ts
                ONE ROW PER MATCH
                AFTER MATCH SKIP PAST LAST ROW
                PATTERN (A B) WITHIN INTERVAL '8' HOUR
                DEFINE
                    A AS A.event_type <> 'purchase',
                    B AS B.event_type = 'purchase'
            )
            """,
        )
        return pad_quant("q_within", spark.sql(stmt).groupBy("user_id").agg(
            F.min("start_ts").alias("start_ts"),
            F.count("*").cast("bigint").alias("n_matches"),
            (F.count("*") * 2).cast("bigint").alias("rows_matched"),
        ))

    def nullagg_variant() -> DataFrame:
        """MEASURES aggregates over a NULLABLE column (r11: SQL NULL
        semantics — COUNT(A.col) counts only non-NULL values, MIN/MAX
        skip NULLs and are NULL over an all-NULL symbol set). ``value``
        is NULLed above 75 identically on both sides, so mixed and
        all-NULL A-runs both occur; the oracle mirrors the same
        per-segment COUNT/MIN/MAX in the segn/nullagg CTEs."""
        ev2 = load_table(spark, sf_dir, "events").select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.when(F.col("value") > 75, F.lit(None))
            .otherwise(F.col("value"))
            .alias("v2"),
        )
        out = match_recognize(
            ev2,
            partition_by=["user_id"],
            order_by=["ts", "event_id"],
            pattern="A+ B",
            define={
                "A": "event_type <> 'purchase'",
                "B": "event_type = 'purchase'",
            },
            measures={
                "cnt_v2": "COUNT(A.v2)",
                "min_v2": "MIN(A.v2)",
                "max_v2": "MAX(A.v2)",
            },
        )
        agg = out.groupBy("user_id").agg(
            F.sum("cnt_v2").cast("bigint").alias("n_matches"),
            F.count("*").cast("bigint").alias("rows_matched"),
            F.min("min_v2").alias("min_value"),
            F.max("max_v2").alias("max_value"),
        )
        return agg.select(
            F.lit("q_nullagg").alias("variant"),
            "user_id",
            F.lit(None).cast("timestamp").alias("start_ts"),
            F.lit(None).cast("timestamp").alias("purchase_ts"),
            F.lit(None).cast("bigint").alias("n_before"),
            "min_value",
            "max_value",
            "n_matches",
            "rows_matched",
        )

    return (
        df_path.unionByName(sql_path)
        .unionByName(quant_variant("q_bounded", "A{2,3}"))
        .unionByName(quant_variant("q_reluctant", "A{2,3}?"))
        .unionByName(quant_variant("q_atleast", "A{2,}"))
        .unionByName(within_variant())
        .unionByName(nullagg_variant())
    )
