"""Randomized MATCH_RECOGNIZE fuzz against a Python-regex oracle.

With DISJOINT single-symbol predicates (each row satisfies at most
one symbol), SQL:2016 row-pattern matching over a key group is
exactly backtracking-regex matching over the group's symbol string:
same quantifier grammar, same greedy/reluctant preference, same
leftmost-alternation preference. AFTER MATCH SKIP PAST LAST ROW is
"resume at match end", SKIP TO NEXT ROW is "resume at start+1" —
both trivially expressed in the oracle loop. So Python's ``re``
(a backtracking engine with identical preference rules) is a sound
oracle for match SPANS, and ALL ROWS PER MATCH + MATCH_NUMBER()
exposes the engine's spans row-by-row.

Patterns are generated from the engine's supported grammar (symbols,
``+ * ? {n} {n,} {n,m}`` and reluctant variants, alternation,
parenthesized groups with quantifiers); group bodies are kept
non-nullable so zero-width-iteration semantics (murky in SQL:2016,
engine-documented) never decide a span. Seeded — reproducible.
"""

from __future__ import annotations

import random
import re

import pytest

# randomized adversarial layer: excluded from the fast gate via
# `-m 'not fuzz'` (pyproject [tool.pytest.ini_options]); run nightly/full
pytestmark = pytest.mark.fuzz

from flink_sql_toolkit_spark.operators.match_recognize import (
    _nullable,
    _parse_pattern,
    match_recognize,
)

SYMS = ["A", "B", "C"]
CHARS = {"A": "a", "B": "b", "C": "c"}
# quantifiers for top-level items (nullable fine — root checked) and
# for in-group items (non-nullable only, see module docstring)
QUANTS = ["", "", "+", "*", "?", "{2}", "{1,2}", "{2,}", "{0,2}",
          "+?", "*?", "{1,2}?", "{2,}?"]
QUANTS_REQ = ["", "", "+", "{2}", "{1,2}", "{1,3}?", "+?"]


def _gen_pattern(rng: random.Random) -> tuple[str, str]:
    """Random (PATTERN text, equivalent regex) pair."""
    parts_sql: list[str] = []
    parts_rx: list[str] = []
    for _ in range(rng.randint(2, 4)):
        if rng.random() < 0.3:
            # group: concatenation or alternation of required symbols
            n_in = rng.randint(1, 2)
            if rng.random() < 0.5 and n_in == 2:
                s1, s2 = rng.sample(SYMS, 2)
                q1, q2 = rng.choice(QUANTS_REQ), rng.choice(QUANTS_REQ)
                body_sql = f"{s1}{q1} | {s2}{q2}"
                body_rx = f"{CHARS[s1]}{q1}|{CHARS[s2]}{q2}"
            else:
                ss = [rng.choice(SYMS) for _ in range(n_in)]
                qq = [rng.choice(QUANTS_REQ) for _ in ss]
                body_sql = " ".join(f"{s}{q}" for s, q in zip(ss, qq))
                body_rx = "".join(f"{CHARS[s]}{q}" for s, q in zip(ss, qq))
            gq = rng.choice(QUANTS_REQ)
            parts_sql.append(f"( {body_sql} ){gq}")
            parts_rx.append(f"(?:{body_rx}){gq}")
        else:
            s = rng.choice(SYMS)
            q = rng.choice(QUANTS)
            parts_sql.append(f"{s}{q}")
            parts_rx.append(f"{CHARS[s]}{q}")
    return " ".join(parts_sql), "".join(parts_rx)


def _oracle_spans(rx: re.Pattern, s: str, skip_past: bool) -> list[tuple[int, int]]:
    pos, spans = 0, []
    while pos < len(s):
        m = rx.match(s, pos)
        if m and m.end() > pos:
            spans.append((pos, m.end() - 1))
            pos = m.end() if skip_past else pos + 1
        else:
            pos += 1
    return spans


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_nfa_spans_agree_with_regex_oracle(spark, seed):
    rng = random.Random(seed)
    n_keys = 30
    rows = []
    strings: dict[int, str] = {}
    for k in range(n_keys):
        s = "".join(rng.choice("abcxx") for _ in range(rng.randint(5, 25)))
        strings[k] = s
        rows.extend((k, i, ch) for i, ch in enumerate(s))
    df = spark.createDataFrame(rows, "k long, seq long, t string")

    tried = 0
    while tried < 4:
        pat_sql, pat_rx = _gen_pattern(rng)
        if _nullable(_parse_pattern(pat_sql)):
            continue  # engine rejects nullable roots up front
        tried += 1
        rx = re.compile(pat_rx)
        skip_past = tried % 2 == 0
        out = match_recognize(
            df,
            partition_by=["k"],
            order_by=["seq"],
            pattern=pat_sql,
            define={s: f"t = '{CHARS[s]}'" for s in SYMS},
            measures={"mn": "MATCH_NUMBER()"},
            after_match="past_last_row" if skip_past else "to_next_row",
            all_rows=True,
        ).collect()
        got: dict[int, dict[int, list[int]]] = {}
        for r in out:
            got.setdefault(r.k, {}).setdefault(r.mn, []).append(r.seq)
        for k, s in strings.items():
            exp = _oracle_spans(rx, s, skip_past)
            matches = got.get(k, {})
            assert len(matches) == len(exp), (
                pat_sql, skip_past, k, s, sorted(matches), exp
            )
            for mn, span in zip(sorted(matches), exp):
                seqs = sorted(matches[mn])
                assert (seqs[0], seqs[-1]) == span, (pat_sql, skip_past, k, s, mn)
                # matches consume consecutive rows: no gaps, no dupes
                assert seqs == list(range(seqs[0], seqs[-1] + 1)), (
                    pat_sql, skip_past, k, s, mn
                )
