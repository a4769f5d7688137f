"""Randomized prefix-stability check for streaming MATCH_RECOGNIZE.

The streaming operator's contract (streaming/stateful.py
``streaming_match_recognize``): every EMITTED match is identical to
what the batch operator produces on the full stream — matches that
are not yet decidable simply wait in state. So for any random
pattern and any random micro-batch split, the streaming output per
key, ordered by MATCH_NUMBER, must be a PREFIX of the batch output
(and in practice most of it, since a decided match emits as soon as
its deciding row arrives). Patterns come from the same generator the
regex-oracle fuzz uses; batch correctness of those patterns is
pinned there, so prefix-of-batch here transitively pins streaming
against the regex oracle too. Seeded — reproducible.
"""

from __future__ import annotations

from fastwrite import write_rows

import random

import pytest

# randomized adversarial layer: excluded from the fast gate via
# `-m 'not fuzz'` (pyproject [tool.pytest.ini_options]); run nightly/full
pytestmark = pytest.mark.fuzz

from flink_sql_toolkit_spark.operators.match_recognize import (
    _nullable,
    _parse_pattern,
    match_recognize,
)
from tests.test_mr_regex_oracle import CHARS, SYMS, _gen_pattern


def _mk_batches(rng: random.Random, n_keys: int, n_files: int):
    rows = []
    for k in range(n_keys):
        s = "".join(rng.choice("abcxx") for _ in range(rng.randint(6, 20)))
        rows.extend((k, i, ch) for i, ch in enumerate(s))
    # global arrival order = per-key seq order; random contiguous cuts
    cuts = sorted(rng.sample(range(1, len(rows)), n_files - 1))
    bounds = [0, *cuts, len(rows)]
    return rows, [rows[a:b] for a, b in zip(bounds, bounds[1:])]


@pytest.mark.parametrize("seed", [17, 29])
def test_streaming_mr_prefix_of_batch_on_random_patterns(
    spark, tmp_path, seed
):
    from flink_sql_toolkit_spark.streaming.stateful import (
        streaming_match_recognize,
    )

    rng = random.Random(seed)
    rows, files = _mk_batches(rng, n_keys=12, n_files=4)
    schema = "k long, seq long, t string"
    for i, chunk in enumerate(files):
        write_rows(f"{tmp_path}/in/b{i}", chunk, schema)

    while True:
        pat_sql, _rx = _gen_pattern(rng)
        if not _nullable(_parse_pattern(pat_sql)):
            break
    kwargs = dict(
        pattern=pat_sql,
        define={s: f"t = '{CHARS[s]}'" for s in SYMS},
        measures={
            "mn": "MATCH_NUMBER()",
            "first_seq": "FIRST(A.seq)",
            "n_a": "COUNT(A.*)",
            "n_b": "COUNT(B.*)",
            "n_c": "COUNT(C.*)",
        },
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in/*")
    )
    q = (
        streaming_match_recognize(
            stream, partition_by=["k"], order_by=["seq"], **kwargs
        )
        .writeStream.format("memory")
        .queryName(f"smr_fuzz_{seed}")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got: dict[int, dict[int, tuple]] = {}
    for r in spark.table(f"smr_fuzz_{seed}").collect():
        got.setdefault(r.k, {})[r.mn] = (r.first_seq, r.n_a, r.n_b, r.n_c)

    batch_df = spark.createDataFrame(rows, schema)
    exp: dict[int, dict[int, tuple]] = {}
    for r in match_recognize(
        batch_df, partition_by=["k"], order_by=["seq"], **kwargs
    ).collect():
        exp.setdefault(r.k, {})[r.mn] = (r.first_seq, r.n_a, r.n_b, r.n_c)

    n_exp = sum(len(v) for v in exp.values())
    n_got = sum(len(v) for v in got.values())
    for k, matches in got.items():
        assert k in exp, (pat_sql, k)
        # prefix: match numbers 1..len(got[k]) with identical content
        assert sorted(matches) == list(range(1, len(matches) + 1)), (
            pat_sql, k, sorted(matches)
        )
        for mn, vals in matches.items():
            assert vals == exp[k][mn], (pat_sql, k, mn, vals, exp[k][mn])
    # soft lower bound: the undecided tail is at most one open match
    # per key, so the stream must have emitted the bulk of the batch
    # result (guards against an under-emitting regression passing the
    # prefix check trivially)
    if n_exp:
        assert n_got >= n_exp - len(exp), (pat_sql, n_got, n_exp)
