"""Property tests for the pure numeric cores of the streaming OVER /
reorder machinery (streaming/stateful.py) — no SparkSession needed.

These helpers carry the trickiest invariants in the module (prefix-sum
exactness, NULL skipping, monotonic-deque sweeps, watermark release
partitioning, chunk-split invariance of the running accumulators), so
each is compared against a naive O(n·w) oracle over randomized input.
Mirrors the adversarial-property treatment the dialect routers got in
r9/r10 (tests/test_dialect_properties.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_sql_toolkit_spark.streaming.stateful import (
    _reorder_release,
    _running_col_aggs,
    _sliding_extreme,
    _window_col_aggs,
)

# value pools: small ints, negatives, near-int64-overflow magnitudes
# (force the arbitrary-precision prefix-sum branch), and NULL slots
_INT_VALS = st.one_of(
    st.none(),
    st.integers(min_value=-50, max_value=50),
    st.integers(min_value=2**61, max_value=2**62),
    st.integers(min_value=-(2**62), max_value=-(2**61)),
)
_FLOAT_VALS = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
)


def _trailing_windows(n: int, width: int):
    """The exact lo/hi arrays streaming_over_rows builds for a
    trailing ROWS frame of `width` preceding."""
    idx = np.arange(n)
    return np.maximum(0, idx - width), idx + 1


def _naive_window_aggs(full: list, lo, hi) -> dict[str, list]:
    out: dict[str, list] = {k: [] for k in
                            ("cnt", "sum", "avg", "min", "max", "first", "last")}
    for left, right in zip(lo, hi):
        vals = [v for v in full[left:right]
                if not (v is None or (isinstance(v, float) and math.isnan(v)))]
        out["cnt"].append(len(vals))
        out["sum"].append(sum(vals) if vals else None)
        out["avg"].append(sum(vals) / len(vals) if vals else None)
        out["min"].append(min(vals) if vals else None)
        out["max"].append(max(vals) if vals else None)
        out["first"].append(vals[0] if vals else None)
        out["last"].append(vals[-1] if vals else None)
    return out


def _close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    fa, fb = float(a), float(b)
    return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)


class TestWindowColAggs:
    @given(
        st.lists(_INT_VALS, min_size=0, max_size=40),
        st.integers(min_value=0, max_value=8),
    )
    @settings(max_examples=300, deadline=None)
    def test_int_matches_naive(self, full, width):
        lo, hi = _trailing_windows(len(full), width)
        need = {"cnt", "sum", "avg", "min", "max", "first", "last"}
        got = _window_col_aggs(full, lo, hi, int_col=True, need=need)
        ref = _naive_window_aggs(full, lo, hi)
        for k in ("cnt", "sum", "min", "max", "first", "last"):
            assert got[k] == ref[k], f"{k}: {got[k]} != {ref[k]}"
        assert all(_close(g, r) for g, r in zip(got["avg"], ref["avg"]))

    @given(
        st.lists(_FLOAT_VALS, min_size=0, max_size=40),
        st.integers(min_value=0, max_value=8),
    )
    @settings(max_examples=300, deadline=None)
    def test_float_matches_naive(self, full, width):
        lo, hi = _trailing_windows(len(full), width)
        need = {"cnt", "sum", "avg", "min", "max", "first", "last"}
        got = _window_col_aggs(full, lo, hi, int_col=False, need=need)
        ref = _naive_window_aggs(full, lo, hi)
        assert got["cnt"] == ref["cnt"]
        for k in ("sum", "avg", "min", "max", "first", "last"):
            assert all(_close(g, r) for g, r in zip(got[k], ref[k])), k


class TestSlidingExtreme:
    @given(
        st.lists(st.integers(min_value=-100, max_value=100),
                 min_size=1, max_size=40),
        st.data(),
    )
    @settings(max_examples=300, deadline=None)
    def test_matches_naive_on_monotone_windows(self, vals, data):
        n = len(vals)
        mask = data.draw(st.lists(st.booleans(), min_size=n, max_size=n))
        # random non-decreasing lo/hi with lo_i <= hi_i <= n
        k = data.draw(st.integers(min_value=1, max_value=10))
        bounds = sorted(
            data.draw(st.lists(st.integers(min_value=0, max_value=n),
                               min_size=2 * k, max_size=2 * k))
        )
        lo = sorted(bounds[:k])
        hi = sorted(bounds[k:])
        hi = [max(l, h) for l, h in zip(lo, hi)]
        for is_min in (True, False):
            got = _sliding_extreme(vals, mask, lo, hi, is_min=is_min)
            ref = []
            for left, right in zip(lo, hi):
                window = [vals[i] for i in range(left, right) if mask[i]]
                if not window:
                    ref.append(None)
                else:
                    ref.append(min(window) if is_min else max(window))
            assert got == ref


class TestRunningColAggs:
    @staticmethod
    def _naive_running(vals: list, int_col: bool) -> dict[str, list]:
        lo = np.zeros(len(vals), dtype=np.int64)
        hi = np.arange(1, len(vals) + 1)
        return _naive_window_aggs(vals, lo, hi)

    @given(st.lists(_INT_VALS, min_size=0, max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_int_single_chunk_matches_naive(self, vals):
        big = any(v is not None and abs(v) >= 2**61 for v in vals)
        try:
            got = _running_col_aggs(vals, [0, 0, 0, 0, 0, 0], int_col=True)
        except ValueError:
            # BIGINT overflow is a typed rejection, allowed only when
            # the true running sum actually exceeds the range
            acc, peak = 0, 0
            for v in vals:
                acc += v or 0
                peak = max(peak, abs(acc))
            assert big and peak > 2**63 - 1 - 2**62  # near-range input
            return
        ref = self._naive_running(vals, int_col=True)
        for k in ("cnt", "sum", "min", "max", "first", "last"):
            assert got[k] == ref[k], k
        assert all(_close(g, r) for g, r in zip(got["avg"], ref["avg"]))

    @given(st.lists(_FLOAT_VALS, min_size=0, max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_float_single_chunk_matches_naive(self, vals):
        got = _running_col_aggs(vals, [0.0] * 6, int_col=False)
        ref = self._naive_running(vals, int_col=False)
        assert got["cnt"] == ref["cnt"]
        for k in ("sum", "avg", "min", "max", "first", "last"):
            assert all(_close(g, r) for g, r in zip(got[k], ref[k])), k

    @given(
        st.lists(st.one_of(st.none(),
                           st.integers(min_value=-50, max_value=50)),
                 min_size=1, max_size=30),
        st.data(),
    )
    @settings(max_examples=200, deadline=None)
    def test_split_invariance(self, vals, data):
        """Running in two chunks with the carried next_state equals
        running the full sequence in one call — the micro-batch
        boundary must be invisible."""
        cut = data.draw(st.integers(min_value=0, max_value=len(vals)))
        one = _running_col_aggs(vals, [0, 0, 0, 0, 0, 0], int_col=True)
        a = _running_col_aggs(vals[:cut], [0, 0, 0, 0, 0, 0], int_col=True)
        b = _running_col_aggs(vals[cut:], a["next_state"], int_col=True)
        for k in ("cnt", "sum", "min", "max", "first", "last"):
            assert a[k] + b[k] == one[k], k
        assert b["next_state"] == one["next_state"]


def _mk_frame(ts_ms: list[int | None]) -> pd.DataFrame:
    return pd.DataFrame({
        "ts": [pd.Timestamp(t, unit="ms") if t is not None else pd.NaT
               for t in ts_ms],
        "rid": range(len(ts_ms)),
    })


class TestReorderRelease:
    @given(
        st.lists(st.integers(min_value=1, max_value=100), max_size=10),
        st.lists(st.one_of(st.none(),
                           st.integers(min_value=1, max_value=100)),
                 max_size=15),
        st.integers(min_value=0, max_value=100),
    )
    @settings(max_examples=300, deadline=None)
    def test_partition_invariants(self, held_ts, new_ts, wm_ms):
        """released + still_held + dropped exactly partitions the
        input; released ≤ wm sorted by event time; held rows are never
        dropped; new rows strictly behind wm (or with no event time)
        are the only drops."""
        held = _mk_frame(held_ts) if held_ts else None
        # shift rid so held and new rows are distinguishable
        chunks = []
        if new_ts:
            new = _mk_frame(new_ts)
            new["rid"] += 1000
            chunks = [new]
        released, still, dropped = _reorder_release(held, chunks, "ts", wm_ms)
        rel_ids = list(released["rid"]) if released is not None else []
        still_ids = list(still["rid"]) if still is not None else []
        n_in = len(held_ts) + len(new_ts)
        assert len(rel_ids) + len(still_ids) + dropped == n_in
        assert len(set(rel_ids) | set(still_ids)) == len(rel_ids) + len(still_ids)
        # every held row survives (release or hold — drops are
        # new-rows-only by contract)
        surviving = set(rel_ids) | set(still_ids)
        assert set(range(len(held_ts))) <= surviving
        expected_drops = sum(
            1 for t in new_ts if t is None or (wm_ms > 0 and t < wm_ms)
        )
        assert dropped == expected_drops
        if wm_ms == 0:
            assert released is None  # no watermark progress → hold all
        if released is not None:
            rel_ts = list(released["ts"])
            assert all(t.value // 1_000_000 <= wm_ms for t in rel_ts)
            assert rel_ts == sorted(rel_ts)
        if still is not None:
            assert all(
                t.value // 1_000_000 > wm_ms or wm_ms == 0
                for t in still["ts"]
            )

    @given(
        st.lists(st.integers(min_value=1, max_value=60), min_size=1,
                 max_size=12),
        st.integers(min_value=1, max_value=60),
    )
    @settings(max_examples=200, deadline=None)
    def test_release_is_stable_on_ties(self, new_ts, wm_ms):
        """Equal event times release in arrival order (mergesort) —
        the tie-break the operators rely on for deterministic output."""
        new = _mk_frame(new_ts)
        released, _still, _d = _reorder_release(None, [new], "ts", wm_ms)
        if released is None:
            return
        by_ts: dict = {}
        for t, rid in zip(released["ts"], released["rid"]):
            by_ts.setdefault(t, []).append(rid)
        for rids in by_ts.values():
            assert rids == sorted(rids)
