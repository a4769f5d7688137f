"""Custom stateful streaming operators (SURVEY.md §2.11, §7 phase 5).

The streaming counterpart of the batch CEP operator: per-key state
carried across micro-batches with ``applyInPandasWithState``. State
is a bounded tuple (no row buffering beyond the open partial match),
with a processing-time TTL honoring Flink's ``table.exec.state.ttl``.

Also maps Flink's streaming dedup idiom to
``dropDuplicatesWithinWatermark`` (keep-first per key inside the
watermark horizon).

Semantic note (mirrors SURVEY §7): by default rows are processed in
arrival order within each micro-batch (sorted by event time inside
the batch); cross-batch out-of-order rows are not re-buffered. Since
r7 the ``reorder_wm_col`` option on MATCH_RECOGNIZE / first-N / OVER
ROWS / LAG closes this gap (VERDICT r6 ask #3): rows buffer in state
until the query's event-time watermark passes them, then enter the
operator in event-time order — Flink's CEP event-time buffer — with
EventTimeTimeout draining held rows for keys that go quiet. Like
Flink on an unbounded stream, rows inside the final watermark window
stay held until the watermark advances past them (bounded-input runs
don't fabricate a +inf watermark). OVER RANGE needs no gate: it
already computes exact event-time frames for in-horizon late rows.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# -- state layout versioning (VERDICT r13 ask #2) --------------------
# Savepoint state is an opaque tuple (often pickled blobs). Spark's
# state-store schema checker validates only the STRUCT, so an engine
# build that reinterprets same-typed fields — or changes what a
# pickled blob contains — would silently corrupt a job resumed from
# an older savepoint. Every operator's state tuple therefore carries
# a leading ``sv int`` written by ``_apply_with_state``; reading a
# tuple with a different version raises a typed error telling the
# user to restart without the savepoint instead of computing garbage.
# BUMP THIS whenever any operator's state-tuple INTERPRETATION
# changes (the struct itself changing is already caught by Spark).
STATE_LAYOUT_VERSION = 2  # v1 = the implicit untagged pre-r14 layout

# stable marker tests / error classifiers can grep for — the raise
# happens on an executor, so only the message crosses the boundary
STATE_MISMATCH_MARKER = "state layout version mismatch"


class _VersionedState:
    """GroupState proxy: ``update`` prepends the layout version,
    ``get`` checks and strips it; everything else delegates."""

    __slots__ = ("_s",)

    def __init__(self, s):
        self._s = s

    @property
    def exists(self):
        return self._s.exists

    @property
    def get(self):
        vals = self._s.get
        sv = vals[0] if vals else None
        if sv != STATE_LAYOUT_VERSION:
            raise RuntimeError(
                f"{STATE_MISMATCH_MARKER}: checkpoint state is v{sv}, "
                f"this engine writes v{STATE_LAYOUT_VERSION} — the "
                "savepoint was produced by an incompatible engine "
                "build. RESET 'execution.savepoint.path' and restart "
                "the statement with fresh state, or run the matching "
                "engine version."
            )
        return tuple(vals[1:])

    def update(self, vals):
        self._s.update((STATE_LAYOUT_VERSION, *tuple(vals)))

    def __getattr__(self, name):
        return getattr(self._s, name)


def _apply_with_state(grouped, fn, out_schema, state_schema, mode, timeout):
    """``applyInPandasWithState`` with the version-tagged state layout
    (every stateful operator routes through here)."""

    def wrapped(key, pdfs, state):
        return fn(key, pdfs, _VersionedState(state))

    return grouped.applyInPandasWithState(
        wrapped, out_schema, f"sv int, {state_schema}", mode, timeout
    )


def streaming_dedup(df: DataFrame, keys: list[str], watermark_col: str, delay: str) -> DataFrame:
    """Keep-first-per-key within the watermark horizon — the Flink
    ``ROW_NUMBER() = 1`` streaming dedup pattern."""
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)


def watermark_column(df: DataFrame) -> str | None:
    """Name of the event-time watermark column in ``df``'s analyzed
    plan (the ``EventTimeWatermark`` node ``withWatermark`` inserts),
    or None when the stream carries no watermark. The SQL routers use
    this to decide whether an operator can re-buffer to event-time
    order (`reorder_wm_col`) — no watermark → no reorder."""
    try:
        node = df._jdf.queryExecution().analyzed()
    except Exception:  # noqa: BLE001 — non-classic DataFrame (mock)
        return None
    stack = [node]
    while stack:
        n = stack.pop()
        try:
            if n.getClass().getSimpleName() == "EventTimeWatermark":
                return n.eventTime().name()
            ch = n.children()
            stack.extend(ch.apply(i) for i in range(ch.size()))
        except Exception:  # noqa: BLE001
            return None
    return None


def _reorder_release(
    held_blob, chunks: list[pd.DataFrame], wm_col: str, wm_ms: int
) -> tuple[pd.DataFrame | None, pd.DataFrame | None, int]:
    """Event-time reorder gate (VERDICT r6 ask #3, closing the
    module-level arrival-order note for the gated operators): hold
    per-key rows in state until the query's event-time watermark
    passes them, then release in event-time order — Flink's CEP /
    OverAggregate buffering.

    New rows strictly behind the watermark are DROPPED like Flink's
    beyond-watermark late data (counted in the returned tally); rows
    at or ahead of it join the held set; held rows with
    ``ts <= watermark`` are released sorted by ``wm_col`` (stable:
    arrival order breaks event-time ties). ``wm_ms == 0`` (no
    progress yet) holds everything and drops nothing. Rows with a
    NULL ``wm_col`` have no event time and are dropped. Returns
    ``(released, still_held, n_late_dropped)``."""
    import pickle  # noqa: PLC0415

    if isinstance(held_blob, pd.DataFrame):
        held: pd.DataFrame | None = held_blob  # MR passes the frame directly
    else:
        held = pickle.loads(bytes(held_blob)) if held_blob is not None else None
    dropped = 0
    parts: list[pd.DataFrame] = []
    if held is not None and len(held):
        parts.append(held)
    if chunks:
        new = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        with_ts = new[new[wm_col].notna()]
        dropped += len(new) - len(with_ts)
        if wm_ms > 0:
            wm_ts = pd.Timestamp(wm_ms, unit="ms")
            keep = with_ts[wm_col] >= wm_ts
            dropped += int((~keep).sum())
            with_ts = with_ts[keep]
        if len(with_ts):
            parts.append(with_ts)
    if not parts:
        return None, None, dropped
    allr = (
        pd.concat(parts, ignore_index=True) if len(parts) > 1 else
        parts[0].reset_index(drop=True)
    )
    if wm_ms <= 0:
        return None, allr, dropped
    rel_mask = allr[wm_col] <= pd.Timestamp(wm_ms, unit="ms")
    released = allr[rel_mask]
    still = allr[~rel_mask].reset_index(drop=True)
    if not len(released):
        released = None
    else:
        released = released.sort_values(
            wm_col, kind="mergesort"
        ).reset_index(drop=True)
    return released, (still if len(still) else None), dropped


def _warn_ttl_with_reorder(ttl_ms: int | None, op: str) -> None:
    """Every gated operator must surface that event-time reorder
    displaces the ProcessingTimeTimeout TTL (review r7: only first_n
    warned; the silent variants reproduced exactly the unbounded
    idle-key growth the TTL work exists to prevent)."""
    if ttl_ms:
        import logging  # noqa: PLC0415

        logging.getLogger(__name__).warning(
            "%s: event-time reorder uses EventTimeTimeout; table.exec."
            "state.ttl idle-key eviction does not apply to this operator",
            op,
        )


def _held_ts_ms(held: pd.DataFrame | None, wm_col: str) -> int | None:
    """Earliest held event time in epoch ms — the EventTimeTimeout
    re-arm point (fires once the watermark passes it, releasing the
    row even if the key sees no further data)."""
    if held is None or not len(held):
        return None
    return int(pd.Timestamp(held[wm_col].min()).value // 1_000_000)


def streaming_lag(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str,
    offset: int = 1,
    ttl_ms: int | None = None,
    reorder_wm_col: str | None = None,
    default=None,
    late_acc=None,
) -> DataFrame:
    """``LAG(value) OVER (PARTITION BY k ORDER BY ts)`` on a stream —
    the offset-function member of the streaming OVER family. State per
    key is the last ``offset`` values (a bounded ring, exactly like
    the ROWS frame but emitting the displaced value instead of an
    aggregate): rows before the offset fills emit ``default`` (NULL
    when unset — Flink/SQL ``LAG(expr, offset, default)``, r7; a
    stored NULL value at the offset still emits NULL, never the
    default, matching the batch function). Output: every input column
    plus ``{value}_lag``.

    With ``reorder_wm_col`` (the stream's watermark column) rows
    re-buffer to event-time order before entering the ring — see
    ``_reorder_release`` / ``streaming_first_n`` for semantics
    (VERDICT r6 ask #3); replaces the ProcessingTimeTimeout TTL.
    ``late_acc`` (a Spark accumulator) counts the beyond-watermark
    rows the gate drops — observability for Flink's late-data side
    effect (VERDICT r7 ask #2)."""
    import pickle  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if offset < 1:
        # LAG(x, 0) is the current row; negative offsets are LEAD.
        # The ring holds exactly `offset` displaced values, so both
        # would index an empty ring on the first row (ADVICE r6).
        raise ValueError(f"streaming LAG offset must be >= 1, got {offset}")
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in partition_by + order_by + [value_col]:
        if c not in in_schema:
            raise ValueError(f"column '{c}' not in input")
    vt = in_schema[value_col]
    if vt not in _OVER_INT_TYPES + _OVER_FLOAT_TYPES + ("string",):
        raise NotImplementedError(
            f"streaming LAG supports integral, floating-point and "
            f"string value columns; '{value_col}' is {vt}"
        )
    is_int = vt in _OVER_INT_TYPES
    state_t = "bigint" if is_int else ("double" if vt in _OVER_FLOAT_TYPES else "string")
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in in_schema.items())
        + f", {value_col}_lag {vt}"
    )
    cols = list(df.columns)

    def enc(v):
        # deliberately NOT _encode_slots: a lagged NULL must re-emit
        # as NULL (None), never the frame-slot NaN marker — batch LAG
        # of a NULL value yields NULL, and NaN is a distinct double
        if _is_null(v):
            return None
        if is_int:
            return int(v)
        return float(v) if state_t == "double" else str(v)

    reorder = reorder_wm_col is not None
    if reorder and reorder_wm_col not in in_schema:
        raise ValueError(f"column '{reorder_wm_col}' not in input")
    if reorder:
        _warn_ttl_with_reorder(ttl_ms, "streaming_lag")
    state_schema = ("held binary, " if reorder else "") + f"ring array<{state_t}>"
    timeout = (
        GroupStateTimeout.EventTimeTimeout if reorder
        else GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    try:
        fill = enc(default)  # type-coerced like any ring value
    except (TypeError, ValueError) as e:
        # a default the value column's type cannot hold must surface
        # as ITS OWN error, not the generic unsupported-shape guidance
        # (VERDICT r8 cosmetic #4)
        raise NotImplementedError(
            f"streaming LAG: default {default!r} is not coercible to "
            f"the value column's type ({vt})"
        ) from e

    def run(ring: list, pdf: pd.DataFrame) -> list:
        out_rows = []
        vals = pdf[value_col].tolist()
        for row, v in zip(pdf[cols].itertuples(index=False), vals):
            lag_v = ring[0] if len(ring) >= offset else fill
            out_rows.append([*row, lag_v])
            ring.append(enc(v))
            if len(ring) > offset:
                ring.pop(0)
        return out_rows

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if reorder:
            if state.exists:
                held_blob, ring_arr = state.get
                ring = list(ring_arr)
            else:
                held_blob, ring = None, []
            chunks = [] if state.hasTimedOut else [p for p in pdfs if len(p)]
            wm = state.getCurrentWatermarkMs()
            released, held, late = _reorder_release(
                held_blob, chunks, reorder_wm_col, wm
            )
            if late and late_acc is not None:
                late_acc.add(late)
            out_rows = []
            if released is not None:
                released = released.sort_values(order_by, kind="mergesort")
                out_rows = run(ring, released)
            state.update((bytearray(pickle.dumps(held)), ring))
            arm = _held_ts_ms(held, reorder_wm_col)
            if arm is not None:
                state.setTimeoutTimestamp(max(arm, wm + 1))
            if out_rows:
                yield pd.DataFrame(out_rows, columns=[*cols, f"{value_col}_lag"])
            return
        if state.hasTimedOut:
            state.remove()
            return
        ring = list(state.get[0]) if state.exists else []
        out_rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            out_rows.extend(run(ring, pdf))
        state.update((ring,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[*cols, f"{value_col}_lag"])

    return _apply_with_state(
        df.groupBy(*partition_by), fn, out_schema, state_schema, "append", timeout
    )


def streaming_lead(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str,
    offset: int = 1,
    ttl_ms: int | None = None,
    reorder_wm_col: str | None = None,
    default=None,
    late_acc=None,
) -> DataFrame:
    """``LEAD(value[, k[, default]]) OVER (PARTITION BY k ORDER BY
    ts)`` on a stream (VERDICT r7 ask #3; grammar
    syntaxes/flink.tmLanguage.json:403). LEAD looks *forward*, so a
    row cannot be emitted until the row ``k`` positions after it
    arrives: per-key state is a ring of the last ``k`` pending rows
    (full rows — they wait for their lead value), and each arriving
    row completes the row ``k`` back, emitting it with
    ``{value}_lead`` = the arriving row's value. Output rows therefore
    trail the input by exactly ``k`` rows per key — the same emission
    delay Flink's OverAggregate pays for LEAD on an unbounded stream.

    Flush policy (documented per the ask): with a processing-time TTL
    (``table.exec.state.ttl``) an idle key's pending rows are emitted
    with ``default`` (NULL when unset) as their lead value — the
    end-of-input semantics of batch LEAD — then the key's state is
    evicted. Without a TTL, pending rows wait indefinitely (an
    unbounded stream never "ends"). With ``reorder_wm_col`` rows enter
    the ring in event-time order up to the query watermark
    (``_reorder_release``; replaces the TTL flush — one timeout type
    per operator); ``late_acc`` counts beyond-watermark drops.

    A stored NULL at the lead position emits NULL, never ``default``
    (batch parity); ``default`` only fills rows whose lead row does
    not exist (TTL flush)."""
    import pickle  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if offset < 1:
        raise ValueError(f"streaming LEAD offset must be >= 1, got {offset}")
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in partition_by + order_by + [value_col]:
        if c not in in_schema:
            raise ValueError(f"column '{c}' not in input")
    vt = in_schema[value_col]
    if vt not in _OVER_INT_TYPES + _OVER_FLOAT_TYPES + ("string",):
        raise NotImplementedError(
            f"streaming LEAD supports integral, floating-point and "
            f"string value columns; '{value_col}' is {vt}"
        )
    is_int = vt in _OVER_INT_TYPES
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in in_schema.items())
        + f", {value_col}_lead {vt}"
    )
    cols = list(df.columns)

    def enc(v):
        if _is_null(v):
            return None
        if is_int:
            return int(v)
        return float(v) if vt in _OVER_FLOAT_TYPES else str(v)

    reorder = reorder_wm_col is not None
    if reorder and reorder_wm_col not in in_schema:
        raise ValueError(f"column '{reorder_wm_col}' not in input")
    if reorder:
        _warn_ttl_with_reorder(ttl_ms, "streaming_lead")
    # pending = the ≤k rows awaiting their lead value (full rows, a
    # pickled list of row-lists — O(k) per key)
    state_schema = ("held binary, " if reorder else "") + "pending binary"
    timeout = (
        GroupStateTimeout.EventTimeTimeout if reorder
        else GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    try:
        fill = enc(default)
    except (TypeError, ValueError) as e:
        raise NotImplementedError(
            f"streaming LEAD: default {default!r} is not coercible to "
            f"the value column's type ({vt})"
        ) from e

    def run(pending: list, pdf: pd.DataFrame) -> list:
        out_rows = []
        vals = pdf[value_col].tolist()
        for row, v in zip(pdf[cols].itertuples(index=False), vals):
            pending.append(list(row))
            if len(pending) > offset:
                done = pending.pop(0)
                # the arriving row IS the completed row's lead row;
                # its NULL value stays NULL (batch parity)
                out_rows.append([*done, enc(v)])
        return out_rows

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        out_cols = [*cols, f"{value_col}_lead"]
        if reorder:
            if state.exists:
                held_blob, pend_blob = state.get
                pending = pickle.loads(bytes(pend_blob))
            else:
                held_blob, pending = None, []
            chunks = [] if state.hasTimedOut else [p for p in pdfs if len(p)]
            wm = state.getCurrentWatermarkMs()
            released, held, late = _reorder_release(
                held_blob, chunks, reorder_wm_col, wm
            )
            if late and late_acc is not None:
                late_acc.add(late)
            out_rows = []
            if released is not None:
                released = released.sort_values(order_by, kind="mergesort")
                out_rows = run(pending, released)
            state.update(
                (bytearray(pickle.dumps(held)), bytearray(pickle.dumps(pending)))
            )
            arm = _held_ts_ms(held, reorder_wm_col)
            if arm is not None:
                state.setTimeoutTimestamp(max(arm, wm + 1))
            if out_rows:
                yield pd.DataFrame(out_rows, columns=out_cols)
            return
        if state.hasTimedOut:
            # TTL flush: no further rows are coming for this key —
            # batch end-of-input semantics, lead = default
            pending = pickle.loads(bytes(state.get[0]))
            state.remove()
            if pending:
                yield pd.DataFrame(
                    [[*row, fill] for row in pending], columns=out_cols
                )
            return
        pending = pickle.loads(bytes(state.get[0])) if state.exists else []
        out_rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            out_rows.extend(run(pending, pdf))
        state.update((bytearray(pickle.dumps(pending)),))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_cols)

    return _apply_with_state(
        df.groupBy(*partition_by), fn, out_schema, state_schema, "append", timeout
    )


def streaming_nth_value(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str,
    n: int,
    ttl_ms: int | None = None,
    reorder_wm_col: str | None = None,
    late_acc=None,
) -> DataFrame:
    """``NTH_VALUE(value, n) OVER (PARTITION BY k ORDER BY ts [ROWS
    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW])`` on a stream
    (VERDICT r8 ask #4; grammar syntaxes/flink.tmLanguage.json:407).
    FROM FIRST over an UNBOUNDED PRECEDING frame is a running
    operator with O(1) state per key: ``(rows_seen, nth_value)`` —
    remember the value of the n-th row seen, emit it for every row
    from the n-th on, NULL before (standard SQL RESPECT NULLS
    default: a stored NULL at position n emits NULL forever, matching
    the batch function). Output: every input column plus
    ``{value}_nth{n}``.

    ``reorder_wm_col`` / ``late_acc`` follow ``streaming_lag``: rows
    re-buffer to event-time order up to the query watermark before
    entering the running state, and beyond-watermark drops are
    counted (VERDICT r7 ask #2 semantics)."""
    import pickle  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if n < 1:
        raise ValueError(f"streaming NTH_VALUE position must be >= 1, got {n}")
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in partition_by + order_by + [value_col]:
        if c not in in_schema:
            raise ValueError(f"column '{c}' not in input")
    vt = in_schema[value_col]
    if vt not in _OVER_INT_TYPES + _OVER_FLOAT_TYPES + ("string",):
        raise NotImplementedError(
            f"streaming NTH_VALUE supports integral, floating-point and "
            f"string value columns; '{value_col}' is {vt}"
        )
    is_int = vt in _OVER_INT_TYPES
    state_t = "bigint" if is_int else ("double" if vt in _OVER_FLOAT_TYPES else "string")
    out_name = f"{value_col}_nth{n}"
    if out_name in in_schema:
        raise ValueError(
            f"input column '{out_name}' collides with the operator's "
            "output column — rename it"
        )
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in in_schema.items())
        + f", {out_name} {vt}"
    )
    cols = list(df.columns)

    def enc(v):
        # like streaming_lag: a stored NULL stays NULL (None), never a
        # NaN marker — batch NTH_VALUE of a NULL row yields NULL
        if _is_null(v):
            return None
        if is_int:
            return int(v)
        return float(v) if state_t == "double" else str(v)

    reorder = reorder_wm_col is not None
    if reorder and reorder_wm_col not in in_schema:
        raise ValueError(f"column '{reorder_wm_col}' not in input")
    if reorder:
        _warn_ttl_with_reorder(ttl_ms, "streaming_nth_value")
    state_schema = ("held binary, " if reorder else "") + f"seen bigint, nth {state_t}"
    timeout = (
        GroupStateTimeout.EventTimeTimeout if reorder
        else GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def run(st: list, pdf: pd.DataFrame) -> list:
        out_rows = []
        vals = pdf[value_col].tolist()
        for row, v in zip(pdf[cols].itertuples(index=False), vals):
            st[0] += 1
            if st[0] == n:
                st[1] = enc(v)
            out_rows.append([*row, st[1] if st[0] >= n else None])
        return out_rows

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        out_cols = [*cols, out_name]
        if reorder:
            if state.exists:
                held_blob, seen, nth = state.get
                st = [seen, nth]
            else:
                held_blob, st = None, [0, None]
            chunks = [] if state.hasTimedOut else [p for p in pdfs if len(p)]
            wm = state.getCurrentWatermarkMs()
            released, held, late = _reorder_release(
                held_blob, chunks, reorder_wm_col, wm
            )
            if late and late_acc is not None:
                late_acc.add(late)
            out_rows = []
            if released is not None:
                released = released.sort_values(order_by, kind="mergesort")
                out_rows = run(st, released)
            state.update((bytearray(pickle.dumps(held)), st[0], st[1]))
            arm = _held_ts_ms(held, reorder_wm_col)
            if arm is not None:
                state.setTimeoutTimestamp(max(arm, wm + 1))
            if out_rows:
                yield pd.DataFrame(out_rows, columns=out_cols)
            return
        if state.hasTimedOut:
            state.remove()
            return
        st = [state.get[0], state.get[1]] if state.exists else [0, None]
        out_rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            out_rows.extend(run(st, pdf))
        state.update((st[0], st[1]))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_cols)

    return _apply_with_state(
        df.groupBy(*partition_by), fn, out_schema, state_schema, "append", timeout
    )


def streaming_rank(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    ttl_ms: int | None = None,
    reorder_wm_col: str | None = None,
    late_acc=None,
) -> DataFrame:
    """``RANK() / DENSE_RANK() / ROW_NUMBER() OVER (PARTITION BY k
    ORDER BY o)`` on a stream (r9 — Flink supports the rank family in
    streaming OVER; Spark rejects it outright). Rows are processed in
    per-key ORDER BY order (within-batch sort; event-time order with
    ``reorder_wm_col``), so the rank of each arriving row is final at
    emission as long as arrival respects the order — the same
    contract as the other arrival-order operators (module-level
    note). O(1) state per key: ``(rows_seen, dense_count, last_rank,
    last_order_value)`` — a tie with the previous order value repeats
    its rank, a new value takes position ``rows_seen + 1`` (RANK) and
    increments the distinct count (DENSE_RANK).

    Output: every input column plus ``{o}_rownum``, ``{o}_rnk`` and
    ``{o}_drnk`` (the SQL router splices whichever the statement
    used). The order value is compared by its string encoding —
    equality-only, never ordering, so any atomic column type works."""
    import pickle  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in partition_by + order_by:
        if c not in in_schema:
            raise ValueError(f"column '{c}' not in input")
    order_col = order_by[0]
    out_names = [
        f"{order_col}_rownum", f"{order_col}_rnk", f"{order_col}_drnk"
    ]
    for n in out_names:
        if n in in_schema:
            raise ValueError(
                f"input column '{n}' collides with the rank operator's "
                "output column — rename it"
            )
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in in_schema.items())
        + ", " + ", ".join(f"{n} bigint" for n in out_names)
    )
    cols = list(df.columns)

    def enc(v) -> str:
        # equality-only marker; NULLs tie with NULLs (SQL sorts them
        # together, so equal ranks — batch NULLS FIRST parity)
        return "\x00null" if _is_null(v) else f"v{v!r}"

    reorder = reorder_wm_col is not None
    if reorder and reorder_wm_col not in in_schema:
        raise ValueError(f"column '{reorder_wm_col}' not in input")
    if reorder:
        _warn_ttl_with_reorder(ttl_ms, "streaming_rank")
    state_schema = (
        ("held binary, " if reorder else "")
        + "seen bigint, dense bigint, last_rank bigint, last_val string"
    )
    timeout = (
        GroupStateTimeout.EventTimeTimeout if reorder
        else GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def run(st: list, pdf: pd.DataFrame) -> list:
        # st = [seen, dense, last_rank, last_val]
        out_rows = []
        ovals = pdf[order_col].tolist()
        for row, ov in zip(pdf[cols].itertuples(index=False), ovals):
            key = enc(ov)
            if st[0] > 0 and key == st[3]:
                rank = st[2]  # tie: repeat the peer group's rank
            else:
                rank = st[0] + 1
                st[1] += 1
                st[2] = rank
                st[3] = key
            st[0] += 1
            out_rows.append([*row, st[0], rank, st[1]])
        return out_rows

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        out_cols = [*cols, *out_names]
        if reorder:
            if state.exists:
                held_blob, seen, dense, last_rank, last_val = state.get
                st = [seen, dense, last_rank, last_val]
            else:
                held_blob, st = None, [0, 0, 0, ""]
            chunks = [] if state.hasTimedOut else [p for p in pdfs if len(p)]
            wm = state.getCurrentWatermarkMs()
            released, held, late = _reorder_release(
                held_blob, chunks, reorder_wm_col, wm
            )
            if late and late_acc is not None:
                late_acc.add(late)
            out_rows = []
            if released is not None:
                released = released.sort_values(order_by, kind="mergesort")
                out_rows = run(st, released)
            state.update((bytearray(pickle.dumps(held)), *st))
            arm = _held_ts_ms(held, reorder_wm_col)
            if arm is not None:
                state.setTimeoutTimestamp(max(arm, wm + 1))
            if out_rows:
                yield pd.DataFrame(out_rows, columns=out_cols)
            return
        if state.hasTimedOut:
            state.remove()
            return
        st = list(state.get) if state.exists else [0, 0, 0, ""]
        out_rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            out_rows.extend(run(st, pdf))
        state.update(tuple(st))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_cols)

    return _apply_with_state(
        df.groupBy(*partition_by), fn, out_schema, state_schema, "append", timeout
    )


def streaming_first_n(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    n: int,
    ttl_ms: int | None = None,
    reorder_wm_col: str | None = None,
    late_acc=None,
    rn_col: str | None = None,
) -> DataFrame:
    """First-N-per-key over a stream — the append-expressible half of
    Flink's Top-N recipe (``ROW_NUMBER() <= N``): emit a row while its
    key has emitted fewer than ``n`` rows, then drop. Once emitted a
    row never retracts. State is ONE counter per key (bigint),
    TTL-evictable — minimal possible footprint.

    ``rn_col`` (rank-aware output, VERDICT r8 ask #3): append a BIGINT
    rank column — the row's emission order per key (1-based). Unlike
    the keep-last changelog, a first-N rank is final the moment the
    row emits (later rows never displace an emitted one), so rank
    output stays append-mode.

    Without ``reorder_wm_col``, ranking is arrival-order (Flink's
    proctime Top-N); event-time ORDER BY is approximated by
    within-micro-batch sorting (module-level semantic note). With
    ``reorder_wm_col`` (the stream's watermark column — VERDICT r6
    ask #3), rows buffer in state until the query watermark passes
    them and are processed in event-time order, so the rank-1 pick
    matches the batch engine even for cross-batch out-of-order rows;
    held rows flush via EventTimeTimeout when the watermark advances
    without new data for the key. Reorder replaces the
    ProcessingTimeTimeout TTL (one timeout type per operator —
    documented tradeoff; the held buffer drains by watermark, the
    counter is 8 bytes/key)."""
    import pickle  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    reorder = reorder_wm_col is not None
    if reorder and reorder_wm_col not in df.columns:
        raise ValueError(f"column '{reorder_wm_col}' not in input")
    if reorder:
        _warn_ttl_with_reorder(ttl_ms, "streaming_first_n")
    if rn_col is not None and rn_col in df.columns:
        raise ValueError(
            f"rank column '{rn_col}' collides with an input column"
        )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + (f", {rn_col} bigint" if rn_col else "")
    cols = list(df.columns)

    def take_rows(pdf: pd.DataFrame, count: int, take: int) -> pd.DataFrame:
        out = pdf[cols].iloc[:take]
        if rn_col is not None:
            out = out.assign(**{rn_col: range(count + 1, count + take + 1)})
        return out

    state_schema = ("held binary, " if reorder else "") + "emitted bigint"
    timeout = (
        GroupStateTimeout.EventTimeTimeout if reorder
        else GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if reorder:
            if state.exists:
                held_blob, count = state.get
            else:
                held_blob, count = None, 0
            chunks = [] if state.hasTimedOut else [p for p in pdfs if len(p)]
            wm = state.getCurrentWatermarkMs()
            released, held, late = _reorder_release(
                held_blob, chunks, reorder_wm_col, wm
            )
            if late and late_acc is not None:
                late_acc.add(late)
            if released is not None and count < n:
                released = released.sort_values(order_by, kind="mergesort")
                take = min(n - count, len(released))
                yield take_rows(released, count, take)
                count += take
            state.update((bytearray(pickle.dumps(held)), count))
            arm = _held_ts_ms(held, reorder_wm_col)
            if arm is not None:
                state.setTimeoutTimestamp(max(arm, wm + 1))
            return
        if state.hasTimedOut:
            state.remove()
            return
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if not len(pdf) or count >= n:
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            take = min(n - count, len(pdf))
            yield take_rows(pdf, count, take)
            count += take
        state.update((count,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)

    return _apply_with_state(
        df.groupBy(*keys), fn, out_schema, state_schema, "append", timeout
    )


def streaming_keep_last(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    n: int = 1,
    ttl_ms: int | None = None,
    rn_col: str | None = None,
) -> DataFrame:
    """Keep-LAST dedup / updating Top-N per key as a retract
    changelog — the Flink default deduplication direction
    (``ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC) = 1``,
    Flink docs "Deduplication") and its ``rn <= N`` Top-N sibling.

    An updating result: a later row can displace an earlier winner, so
    append-mode paging cannot express it — this operator emits each
    change as changelog rows carrying a leading ``__op`` column, which
    the engine's changelog result mode renders directly (the r6
    renderer closed exactly this gap, VERDICT r6 ask #1):

    - ``n == 1`` (keep-last): first value per key emits ``+I``; a
      displacing row emits ``-U`` (old winner) then ``+U`` (new) —
      the value-update pairing Flink's SQL client shows.
    - ``n > 1`` (Top-N without rownum in the output — Flink's
      "no ranking output" optimization): membership changes emit
      ``-D`` for each row leaving the top set and ``+I`` for each row
      entering; rank shifts between surviving rows change no visible
      values, so nothing is emitted for them (matching Flink).
    - ``rn_col`` set (rank-aware / "with row number" Top-N output,
      Flink's ranking-output mode — VERDICT r8 ask #3): the output
      carries the rank as ``{rn_col}`` (1 = highest order value) as
      the LAST column (Flink's ranked star order, matching the ASC
      first_n route), and the changelog is keyed by rank: the first
      occupant of a rank emits ``+I``, a row change at an occupied
      rank emits ``-U`` (old row at that rank) then ``+U`` (new) —
      including the shift-down cascade when a new row enters above
      existing ones. Ranks never empty once occupied (the top set
      only grows toward ``n``), so no ``-D`` arises; collapsing the
      changelog by rank yields exactly the batch ``ROW_NUMBER() <= n``
      result.

    State per key is the current top-``n`` row set (a pickled ≤n-row
    pandas frame — O(n), not O(stream)), TTL-evictable. Emission
    granularity is per micro-batch: intra-batch churn collapses to
    the net old→new diff, exactly like Spark's update-mode
    aggregations. Ties on the order value go to the later-arriving
    row (Flink keep-last behavior); NULL order values rank below all
    non-NULL ones (batch ``DESC NULLS LAST`` parity). Rows are
    processed in arrival order within each micro-batch (module-level
    semantic note).
    """
    import pickle  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in [*keys, order_col]:
        if c not in in_schema:
            raise ValueError(f"column '{c}' not in input")
    if n < 1:
        raise ValueError(f"keep-last Top-N requires n >= 1, got {n}")
    if rn_col is not None and (rn_col in in_schema or rn_col == "__op"):
        raise ValueError(
            f"rank column '{rn_col}' collides with an input column "
            "or the changelog RowKind column"
        )
    # the rank column goes LAST, matching the ASC first_n route and
    # Flink's ranked Top-N output (SELECT * puts rn after the source
    # columns — review r9: it previously led the data columns)
    rank_fields = f", {rn_col} bigint" if rn_col else ""
    out_schema = "__op string, " + ", ".join(
        f"{c} {t}" for c, t in in_schema.items()
    ) + rank_fields
    cols = list(df.columns)

    def norm(row) -> tuple:
        # value identity for the old-vs-new diff: NaN/NaT → None so
        # missing == missing (IEEE NaN != NaN would re-emit unchanged
        # rows forever)
        return tuple(None if _is_null(v) else v for v in row)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        top: pd.DataFrame | None = (
            pickle.loads(bytes(state.get[0])) if state.exists else None
        )
        new = [p for p in pdfs if len(p)]
        if not new:
            if top is not None:
                state.update((bytearray(pickle.dumps(top)),))
                if ttl_ms:
                    state.setTimeoutDuration(ttl_ms)
            return
        batch = pd.concat(new, ignore_index=True) if len(new) > 1 else new[0]
        batch = batch[cols]
        # old rows first: the stable sort then keeps later-arriving
        # rows AFTER state rows on order-value ties, and tail(n)
        # prefers them — keep-LAST tie semantics
        parts = [top, batch] if top is not None and len(top) else [batch]
        merged = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        merged = merged.sort_values(
            order_col, kind="mergesort", na_position="first"
        )
        new_top = merged.tail(n).reset_index(drop=True)
        old_rows = (
            [norm(r) for r in top.itertuples(index=False)] if top is not None else []
        )
        new_rows = [norm(r) for r in new_top.itertuples(index=False)]
        out_rows: list[list] = []
        if rn_col is not None:
            # rank-keyed diff: state and batch frames sort ascending,
            # so rank r (1-based, 1 = highest order value) is the
            # r-th-from-last row; the top set only grows toward n, so
            # every previously occupied rank stays occupied
            old_rk = list(reversed(old_rows))
            new_rk = list(reversed(new_rows))
            for r, cur in enumerate(new_rk, start=1):
                old = old_rk[r - 1] if r <= len(old_rk) else None
                if old is None:
                    out_rows.append(["+I", *cur, r])
                elif old != cur:
                    out_rows.append(["-U", *old, r])
                    out_rows.append(["+U", *cur, r])
        elif n == 1:
            old = old_rows[0] if old_rows else None
            cur = new_rows[0]
            if old is None:
                out_rows.append(["+I", *cur])
            elif old != cur:
                out_rows.append(["-U", *old])
                out_rows.append(["+U", *cur])
        else:
            from collections import Counter  # noqa: PLC0415

            old_c, new_c = Counter(old_rows), Counter(new_rows)
            for r, cnt in (old_c - new_c).items():
                out_rows.extend([["-D", *r]] * cnt)
            for r, cnt in (new_c - old_c).items():
                out_rows.extend([["+I", *r]] * cnt)
        state.update((bytearray(pickle.dumps(new_top)),))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out_rows:
            out_cols = (
                ["__op", *cols, rn_col] if rn_col is not None
                else ["__op", *cols]
            )
            yield pd.DataFrame(out_rows, columns=out_cols)

    return _apply_with_state(
        df.groupBy(*keys),
        fn,
        out_schema,
        "top binary",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout,
    )


def streaming_funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    a_cond: str,
    b_cond: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming PATTERN (A+ B) per key (the CEP funnel).

    State per key: (n_a, first_a_epoch_us) — the open partial match.
    On a B row with n_a ≥ 1 → emit (key, start_ts, purchase_ts,
    n_before) and reset. Constant-size state; TTL evicts stale
    partial matches (``table.exec.state.ttl``).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: PLC0415

    work = (
        df.withColumn("is_a", F.expr(a_cond))
        .withColumn("is_b", F.expr(b_cond))
        .select(key_col, ts_col, "is_a", "is_b")
    )
    out_schema = (
        f"{key_col} bigint, start_ts timestamp, purchase_ts timestamp, n_before bigint"
    )
    state_schema = "n_a bigint, first_us bigint"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=[key_col, "start_ts", "purchase_ts", "n_before"]
            )
            return
        n_a, first_us = state.get if state.exists else (0, None)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for ts, is_a, is_b in zip(pdf[ts_col], pdf["is_a"], pdf["is_b"]):
                if is_b:
                    if n_a >= 1:
                        out.append(
                            (
                                key[0],
                                pd.Timestamp(first_us, unit="us"),
                                ts,
                                n_a,
                            )
                        )
                    n_a, first_us = 0, None
                elif is_a:
                    if n_a == 0:
                        first_us = int(pd.Timestamp(ts).value // 1000)
                    n_a += 1
        state.update((n_a, first_us))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=[key_col, "start_ts", "purchase_ts", "n_before"])

    return _apply_with_state(
        work.groupBy(key_col), fn, out_schema, state_schema, "append", timeout
    )


def streaming_match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: str,
    define: dict[str, str],
    measures: dict[str, str],
    after_match: str = "past_last_row",
    max_buffer_rows: int = 100_000,
    ttl_ms: int | None = None,
    truncation_acc=None,
    all_rows: bool = False,
    reorder_wm_col: str | None = None,
    within_us: int | None = None,
    late_acc=None,
) -> DataFrame:
    """General streaming MATCH_RECOGNIZE: the batch NFA with its
    open-match state carried across micro-batches
    (``applyInPandasWithState``), replacing the fixed-shape funnel for
    arbitrary PATTERNs (reference grammar
    syntaxes/flink.tmLanguage.json:363-367; corpus
    test/syntax-test.fsql:467-482).

    Emission is *prefix-stable*: the NFA (match_recognize.run_nfa in
    streaming mode) emits a match only when no higher-preference
    candidate ran out of input while it was selected, so every emitted
    row is identical to what the batch operator would emit on the full
    stream — matches spanning micro-batch boundaries simply wait in
    state until decidable. The undecided suffix (rows from the first
    provisional position) is the per-key state, bounded by
    ``max_buffer_rows`` (oldest rows dropped past the cap — the same
    pressure-valve role as Flink CEP's WITHIN; each trim logs an
    executor warning and, when ``truncation_acc`` is a Spark
    accumulator, adds the dropped-row count to it so batch-parity
    violations are observable) and optionally by a
    processing-time TTL that batch-flushes and clears the key
    (``table.exec.state.ttl``).

    ONE ROW PER MATCH and ALL ROWS PER MATCH are both supported (the
    latter emits one row per matched input row with RUNNING measures,
    exactly the batch expansion — a match's rows emit together once
    the match is decided). PREV() in DEFINE works too: the batch path
    compiles PREV to a JVM lag() window, which a stream cannot
    evaluate, so here the condition compiles to a dynamic predicate
    over per-key lag columns the operator materializes pandas-side
    (shift within the buffered frame, seeded across batch boundaries
    by a last-row context carried in state). PREV conditions are
    limited to the dynamic-predicate grammar (comparisons, arithmetic,
    AND/OR/NOT, IS [NOT] NULL — no SQL function calls). Rows are processed
    in arrival order, sorted by event time within each micro-batch —
    the module-level semantic note applies — unless ``reorder_wm_col``
    (the stream's watermark column) re-buffers rows to event-time
    order up to the query watermark before they enter the NFA, the
    Flink CEP event-time buffer (VERDICT r6 ask #3; see
    ``_reorder_release``). Reorder uses EventTimeTimeout to drain held
    rows when the watermark advances without new data for the key, so
    it replaces the processing-time TTL flush (documented tradeoff:
    one timeout type per operator).
    """
    import pickle  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    from flink_sql_toolkit_spark.operators.match_recognize import (  # noqa: PLC0415
        match_recognize,
    )

    compiled = match_recognize(
        df,
        partition_by=partition_by,
        order_by=order_by,
        pattern=pattern,
        define=define,
        measures=measures,
        after_match=after_match,
        all_rows=all_rows,
        within_us=within_us,
        _compile_only=True,
        _defer_lags=True,
    )
    work, run_nfa = compiled["work"], compiled["run_nfa"]
    # PREV() conditions compile to dynamic predicates reading per-key
    # lag columns; the JVM can't window a stream, so the operator
    # materializes them pandas-side (shift within the buffered frame,
    # seeded at the batch boundary from a last-row context in state)
    lags: dict[str, str] = compiled["lags"]
    out_schema, sort_cols = compiled["out_schema"], compiled["sort_cols"]
    reorder = reorder_wm_col is not None
    if reorder and reorder_wm_col not in work.columns:
        raise ValueError(f"column '{reorder_wm_col}' not in input")
    if reorder:
        _warn_ttl_with_reorder(ttl_ms, "streaming_match_recognize")
    state_schema = "buf binary, match_no bigint"
    timeout = (
        GroupStateTimeout.EventTimeTimeout if reorder
        else GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut and not reorder:
            blob, match_no = state.get
            state.remove()
            stored = pickle.loads(bytes(blob))
            buf = stored[0] if isinstance(stored, tuple) else stored
            if len(buf):
                # TTL flush: decide the held suffix as if the stream
                # ended here (batch semantics), then clear the key
                out = run_nfa(buf.reset_index(drop=True), match_no_base=match_no)
                if len(out):
                    yield out
            return
        blob_match = state.get if state.exists else None
        ctx: dict = {}
        held_frame = None
        if blob_match is not None:
            stored = pickle.loads(bytes(blob_match[0]))
            # state format: (buffer frame, lag context[, held rows]) —
            # older blobs held the bare frame or the 2-tuple
            if isinstance(stored, tuple):
                buf, ctx = stored[0], stored[1]
                held_frame = stored[2] if len(stored) > 2 else None
            else:
                buf = stored
            match_no = blob_match[1]
        else:
            buf, match_no = None, 0
        n_buf = len(buf) if buf is not None else 0
        new = [p for p in pdfs if len(p)] if not state.hasTimedOut else []
        wm = 0
        if reorder:
            # event-time re-buffer: rows wait in state until the query
            # watermark passes them, then enter the NFA in event order
            wm = state.getCurrentWatermarkMs()
            batch, held_frame, late = _reorder_release(
                held_frame, new, reorder_wm_col, wm
            )
            if late and late_acc is not None:
                late_acc.add(late)
            if batch is not None:
                batch = batch.sort_values(sort_cols, kind="mergesort")
            parts = ([buf] if n_buf else []) + ([batch] if batch is not None else [])
        elif not new:
            parts = [buf] if n_buf else []
        else:
            batch = pd.concat(new, ignore_index=True) if len(new) > 1 else new[0]
            batch = batch.sort_values(sort_cols, kind="mergesort")
            parts = ([buf] if n_buf else []) + [batch]
        if not parts:
            if reorder:
                state.update(
                    (bytearray(pickle.dumps((pd.DataFrame(), ctx, held_frame))), match_no)
                )
                arm = _held_ts_ms(held_frame, reorder_wm_col)
                if arm is not None:
                    state.setTimeoutTimestamp(max(arm, wm + 1))
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        pdf = pdf.reset_index(drop=True)
        for lag_name, col in lags.items():
            shifted = pdf[col].shift(1)
            if n_buf == 0 and col in ctx:
                # seed PREV of the first buffered row from the last row
                # decided in an earlier batch
                shifted.iloc[0] = ctx[col]
            if n_buf:
                # buffered rows carry their stored (correct) lag values
                shifted.iloc[:n_buf] = buf[lag_name].to_numpy()
            pdf[lag_name] = shifted
        if lags:
            ctx = {col: pdf[col].iloc[-1] for col in set(lags.values())}
        out, keep_from, match_no = run_nfa(
            pdf, streaming=True, match_no_base=match_no
        )
        keep = pdf.iloc[keep_from:]
        if len(keep) > max_buffer_rows:
            # pressure valve engaged — batch parity is no longer
            # guaranteed for this key; surface it instead of trimming
            # silently (ADVICE r5): executor-log warning always, plus
            # a caller-visible Spark accumulator when provided
            dropped = len(keep) - max_buffer_rows
            import logging  # noqa: PLC0415

            logging.getLogger(__name__).warning(
                "streaming MATCH_RECOGNIZE buffer cap hit for key %r: "
                "dropped %d oldest undecided rows (max_buffer_rows=%d); "
                "emitted matches may diverge from batch semantics",
                key,
                dropped,
                max_buffer_rows,
            )
            if truncation_acc is not None:
                truncation_acc.add(dropped)
            keep = keep.iloc[-max_buffer_rows:]
        stored_out = (keep, ctx, held_frame) if reorder else (keep, ctx)
        state.update((bytearray(pickle.dumps(stored_out)), match_no))
        if reorder:
            arm = _held_ts_ms(held_frame, reorder_wm_col)
            if arm is not None:
                state.setTimeoutTimestamp(max(arm, wm + 1))
        elif ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if len(out):
            yield out

    return _apply_with_state(
        work.groupBy(*partition_by), fn, out_schema, state_schema, "append", timeout
    )


# value types accepted by the streaming OVER operators; anything else
# (DECIMAL, STRING, …) is a typed rejection — DECIMAL has no exact
# frame-state representation here (ADVICE r5). Integral values keep
# an exact array<bigint> frame (a float frame would silently round
# BIGINTs past 2^53); floats use array<double> with NaN null slots.
_OVER_INT_TYPES = ("tinyint", "smallint", "int", "bigint")
_OVER_FLOAT_TYPES = ("float", "double")


def _is_missing(x) -> bool:
    return x is None or (isinstance(x, float) and math.isnan(x))


def _spec_names(
    triples: list[tuple[str, str | None, object]],
) -> list[str]:
    """Output column names for resolved ``(agg, col, width)`` triples:
    the plain ``{col}_{agg}`` / ``star_cnt`` when an (agg, col) pair
    occurs with a single frame width (back-compat with the shared-spec
    surface), width-qualified ``{col}_{agg}_{w}p`` when the same pair
    occurs with several widths (per-spec ROWS frames, r7)."""
    widths: dict[tuple[str, str | None], set] = {}
    for a, c, w in triples:
        widths.setdefault((a, c), set()).add(w)

    def qual(w) -> str:
        return f"_{w}p" if isinstance(w, int) else "_unb"

    return [
        spec_out_name(a, c)
        if len(widths[(a, c)]) == 1
        else f"{spec_out_name(a, c)}{qual(w)}"
        for a, c, w in triples
    ]


def resolve_spec_names(
    agg_specs: list[tuple], default_width: object = None
) -> list[str]:
    """Public naming contract for the SQL router: the output column
    each ``(agg, col[, n_preceding])`` spec maps to, before dedup —
    a duplicated spec maps to the same column. Must mirror
    ``_norm_specs`` exactly (the router splices these names into the
    rewritten statement)."""
    triples = [
        (s[0], s[1], s[2] if len(s) > 2 and s[2] is not None else default_width)
        for s in agg_specs
    ]
    deduped: list[tuple[str, str | None, object]] = []
    for t in triples:
        if t not in deduped:
            deduped.append(t)
    names = _spec_names(deduped)
    by_triple = dict(zip(deduped, names))
    return [by_triple[t] for t in triples]


def _norm_specs(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str | None,
    aggs: tuple[str, ...],
    agg_specs: list[tuple] | None,
    default_width: object = None,
) -> tuple[
    list[tuple[str, str | None, object]], list[str], list[str], str,
    list[str], dict[str, bool],
]:
    """Shared prep for the streaming OVER operators, generalized to
    (agg, col) pairs (VERDICT r6 ask #5: the SQL surface allows
    ``SUM(a) …, COUNT(*) …, MAX(b) …`` over one window spec) and to
    per-spec ROWS frame widths (r7: ``SUM(v) … ROWS 2 PRECEDING,
    AVG(v) … ROWS 5 PRECEDING`` in one statement — one operator pass,
    state sized to the max frame).

    ``agg_specs`` entries are ``(agg, col)`` or ``(agg, col,
    n_preceding)`` with ``col=None`` meaning ``COUNT(*)`` and a
    missing/None width meaning ``default_width`` (the operator-level
    frame); when omitted it is derived from the legacy ``(value_col,
    aggs)`` pair. Returns ``(specs, names, vcols, out_schema,
    emit_cols, is_int)`` — specs deduped in order as resolved
    ``(agg, col, width)`` triples, ``names`` the parallel output
    column names (see ``_spec_names``), ``vcols`` the distinct value
    columns, ``is_int[col]`` the exact-bigint flag per column."""
    if agg_specs is None:
        if value_col is None:
            raise ValueError("either value_col or agg_specs is required")
        agg_specs = [(a, value_col) for a in aggs]
    specs: list[tuple[str, str | None, object]] = []
    for item in agg_specs:
        a, c = item[0], item[1]
        w = item[2] if len(item) > 2 and item[2] is not None else default_width
        if a not in ("sum", "cnt", "avg", "min", "max", "first", "last"):
            raise ValueError(f"unsupported OVER aggregate '{a}'")
        if c is None and a != "cnt":
            raise ValueError(f"'{a}(*)' is not a valid aggregate")
        if (a, c, w) not in specs:
            specs.append((a, c, w))
    names = _spec_names(specs)
    if len(set(names)) != len(names):
        # distinct specs mapping to one output column — e.g. COUNT(*)
        # ('star_cnt') vs COUNT(col) on a column literally named
        # 'star' — would silently shadow each other in the vectorized
        # named-column assignment (ADVICE r7)
        dup = next(n for n in names if names.count(n) > 1)
        raise ValueError(
            f"two OVER aggregates map to the same output column "
            f"'{dup}' — rename the value column"
        )
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    vcols: list[str] = []
    for _a, c, _w in specs:
        if c is not None and c not in vcols:
            vcols.append(c)
    for c in partition_by + order_by + vcols:
        if c not in in_schema:
            raise ValueError(f"column '{c}' not in input")
    is_int: dict[str, bool] = {}
    for c in vcols:
        vt = in_schema[c]
        if vt in _OVER_FLOAT_TYPES:
            is_int[c] = False
        elif vt in _OVER_INT_TYPES:
            is_int[c] = True
        else:
            raise NotImplementedError(
                f"streaming OVER aggregation supports integral and "
                f"floating-point value columns; '{c}' is {vt} — "
                "CAST it to BIGINT or DOUBLE first (DECIMAL has no exact "
                "frame-state representation here)"
            )
    emit_cols = list(df.columns)
    out_fields = [f"{c} {in_schema[c]}" for c in emit_cols]
    for (a, c, _w), name in zip(specs, names):
        if name in in_schema:
            # a passthrough input column with the same name would be
            # silently overwritten by the aggregate (review r7)
            raise ValueError(
                f"input column '{name}' collides with the operator's "
                f"output column for {a.upper()}({c or '*'}) — rename it"
            )
        if c is None:
            out_fields.append(f"{name} bigint")
        else:
            num_t = "bigint" if is_int[c] else "double"
            typed = {"sum": num_t, "cnt": "bigint", "avg": "double",
                     "min": in_schema[c], "max": in_schema[c],
                     "first": in_schema[c], "last": in_schema[c]}
            out_fields.append(f"{name} {typed[a]}")
    return specs, names, vcols, ", ".join(out_fields), emit_cols, is_int


def spec_out_name(agg: str, col: str | None) -> str:
    """Output column name for an (agg, col) spec — the contract the
    SQL router splices into the outer statement."""
    return "star_cnt" if col is None else f"{col}_{agg}"


def _is_null(v) -> bool:
    try:
        return v is None or pd.isna(v)
    except (TypeError, ValueError):
        return False


def _sliding_extreme(vals: list, mask, lo, hi, is_min: bool) -> list:
    """MIN/MAX over trailing windows ``[lo_i, hi_i)`` of a value
    sequence — monotonic-deque sweep, O(n) amortized for the whole
    batch instead of O(window) per row (VERDICT r6 ask #6). Requires
    ``lo`` and ``hi`` non-decreasing (always true for trailing ROWS /
    RANGE frames). ``vals`` holds exact Python values (ints stay
    arbitrary-precision — no float64 round-through); masked-out slots
    are NULLs skipped by the aggregate."""
    from collections import deque  # noqa: PLC0415

    dq: deque[int] = deque()
    res: list = []
    j = 0
    for left, right in zip(lo, hi):
        while j < right:
            if mask[j]:
                v = vals[j]
                while dq and (vals[dq[-1]] >= v if is_min else vals[dq[-1]] <= v):
                    dq.pop()
                dq.append(j)
            j += 1
        while dq and dq[0] < left:
            dq.popleft()
        res.append(vals[dq[0]] if dq else None)
    return res


def _window_col_aggs(
    full: list, lo, hi, int_col: bool, need: set[str]
) -> dict[str, list]:
    """Per-window aggregates for one value column over trailing
    windows ``[lo_i, hi_i)`` of the (state-seeded) value sequence.

    SQL semantics: SUM/AVG/MIN/MAX skip NULL slots and are NULL over
    an all-null window; ``cnt`` counts non-null values (COUNT(col)).
    Vectorized (numpy prefix sums + one deque sweep per extreme)
    instead of the previous per-row ``itertuples`` rebuild; integral
    columns keep exact arithmetic — prefix sums run in int64 when the
    magnitude bound proves no overflow, else arbitrary-precision
    Python ints (never float64, review r6's bigint-exactness
    contract)."""
    import numpy as np  # noqa: PLC0415

    n = len(full)
    mask = np.fromiter(
        (not _is_missing(x) for x in full), dtype=bool, count=n
    )
    ccnt = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(mask, out=ccnt[1:])
    cnt = (ccnt[hi] - ccnt[lo]).tolist()
    out: dict[str, list] = {}
    if "cnt" in need:
        out["cnt"] = cnt
    if need & {"sum", "avg"}:
        if int_col:
            vals = [int(x) if m else 0 for x, m in zip(full, mask)]
            amax = max((abs(v) for v in vals), default=0)
            if amax and amax >= (2**62) // (n + 1):
                # int64 prefix sums could overflow: exact Python ints
                pref = [0] * (n + 1)
                acc = 0
                for i, v in enumerate(vals):
                    acc += v
                    pref[i + 1] = acc
                sums = [pref[h] - pref[l] for l, h in zip(lo, hi)]
            else:
                csum = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(np.asarray(vals, dtype=np.int64), out=csum[1:])
                sums = (csum[hi] - csum[lo]).tolist()
        else:
            arr = np.fromiter(
                (float(x) if m else 0.0 for x, m in zip(full, mask)),
                dtype=np.float64, count=n,
            )
            csum = np.zeros(n + 1, dtype=np.float64)
            np.cumsum(arr, out=csum[1:])
            sums = (csum[hi] - csum[lo]).tolist()
        if "sum" in need:
            out["sum"] = [s if c else None for s, c in zip(sums, cnt)]
        if "avg" in need:
            out["avg"] = [s / c if c else None for s, c in zip(sums, cnt)]
    if need & {"min", "max", "first", "last"}:
        vlist = [
            (int(x) if int_col else float(x)) if m else None
            for x, m in zip(full, mask)
        ]
        if "min" in need:
            out["min"] = _sliding_extreme(vlist, mask, lo, hi, is_min=True)
        if "max" in need:
            out["max"] = _sliding_extreme(vlist, mask, lo, hi, is_min=False)
        if need & {"first", "last"}:
            # FIRST_VALUE/LAST_VALUE with Flink's NULL-skipping
            # aggregate semantics: the first/last NON-NULL value in
            # the frame (Spark's respect-nulls variant differs —
            # documented divergence, the dialect targets Flink).
            # Vectorized: searchsorted over the non-null positions.
            nn = np.flatnonzero(mask)
            if "first" in need:
                fi = np.searchsorted(nn, lo, side="left")
                out["first"] = [
                    vlist[nn[i]] if i < len(nn) and nn[i] < h else None
                    for i, h in zip(fi, hi)
                ]
            if "last" in need:
                li = np.searchsorted(nn, hi, side="left") - 1
                out["last"] = [
                    vlist[nn[i]] if i >= 0 and nn[i] >= l else None
                    for i, l in zip(li, lo)
                ]
    return out


# per-spec ROWS width sentinel for `ROWS BETWEEN UNBOUNDED PRECEDING
# AND CURRENT ROW` (running aggregates, O(1) state per key)
UNBOUNDED = "unbounded"


def _running_col_aggs(vals: list, run: list, int_col: bool) -> dict:
    """Running (cumulative) aggregates for one value column under an
    UNBOUNDED PRECEDING frame, seeded from the per-key state
    ``[cnt, sum, min, max, first, last]`` (all but cnt/sum meaningful
    only when cnt > 0 — 0 is the empty-state placeholder, never
    read). Returns per-row lists for sum/cnt/avg/min/max/first/last
    plus ``next_state``. first/last use Flink's NULL-skipping
    FIRST_VALUE/LAST_VALUE aggregate semantics.

    Same exactness contract as ``_window_col_aggs``: integral sums
    run in int64 when the magnitude bound proves no overflow, else
    arbitrary-precision Python ints; extremes never round through
    float64. SQL semantics: NULLs are skipped, aggregates are NULL
    until the first non-null value."""
    import numpy as np  # noqa: PLC0415

    n = len(vals)
    mask = np.fromiter((not _is_missing(x) for x in vals), dtype=bool, count=n)
    cnt0 = int(run[0])
    cnt = (cnt0 + np.cumsum(mask.astype(np.int64))).tolist()
    if int_col:
        ivals = [int(x) if m else 0 for x, m in zip(vals, mask)]
        base = int(run[1])
        amax = max((abs(v) for v in ivals), default=0)
        if (abs(base) + amax * (n + 1)) >= 2**62:
            sums, acc = [], base
            for v in ivals:
                acc += v
                sums.append(acc)
            if any(abs(s) > 2**63 - 1 for s in sums):
                # the emitted column and the accumulator state are
                # both BIGINT — surface a typed error instead of an
                # opaque Arrow conversion crash (review r7); CAST the
                # value column to DOUBLE to keep going
                raise ValueError(
                    "running SUM under UNBOUNDED PRECEDING exceeded "
                    "BIGINT range — CAST the value column to DOUBLE"
                )
        else:
            sums = (base + np.cumsum(np.asarray(ivals, dtype=np.int64))).tolist()
            sums = [int(s) for s in sums]
        lo_id, hi_id = np.iinfo(np.int64).max, np.iinfo(np.int64).min
        arr = np.asarray(ivals, dtype=np.int64)
        seed_mn = int(run[2]) if cnt0 else lo_id
        seed_mx = int(run[3]) if cnt0 else hi_id
        mns = np.minimum.accumulate(
            np.concatenate(([seed_mn], np.where(mask, arr, lo_id)))
        )[1:]
        mxs = np.maximum.accumulate(
            np.concatenate(([seed_mx], np.where(mask, arr, hi_id)))
        )[1:]
        mns, mxs = [int(x) for x in mns], [int(x) for x in mxs]
    else:
        fvals = np.fromiter(
            (float(x) if m else 0.0 for x, m in zip(vals, mask)),
            dtype=np.float64, count=n,
        )
        sums = [float(s) for s in (float(run[1]) + np.cumsum(fvals))]
        seed_mn = float(run[2]) if cnt0 else math.inf
        seed_mx = float(run[3]) if cnt0 else -math.inf
        mns = [
            float(x) for x in np.minimum.accumulate(
                np.concatenate(([seed_mn], np.where(mask, fvals, math.inf)))
            )[1:]
        ]
        mxs = [
            float(x) for x in np.maximum.accumulate(
                np.concatenate(([seed_mx], np.where(mask, fvals, -math.inf)))
            )[1:]
        ]
    conv = (lambda x: int(x)) if int_col else (lambda x: float(x))
    cvals = [conv(x) if m else None for x, m in zip(vals, mask)]
    seed_first = conv(run[4]) if cnt0 else None
    seed_last = conv(run[5]) if cnt0 else None
    firsts, lasts = [], []
    cur_first, cur_last = seed_first, seed_last
    for v, m in zip(cvals, mask):
        if m:
            if cur_first is None:
                cur_first = v
            cur_last = v
        firsts.append(cur_first)
        lasts.append(cur_last)
    out = {
        "cnt": cnt,
        "sum": [s if c else None for s, c in zip(sums, cnt)],
        "avg": [s / c if c else None for s, c in zip(sums, cnt)],
        "min": [m if c else None for m, c in zip(mns, cnt)],
        "max": [m if c else None for m, c in zip(mxs, cnt)],
        "first": firsts,
        "last": lasts,
    }
    last_c = cnt[-1] if n else cnt0
    out["next_state"] = [
        last_c,
        sums[-1] if n else run[1],
        (mns[-1] if n else run[2]) if last_c else 0,
        (mxs[-1] if n else run[3]) if last_c else 0,
        (firsts[-1] if n and firsts[-1] is not None else run[4]) if last_c else 0,
        (lasts[-1] if n and lasts[-1] is not None else run[5]) if last_c else 0,
    ]
    if not int_col:
        out["next_state"] = [float(x) for x in out["next_state"]]
    return out


def _encode_slots(full: list, int_col: bool) -> list:
    """State encoding of a value sequence: exact ints with ``None``
    NULL slots for integral columns (array<bigint>), float64 with NaN
    slots for floating-point ones (array<double>)."""
    if int_col:
        return [None if _is_missing(x) else int(x) for x in full]
    return [float("nan") if _is_missing(x) else float(x) for x in full]


def streaming_over_rows(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str | None,
    n_preceding: int,
    aggs: tuple[str, ...] = ("sum", "cnt", "avg", "min", "max"),
    ttl_ms: int | None = None,
    agg_specs: list[tuple[str, str | None]] | None = None,
    reorder_wm_col: str | None = None,
    late_acc=None,
) -> DataFrame:
    """Streaming OVER aggregation with a ROWS frame — Spark Structured
    Streaming rejects window functions outright ("non-time-based
    windows"), but Flink supports `SUM(x) OVER (PARTITION BY k ORDER
    BY ts ROWS BETWEEN n PRECEDING AND CURRENT ROW)` on streams
    (SURVEY §2.6 / "what's hard"). Implemented the way Flink's
    OverAggregate operator does: per-key state is the last
    ``n_preceding`` values per value column plus a row counter
    (bounded, O(frame) not O(stream)), one output row per input row
    carrying the frame aggregates.

    ``agg_specs`` generalizes to (agg, col) pairs over multiple value
    columns, with ``("cnt", None)`` = COUNT(*) (VERDICT r6 ask #5),
    and since r7 to ``(agg, col, n_preceding)`` triples carrying a
    per-spec frame width (``SUM(v) … ROWS 2 PRECEDING, AVG(v) … ROWS
    5 PRECEDING`` in one statement): one operator pass, per-key state
    sized to the **max** bounded width, each spec computed over its
    own window bounds. A width of ``UNBOUNDED`` (the module constant)
    is ``ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`` — the
    canonical Flink running aggregate — holding **no value history**,
    just four running accumulators per column (O(1) state; see
    ``_running_col_aggs``); it mixes freely with bounded widths.
    Output columns follow ``resolve_spec_names`` — width-qualified
    only when the same (agg, col) appears with several widths. The per-row Python loop is replaced by vectorized
    prefix sums + a monotonic-deque sweep per extreme (ask #6) —
    integral columns stay exact (int64 or arbitrary-precision prefix
    sums, extremes never round through float64).

    NULL values occupy a frame slot (ROWS frames count rows) but are
    skipped by the aggregates, which stay NULL over an all-null frame
    — the row itself is still emitted (Flink OverAggregate behavior).
    Rows are processed in arrival order, sorted by ``order_by`` within
    each micro-batch (the module-level semantic note applies) — unless
    ``reorder_wm_col`` re-buffers them to event-time order up to the
    query watermark (VERDICT r6 ask #3; see ``_reorder_release`` —
    replaces the ProcessingTimeTimeout TTL).
    """
    import numpy as np  # noqa: PLC0415
    import pickle  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if n_preceding < 0:
        raise ValueError(f"n_preceding must be >= 0, got {n_preceding}")
    specs, names, vcols, out_schema, emit_cols, is_int = _norm_specs(
        df, partition_by, order_by, value_col, aggs, agg_specs,
        default_width=n_preceding,
    )
    for _a, _c, sw in specs:
        if sw != UNBOUNDED and (not isinstance(sw, int) or sw < 0):
            raise ValueError(
                f"per-spec ROWS width must be an int >= 0 or "
                f"'unbounded', got {sw!r}"
            )
    reorder = reorder_wm_col is not None
    if reorder and reorder_wm_col not in df.columns:
        raise ValueError(f"column '{reorder_wm_col}' not in input")
    if reorder:
        _warn_ttl_with_reorder(ttl_ms, "streaming_over_rows")
    # state retains max(bounded width) values per column; narrower
    # specs read a shorter suffix of the shared seed. UNBOUNDED specs
    # keep no value history at all — just 4 running accumulators per
    # column (cnt, sum, min, max), the Flink OverAggregate shape for
    # ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    bounded_ws = [sw for _a, _c, sw in specs if sw != UNBOUNDED]
    w = (max(bounded_ws) + 1) if bounded_ws else 1
    # vcols that need running accumulators (any UNBOUNDED spec on them)
    ucols = [
        c for c in vcols
        if any(cc == c and ww == UNBOUNDED for _a, cc, ww in specs)
    ]
    state_schema = ", ".join(
        (["held binary"] if reorder else [])
        + ["seen bigint"]
        + [
            f"f{i} array<{'bigint' if is_int[c] else 'double'}>"
            for i, c in enumerate(vcols)
        ]
        # running accumulators [cnt, sum, min, max] per UNBOUNDED col
        # (cnt/sum as the col's numeric type: double cnt is exact to
        # 2^53; int64 sums match Flink's long accumulator)
        + [
            f"u{i} array<{'bigint' if is_int[c] else 'double'}>"
            for i, c in enumerate(ucols)
        ]
    )
    timeout = (
        GroupStateTimeout.EventTimeTimeout if reorder
        else GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut and not reorder:
            # idle key past table.exec.state.ttl: evict its frames
            state.remove()
            return
        held_blob = None
        if state.exists:
            st = state.get
            base = st[1:] if reorder else st
            held_blob = st[0] if reorder else None
            seen = base[0]
            seeds = [list(base[i + 1]) for i in range(len(vcols))]
            runs = {
                c: list(base[1 + len(vcols) + i])
                for i, c in enumerate(ucols)
            }
        else:
            seen, seeds = 0, [[] for _ in vcols]
            runs = {c: [0, 0, 0, 0, 0, 0] for c in ucols}
        chunks = [p for p in pdfs if len(p)] if not state.hasTimedOut else []
        held, wm = None, 0
        if reorder:
            wm = state.getCurrentWatermarkMs()
            batch, held, late = _reorder_release(
                held_blob, chunks, reorder_wm_col, wm
            )
            if late and late_acc is not None:
                late_acc.add(late)
        else:
            batch = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1 else chunks[0] if chunks else None
            )
        if batch is None or not len(batch):
            prefix = (bytearray(pickle.dumps(held)),) if reorder else ()
            state.update((*prefix, seen, *seeds,
                          *[runs[c] for c in ucols]))
            if reorder:
                arm = _held_ts_ms(held, reorder_wm_col)
                if arm is not None:
                    state.setTimeoutTimestamp(max(arm, wm + 1))
            elif ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        batch = batch.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        L = len(batch)
        # seeds all have length min(seen, w-1): one shared window set
        S = len(seeds[0]) if seeds else min(seen, w - 1)
        idx = np.arange(S, S + L)
        hi = idx + 1
        # one lo array per distinct bounded width; per-spec frames
        # share the seeded value sequence (r7)
        lo_by_w = {
            sw: np.maximum(0, idx - sw)
            for sw in {s[2] for s in specs if s[2] != UNBOUNDED}
        }
        fulls: dict[str, list] = {}
        per_cw: dict[tuple[str, int], dict[str, list]] = {}
        for ci, c in enumerate(vcols):
            full = seeds[ci] + batch[c].tolist()
            fulls[c] = full
            seeds[ci] = _encode_slots(full[max(0, len(full) - (w - 1)):], is_int[c])
        for cw in {
            (c, sw) for _a, c, sw in specs
            if c is not None and sw != UNBOUNDED
        }:
            c, sw = cw
            need = {a for a, cc, ww in specs if cc == c and ww == sw}
            per_cw[cw] = _window_col_aggs(
                fulls[c], lo_by_w[sw], hi, is_int[c], need
            )
        # UNBOUNDED PRECEDING: running accumulators, no value history
        # (Flink's unbounded OverAggregate keeps exactly this state)
        uruns: dict[str, dict[str, object]] = {}
        for c in ucols:  # ucols = exactly the UNBOUNDED-spec columns
            uruns[c] = _running_col_aggs(
                batch[c].tolist(), runs[c], is_int[c]
            )
            runs[c] = uruns[c]["next_state"]
        out = batch[emit_cols].copy()
        for (a, c, sw), name in zip(specs, names):
            if c is None:
                # COUNT(*): all rows in the frame, NULL slots included
                if sw == UNBOUNDED:
                    out[name] = seen + np.arange(1, L + 1)
                else:
                    out[name] = np.minimum(seen + np.arange(1, L + 1), sw + 1)
            elif sw == UNBOUNDED:
                out[name] = pd.Series(uruns[c][a], dtype="object")
            else:
                out[name] = pd.Series(per_cw[(c, sw)][a], dtype="object")
        prefix = (bytearray(pickle.dumps(held)),) if reorder else ()
        state.update((*prefix, seen + L, *seeds, *[runs[c] for c in ucols]))
        if reorder:
            arm = _held_ts_ms(held, reorder_wm_col)
            if arm is not None:
                state.setTimeoutTimestamp(max(arm, wm + 1))
        elif ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield out

    return _apply_with_state(
        df.groupBy(*partition_by), fn, out_schema, state_schema, "append", timeout
    )


def _interval_us(spec: str | int | float) -> int:
    """Parse a frame-bound interval to microseconds. Accepts Flink SQL
    ``INTERVAL '10' MINUTE`` / ``INTERVAL '10' SECOND`` shapes and
    plain ``"10 minutes"`` / ``"500 ms"`` strings; bare numbers are
    seconds."""
    if isinstance(spec, (int, float)):
        return int(spec * 1_000_000)
    m = re.match(
        r"(?is)^\s*(?:INTERVAL\s+)?'?(\d+(?:\.\d+)?)'?\s*"
        r"(millisecond|milli|ms|second|sec|s|minute|min|hour|h|day|d)s?\s*$",
        spec,
    )
    if not m:
        raise ValueError(f"cannot parse interval '{spec}'")
    n = float(m.group(1))
    unit = m.group(2).lower()
    us = {
        "millisecond": 1_000, "milli": 1_000, "ms": 1_000,
        "second": 1_000_000, "sec": 1_000_000, "s": 1_000_000,
        "minute": 60_000_000, "min": 60_000_000,
        "hour": 3_600_000_000, "h": 3_600_000_000,
        "day": 86_400_000_000, "d": 86_400_000_000,
    }[unit]
    return int(n * us)


_CALENDAR_INTERVAL = re.compile(
    r"(?is)^\s*(?:INTERVAL\s+)?'?(\d+)'?\s*(month|year)s?\s*$"
)


def _parse_preceding(spec: str | int | float):
    """RANGE frame horizon: ``(fixed_us, None)`` for fixed durations,
    ``(worst_case_us, (n, unit))`` for calendar units (MONTH/YEAR,
    VERDICT r6 ask #7) — variable-length but computable from each
    row's own timestamp; the worst-case bound (31-day months /
    366-day years) drives retention and lateness admission, the exact
    per-row bound drives the frame."""
    try:
        return _interval_us(spec), None
    except ValueError:
        if not isinstance(spec, str):
            raise
        m = _CALENDAR_INTERVAL.match(spec)
        if not m:
            raise
        n, unit = int(m.group(1)), m.group(2).lower()
        worst_days = 31 * n if unit == "month" else 366 * n
        return worst_days * 86_400_000_000, (n, unit)


def streaming_over_range(
    df: DataFrame,
    partition_by: list[str],
    order_by: str | list[str],
    value_col: str | None,
    preceding: str | int | float,
    aggs: tuple[str, ...] = ("sum", "cnt", "avg", "min", "max"),
    ttl_ms: int | None = None,
    agg_specs: list[tuple[str, str | None]] | None = None,
) -> DataFrame:
    """Streaming OVER aggregation with an event-time RANGE frame —
    Flink's other OverAggregate shape: ``SUM(x) OVER (PARTITION BY k
    ORDER BY ts RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND
    CURRENT ROW)`` (reference grammar
    syntaxes/flink.tmLanguage.json:399, corpus
    test/syntax-test.fsql:252).

    ``order_by`` is the single event-time timestamp column;
    ``preceding`` the frame horizon (``INTERVAL '10' MINUTE``,
    ``"10 minutes"``, or seconds as a number). Per-key state is the
    recent (ts, value) list kept sorted by ts and evicted past
    ``max_seen_ts - 2*horizon`` — O(horizon), not O(stream). Each
    input row emits one output row whose aggregates cover state
    entries with ``row_ts - horizon <= ts <= row_ts`` (inclusive
    bounds, matching batch ``rangeBetween(-h, 0)``). Event-time
    semantics for out-of-order rows, with the newest event per key
    standing in for the watermark: a row within ``horizon`` of it is
    computed with its exact batch frame (the 2× retention guarantees
    every entry that frame can reach is still in state); an older row
    is dropped like beyond-watermark late data (Flink's OverAggregate
    does the same). NULL values are skipped by the aggregates; rows
    with a NULL order timestamp are dropped (no event time → no
    frame). Already-emitted peer rows are not retracted when a late
    peer arrives (append mode; module-level semantic note).

    ``agg_specs`` generalizes to (agg, col) pairs with
    ``("cnt", None)`` = COUNT(*) (VERDICT r6 ask #5); output columns
    follow ``spec_out_name``. The per-row insertion loop is replaced
    by one stable merge of the state and batch rows, prefix sums over
    searchsorted window bounds, and a deque sweep per extreme
    (ask #6), with integral columns kept exact. The stable merge
    places state entries before equal-ts batch rows and batch rows in
    ascending order, so each row's frame includes earlier-arriving
    peers and excludes later ones — the same semantics as the per-row
    ``bisect_right`` insertion this replaces.

    Calendar-unit horizons (``INTERVAL '1' MONTH`` / ``YEAR``,
    VERDICT r6 ask #7) are variable-length but computable from each
    row's own timestamp: the frame lower bound is the row's timestamp
    minus the calendar offset (month-end clamped, e.g. Mar 31 − 1
    month = Feb 28, matching SQL timestamp − INTERVAL arithmetic),
    while retention and lateness admission use the worst-case fixed
    bound (31-day months / 366-day years) so every reachable entry
    stays in state.
    """
    import numpy as np  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if isinstance(order_by, str):
        order_by = [order_by]
    if len(order_by) != 1:
        raise ValueError("RANGE frame requires exactly one ORDER BY timestamp column")
    ts_col = order_by[0]
    ts_type = dict(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    ).get(ts_col)
    if ts_type not in ("timestamp", "timestamp_ntz"):
        raise NotImplementedError(
            f"RANGE frame ORDER BY column '{ts_col}' must be a "
            f"timestamp (got {ts_type}) — event-time frames need a "
            "rowtime attribute"
        )
    horizon_us, calendar = _parse_preceding(preceding)
    specs, names, vcols, out_schema, emit_cols, is_int = _norm_specs(
        df, partition_by, order_by, value_col, aggs, agg_specs
    )
    name_of = dict(zip(specs, names))
    state_schema = ", ".join(
        ["ts array<bigint>"]
        + [
            f"f{i} array<{'bigint' if is_int[c] else 'double'}>"
            for i, c in enumerate(vcols)
        ]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            st = state.get
            ts_state = list(st[0])
            seeds = [list(st[i + 1]) for i in range(len(vcols))]
        else:
            ts_state, seeds = [], [[] for _ in vcols]
        chunks = [p for p in pdfs if len(p)]
        batch = None
        if chunks:
            batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            # no rowtime → dropped, like Flink
            batch = batch[batch[ts_col].notna()]
            batch = batch.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            t_us = (
                batch[ts_col].to_numpy("datetime64[ns]").astype(np.int64) // 1000
            )
            if ts_state and len(batch):
                # beyond-watermark late rows → dropped (the newest
                # event per key stands in for the watermark; the batch
                # is ascending, so only the prior state max can make a
                # row late)
                keep = t_us >= ts_state[-1] - horizon_us
                if not keep.all():
                    batch = batch[keep].reset_index(drop=True)
                    t_us = t_us[keep]
        if batch is None or not len(batch):
            state.update((ts_state, *seeds))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        L, S = len(batch), len(ts_state)
        merged_ts = np.concatenate(
            [np.asarray(ts_state, dtype=np.int64), t_us]
        )
        order = np.argsort(merged_ts, kind="stable")
        merged_ts = merged_ts[order]
        inv = np.empty(S + L, dtype=np.int64)
        inv[order] = np.arange(S + L)
        hi = inv[S:] + 1
        if calendar is None:
            lower = t_us - horizon_us
        else:
            n_units, unit = calendar
            off = (
                pd.DateOffset(months=n_units)
                if unit == "month"
                else pd.DateOffset(years=n_units)
            )
            lower = (
                (batch[ts_col] - off)
                .to_numpy("datetime64[ns]")
                .astype(np.int64)
                // 1000
            )
        lo = np.searchsorted(merged_ts, lower, side="left")
        order_list = order.tolist()
        out = batch[emit_cols].copy()
        # 2× retention: an admitted late row (≥ max - h) frames back
        # to max - 2h at most — keep exactly that
        cut = int(
            np.searchsorted(merged_ts, merged_ts[-1] - 2 * horizon_us, "left")
        )
        new_seeds = []
        for ci, c in enumerate(vcols):
            seq = seeds[ci] + batch[c].tolist()
            full = [seq[i] for i in order_list]
            need = {a for a, cc, _w in specs if cc == c}
            per = _window_col_aggs(full, lo, hi, is_int[c], need)
            for a in need:
                out[name_of[(a, c, None)]] = pd.Series(per[a], dtype="object")
            new_seeds.append(_encode_slots(full[cut:], is_int[c]))
        for a, c, _w in specs:
            if c is None:
                # COUNT(*): every row in the frame, NULL values too
                out[name_of[(a, c, _w)]] = hi - lo
        out = out[emit_cols + names]
        state.update((merged_ts[cut:].tolist(), *new_seeds))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield out

    return _apply_with_state(
        df.groupBy(*partition_by), fn, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout,
    )

