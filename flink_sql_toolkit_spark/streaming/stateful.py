"""Custom stateful streaming operators (SURVEY.md §2.11, §7 phase 5).

The streaming counterpart of the batch CEP operator: per-key state
carried across micro-batches with ``applyInPandasWithState``. State
is a bounded tuple (no row buffering beyond the open partial match),
with a processing-time TTL honoring Flink's ``table.exec.state.ttl``.

Also maps Flink's streaming dedup idiom to
``dropDuplicatesWithinWatermark`` (keep-first per key inside the
watermark horizon).

Semantic note (documented gap, mirrors SURVEY §7): rows are processed
in arrival order within each micro-batch (sorted by event time
inside the batch); cross-batch out-of-order rows are not re-buffered
— Flink's CEP event-time buffer would reorder them up to the
watermark.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(df: DataFrame, keys: list[str], watermark_col: str, delay: str) -> DataFrame:
    """Keep-first-per-key within the watermark horizon — the Flink
    ``ROW_NUMBER() = 1`` streaming dedup pattern."""
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)


def streaming_lag(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str,
    offset: int = 1,
    ttl_ms: int | None = None,
) -> DataFrame:
    """``LAG(value) OVER (PARTITION BY k ORDER BY ts)`` on a stream —
    the offset-function member of the streaming OVER family. State per
    key is the last ``offset`` values (a bounded ring, exactly like
    the ROWS frame but emitting the displaced value instead of an
    aggregate): rows before the offset fills emit NULL, matching the
    batch window function. Output: every input column plus
    ``{value}_lag``."""
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
        # deliberately NOT _encode_val: a lagged NULL must re-emit as
        # NULL (None), never the frame-slot NaN marker — batch LAG of
        # a NULL value yields NULL, and NaN is a distinct double
        if _is_null(v):
            return None
        if is_int:
            return int(v)
        return float(v) if state_t == "double" else str(v)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ring: list = list(state.get[0]) if state.exists else []
        out_rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            vals = pdf[value_col].tolist()
            for row, v in zip(pdf[cols].itertuples(index=False), vals):
                lag_v = ring[0] if len(ring) >= offset else None
                out_rows.append([*row, lag_v])
                ring.append(enc(v))
                if len(ring) > offset:
                    ring.pop(0)
        state.update((ring,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[*cols, f"{value_col}_lag"])

    return df.groupBy(*partition_by).applyInPandasWithState(
        fn,
        out_schema,
        f"ring array<{state_t}>",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout,
    )


def streaming_first_n(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    n: int,
    ttl_ms: int | None = None,
) -> DataFrame:
    """First-N-per-key over a stream — the append-expressible half of
    Flink's Top-N recipe (``ROW_NUMBER() <= N``): emit a row while its
    key has emitted fewer than ``n`` rows, then drop. Once emitted a
    row never retracts, so this is exact for arrival-order ranking
    (Flink's proctime Top-N); event-time ORDER BY is approximated by
    within-micro-batch sorting (module-level semantic note). State is
    ONE counter per key (bigint), TTL-evictable — minimal possible
    footprint."""
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    cols = list(df.columns)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if not len(pdf) or count >= n:
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            take = min(n - count, len(pdf))
            count += take
            yield pdf[cols].iloc[:take]
        state.update((count,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)

    return df.groupBy(*keys).applyInPandasWithState(
        fn,
        out_schema,
        "emitted bigint",
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

    return work.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
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
    the module-level semantic note applies.
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
    state_schema = "buf binary, match_no bigint"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
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
        if blob_match is not None:
            stored = pickle.loads(bytes(blob_match[0]))
            # state format: (buffer frame, lag context) — older blobs
            # held the bare frame
            buf, ctx = stored if isinstance(stored, tuple) else (stored, {})
            match_no = blob_match[1]
        else:
            buf, match_no = None, 0
        n_buf = len(buf) if buf is not None else 0
        new = [p for p in pdfs if len(p)]
        if not new:
            parts = [buf] if n_buf else []
        else:
            batch = pd.concat(new, ignore_index=True) if len(new) > 1 else new[0]
            batch = batch.sort_values(sort_cols, kind="mergesort")
            parts = ([buf] if n_buf else []) + [batch]
        if not parts:
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
        state.update((bytearray(pickle.dumps((keep, ctx))), match_no))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if len(out):
            yield out

    return work.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


# value types accepted by the streaming OVER operators; anything else
# (DECIMAL, STRING, …) is a typed rejection — DECIMAL has no exact
# frame-state representation here (ADVICE r5). Integral values keep
# an exact array<bigint> frame (a float frame would silently round
# BIGINTs past 2^53); floats use array<double> with NaN null slots.
_OVER_INT_TYPES = ("tinyint", "smallint", "int", "bigint")
_OVER_FLOAT_TYPES = ("float", "double")


def _encode_val(v, is_int: bool):
    """Frame-slot encoding: exact int (None = NULL slot) for integral
    value columns, float (NaN = NULL slot) for floating-point ones."""
    if _is_null(v):
        return None if is_int else float("nan")
    return int(v) if is_int else float(v)


def _is_missing(x) -> bool:
    return x is None or (isinstance(x, float) and math.isnan(x))


def _over_schemas(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str,
    aggs: tuple[str, ...],
) -> tuple[str, str, list[str]]:
    """Shared schema prep for the streaming OVER operators: validates
    columns + value type, and builds the (out_schema, num_t,
    emit_cols) triple. All input columns pass through (so a SQL
    SELECT over the result can project anything), followed by the
    ``{value}_{agg}`` frame-aggregate columns."""
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in partition_by + order_by + [value_col]:
        if c not in in_schema:
            raise ValueError(f"column '{c}' not in input")
    vt = in_schema[value_col]
    if vt in _OVER_FLOAT_TYPES:
        num_t = "double"
    elif vt in _OVER_INT_TYPES:
        num_t = "bigint"
    else:
        raise NotImplementedError(
            f"streaming OVER aggregation supports integral and "
            f"floating-point value columns; '{value_col}' is {vt} — "
            "CAST it to BIGINT or DOUBLE first (DECIMAL has no exact "
            "frame-state representation here)"
        )
    typed = {
        "sum": num_t, "cnt": "bigint", "avg": "double",
        "min": vt, "max": vt,
    }
    emit_cols = list(df.columns)
    out_fields = [f"{c} {in_schema[c]}" for c in emit_cols]
    out_fields += [f"{value_col}_{a} {typed[a]}" for a in aggs]
    return ", ".join(out_fields), num_t, emit_cols


def _is_null(v) -> bool:
    try:
        return v is None or pd.isna(v)
    except (TypeError, ValueError):
        return False


def _frame_aggs(live: list, aggs: tuple[str, ...], num_t: str) -> list:
    """Aggregates over the non-null frame values. SQL semantics:
    SUM/AVG/MIN/MAX skip NULLs and are NULL over an all-null frame;
    cnt counts non-null values (COUNT(x), not COUNT(*))."""
    out = []
    for a in aggs:
        if a == "cnt":
            out.append(len(live))
        elif not live:
            out.append(None)
        elif a == "sum":
            s = sum(live)
            out.append(s if num_t == "double" else int(s))
        elif a == "avg":
            out.append(sum(live) / len(live))
        elif a == "min":
            m = min(live)
            out.append(m if num_t == "double" else int(m))
        else:
            m = max(live)
            out.append(m if num_t == "double" else int(m))
    return out


def streaming_over_rows(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str,
    n_preceding: int,
    aggs: tuple[str, ...] = ("sum", "cnt", "avg", "min", "max"),
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming OVER aggregation with a ROWS frame — Spark Structured
    Streaming rejects window functions outright ("non-time-based
    windows"), but Flink supports `SUM(x) OVER (PARTITION BY k ORDER
    BY ts ROWS BETWEEN n PRECEDING AND CURRENT ROW)` on streams
    (SURVEY §2.6 / "what's hard"). Implemented the way Flink's
    OverAggregate operator does: per-key state is the last
    ``n_preceding + 1`` values (bounded, O(frame) not O(stream)), one
    output row per input row carrying the frame aggregates.

    NULL values occupy a frame slot (ROWS frames count rows) but are
    skipped by the aggregates, which stay NULL over an all-null frame
    — the row itself is still emitted (Flink OverAggregate behavior).
    Rows are processed in arrival order, sorted by ``order_by`` within
    each micro-batch (the module-level semantic note applies).
    """
    import math  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema, num_t, emit_cols = _over_schemas(
        df, partition_by, order_by, value_col, aggs
    )
    # integral values keep an exact bigint frame (None = NULL slot);
    # floats use a double frame with NaN null slots (ADVICE guidance)
    is_int = num_t == "bigint"
    state_schema = "frame array<bigint>" if is_int else "frame array<double>"
    out_cols = emit_cols + [f"{value_col}_{a}" for a in aggs]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle key past table.exec.state.ttl: evict its frame
            state.remove()
            return
        frame: list = list(state.get[0]) if state.exists else []
        out_rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            vals = pdf[value_col].tolist()
            for row, v in zip(pdf[emit_cols].itertuples(index=False), vals):
                frame.append(_encode_val(v, is_int))
                if len(frame) > n_preceding + 1:
                    frame.pop(0)
                live = [x for x in frame if not _is_missing(x)]
                out_rows.append(list(row) + _frame_aggs(live, aggs, num_t))
        state.update((frame,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_cols)

    return df.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout,
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


def streaming_over_range(
    df: DataFrame,
    partition_by: list[str],
    order_by: str | list[str],
    value_col: str,
    preceding: str | int | float,
    aggs: tuple[str, ...] = ("sum", "cnt", "avg", "min", "max"),
    ttl_ms: int | None = None,
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
    """
    import bisect  # noqa: PLC0415
    import math  # noqa: PLC0415

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
    horizon_us = _interval_us(preceding)
    out_schema, num_t, emit_cols = _over_schemas(
        df, partition_by, order_by, value_col, aggs
    )
    is_int = num_t == "bigint"
    state_schema = f"ts array<bigint>, vals array<{'bigint' if is_int else 'double'}>"
    out_cols = emit_cols + [f"{value_col}_{a}" for a in aggs]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ts_arr, val_arr = state.get
            ts_list, val_list = list(ts_arr), list(val_arr)
        else:
            ts_list, val_list = [], []
        max_ts = ts_list[-1] if ts_list else None
        out_rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            vals = pdf[value_col].tolist()
            tss = pdf[ts_col].tolist()
            for row, v, t in zip(pdf[emit_cols].itertuples(index=False), vals, tss):
                if _is_null(t):
                    continue  # no rowtime → dropped, like Flink
                t_us = int(pd.Timestamp(t).value // 1000)
                if max_ts is not None and t_us < max_ts - horizon_us:
                    continue  # beyond-watermark late row → dropped
                fv = _encode_val(v, is_int)
                i = bisect.bisect_right(ts_list, t_us)
                ts_list.insert(i, t_us)
                val_list.insert(i, fv)
                max_ts = t_us if max_ts is None else max(max_ts, t_us)
                # 2× retention: an admitted late row (≥ max_ts - h)
                # frames back to max_ts - 2h at most — keep exactly that
                cut = bisect.bisect_left(ts_list, max_ts - 2 * horizon_us)
                if cut:
                    del ts_list[:cut], val_list[:cut]
                lo = bisect.bisect_left(ts_list, t_us - horizon_us)
                hi = bisect.bisect_right(ts_list, t_us)
                live = [x for x in val_list[lo:hi] if not _is_missing(x)]
                out_rows.append(list(row) + _frame_aggs(live, aggs, num_t))
        state.update((ts_list, val_list))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_cols)

    return df.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout,
    )
