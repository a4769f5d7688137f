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

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(df: DataFrame, keys: list[str], watermark_col: str, delay: str) -> DataFrame:
    """Keep-first-per-key within the watermark horizon — the Flink
    ``ROW_NUMBER() = 1`` streaming dedup pattern."""
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)


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
    pressure-valve role as Flink CEP's WITHIN) and optionally by a
    processing-time TTL that batch-flushes and clears the key
    (``table.exec.state.ttl``).

    Restrictions (typed errors): ONE ROW PER MATCH only, and no
    PREV() in DEFINE (the batch path compiles PREV to a lag() window,
    which Structured Streaming cannot evaluate). Rows are processed
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
        all_rows=False,
        _compile_only=True,
    )
    if compiled["has_lags"]:
        raise NotImplementedError(
            "PREV() in DEFINE compiles to a lag() window, which "
            "Structured Streaming cannot evaluate — rewrite the "
            "condition over the current row or use the batch operator"
        )
    work, run_nfa = compiled["work"], compiled["run_nfa"]
    out_schema, sort_cols = compiled["out_schema"], compiled["sort_cols"]
    state_schema = "buf binary, match_no bigint"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            blob, match_no = state.get
            state.remove()
            buf = pickle.loads(bytes(blob))
            if len(buf):
                # TTL flush: decide the held suffix as if the stream
                # ended here (batch semantics), then clear the key
                out = run_nfa(buf.reset_index(drop=True), match_no_base=match_no)
                if len(out):
                    yield out
            return
        blob_match = state.get if state.exists else None
        if blob_match is not None:
            buf = pickle.loads(bytes(blob_match[0]))
            match_no = blob_match[1]
        else:
            buf, match_no = None, 0
        new = [p for p in pdfs if len(p)]
        if not new:
            parts = [buf] if buf is not None and len(buf) else []
        else:
            batch = pd.concat(new, ignore_index=True) if len(new) > 1 else new[0]
            batch = batch.sort_values(sort_cols, kind="mergesort")
            parts = ([buf] if buf is not None and len(buf) else []) + [batch]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        pdf = pdf.reset_index(drop=True)
        out, keep_from, match_no = run_nfa(
            pdf, streaming=True, match_no_base=match_no
        )
        keep = pdf.iloc[keep_from:]
        if len(keep) > max_buffer_rows:
            keep = keep.iloc[-max_buffer_rows:]
        state.update((bytearray(pickle.dumps(keep)), match_no))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if len(out):
            yield out

    return work.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_over_rows(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str,
    n_preceding: int,
    aggs: tuple[str, ...] = ("sum", "cnt", "avg", "min", "max"),
) -> DataFrame:
    """Streaming OVER aggregation with a ROWS frame — Spark Structured
    Streaming rejects window functions outright ("non-time-based
    windows"), but Flink supports `SUM(x) OVER (PARTITION BY k ORDER
    BY ts ROWS BETWEEN n PRECEDING AND CURRENT ROW)` on streams
    (SURVEY §2.6 / "what's hard"). Implemented the way Flink's
    OverAggregate operator does: per-key state is the last
    ``n_preceding`` values (bounded, O(frame) not O(stream)), one
    output row per input row carrying the frame aggregates.

    Rows are processed in arrival order, sorted by ``order_by`` within
    each micro-batch (the module-level semantic note applies).
    """
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in partition_by + order_by + [value_col]:
        if c not in in_schema:
            raise ValueError(f"column '{c}' not in input")
    num_t = "double" if in_schema[value_col] in ("double", "float") else "bigint"
    out_fields = [f"{c} {in_schema[c]}" for c in partition_by + order_by]
    typed = {
        "sum": num_t, "cnt": "bigint", "avg": "double",
        "min": in_schema[value_col], "max": in_schema[value_col],
    }
    out_fields.append(f"{value_col} {in_schema[value_col]}")
    out_fields += [f"{value_col}_{a} {typed[a]}" for a in aggs]
    out_schema = ", ".join(out_fields)
    state_schema = "frame array<double>"
    emit_cols = partition_by + order_by + [value_col]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        frame: list[float] = list(state.get[0]) if state.exists else []
        out_rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_by, kind="mergesort")
            for row in pdf[emit_cols].itertuples(index=False):
                v = row[-1]
                frame.append(float(v))
                if len(frame) > n_preceding + 1:
                    frame.pop(0)
                rec = list(row)
                for a in aggs:
                    if a == "sum":
                        s = sum(frame)
                        rec.append(s if num_t == "double" else int(s))
                    elif a == "cnt":
                        rec.append(len(frame))
                    elif a == "avg":
                        rec.append(sum(frame) / len(frame))
                    elif a == "min":
                        m = min(frame)
                        rec.append(m if num_t == "double" else int(m))
                    else:
                        m = max(frame)
                        rec.append(m if num_t == "double" else int(m))
                out_rows.append(rec)
        state.update(([float(x) for x in frame],))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=emit_cols + [f"{value_col}_{a}" for a in aggs],
            )

    return df.groupBy(*partition_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
