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
