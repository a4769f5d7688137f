"""Late-data side output — closes SURVEY.md §2.11's one declared gap.

Flink windowed aggregations can route rows older than the watermark
to a side output (``sideOutputLateData``); the reference corpus
implies it through its watermark DDL. Spark's *stateful* operators
silently drop such rows — but the drop happens only inside stateful
operators. A stateless ``foreachBatch`` sink receives every row,
while the query still tracks the event-time watermark in its
progress metadata: the same value stateful operators filter by (max
event time of the previous batch minus the delay). The side output
is therefore recoverable exactly: per micro-batch, split on
``ts < watermark`` and hand each half to its own sink.

Semantics: batch N is classified against the watermark in effect
during batch N — identical to the boundary Spark's own stateful
operators apply when dropping — so ``on_time`` receives exactly the
rows a downstream windowed aggregation would accept, and ``late``
receives exactly the rows it would silently lose. Spark only
*reports* batch N's watermark in progress N (posted after the batch
completes), so ``lastProgress`` alone is one batch stale; the split
instead reproduces Spark's own update rule — running max of per-batch
max event time, minus the delay — from ``eventTime.max`` of each
completed progress, taking the reported watermark where it is ahead
(e.g. on restart from a checkpoint). Before any batch completes the
watermark is the epoch and nothing is late (also Spark's behavior).

Scale: the split is two JVM-side filters over the micro-batch; the
watermark read is O(1) driver-side metadata from
``StreamingQueryProgress``. Handlers receive DataFrames and write
distributed — nothing is collected to the driver here.

Restart caveat (documented divergence): immediately after a
checkpoint restart no progress exists yet, so the FIRST batch is
classified against the epoch — rows behind the restored watermark
land in ``on_time`` (where a downstream stateful op would still drop
them, exactly as without this split) rather than in ``late``. From
the second batch on, the reported watermark is taken where it is
ahead of the reconstruction and classification is exact again.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BatchHandler = Callable[[DataFrame, int], None]

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)

_UNIT_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _parse_interval(delay: str) -> timedelta:
    """Parse the ``withWatermark`` delay string ('5 minutes',
    '1 hour 30 minutes') the way Spark's CalendarInterval does for
    these time units."""
    parts = re.findall(r"(?i)(\d+)\s*(millisecond|second|minute|hour|day)s?", delay)
    if not parts:
        raise ValueError(f"cannot parse watermark delay '{delay}'")
    return timedelta(
        milliseconds=sum(int(n) * _UNIT_MS[u.lower()] for n, u in parts)
    )


def _iso(ts: str) -> datetime:
    return datetime.fromisoformat(ts.replace("Z", "+00:00"))


class LateDataSplit:
    """``foreachBatch`` body that routes each micro-batch into
    on-time and late halves relative to the query's current
    event-time watermark. Bind the started query with ``attach`` so
    the split can read its progress; until a batch completes the
    watermark is the epoch → everything is on-time."""

    def __init__(
        self, ts_col: str, delay: str, on_time: BatchHandler, late: BatchHandler
    ):
        self.ts_col = ts_col
        self.delay = _parse_interval(delay)
        self.on_time = on_time
        self.late = late
        self.query = None
        self.batches = 0
        self._max_event: datetime | None = None

    def attach(self, query) -> None:
        self.query = query

    def current_watermark(self) -> datetime | None:
        """The watermark in effect for the NEXT batch: Spark's update
        rule (running max event time − delay) reproduced from
        completed-progress metadata, or the reported watermark where
        that is ahead (checkpoint restart)."""
        q = self.query
        progress = q.lastProgress if q is not None else None
        event_time = (progress.get("eventTime") or {}) if progress else {}
        batch_max = event_time.get("max")
        if batch_max:
            observed = _iso(batch_max)
            if self._max_event is None or observed > self._max_event:
                self._max_event = observed
        candidates = []
        if self._max_event is not None:
            candidates.append(self._max_event - self.delay)
        reported = event_time.get("watermark")
        if reported:
            candidates.append(_iso(reported))
        return max(candidates) if candidates else None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.batches += 1
        wm = self.current_watermark()
        if wm is None or wm <= _EPOCH:
            self.on_time(batch_df, batch_id)
            self.late(batch_df.filter(F.lit(False)), batch_id)
            return
        is_late = F.col(self.ts_col) < F.lit(wm)
        self.on_time(batch_df.filter(~is_late), batch_id)
        self.late(batch_df.filter(is_late), batch_id)


def start_with_late_split(
    stream_df: DataFrame,
    ts_col: str,
    delay: str,
    on_time: BatchHandler,
    late: BatchHandler,
    query_name: str | None = None,
    trigger: dict | None = None,
    checkpoint: str | None = None,
):
    """Start ``stream_df`` with a watermark on ``ts_col`` and a
    foreachBatch sink that side-outputs late rows — the Flink
    ``sideOutputLateData`` shape. Returns ``(query, split)``."""
    split = LateDataSplit(ts_col, delay, on_time, late)
    writer = (
        stream_df.withWatermark(ts_col, delay)
        .writeStream.outputMode("append")
        .foreachBatch(split)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    query = writer.start()
    split.attach(query)
    return query, split
