"""Token-paged streaming result buffer.

Replicates the reference's streaming result contract
(src/notebookController.ts:219-294): rows append as micro-batches
arrive, the visible buffer is a ring capped at ``max_rows`` (1000,
:258-263) with an ``offset`` counting evicted rows, and fetches are
token-paged with ``NOT_READY | PAYLOAD | EOS`` result types
(src/flinkClient.ts:18-27).

The buffer is fed by a ``foreachBatch`` sink. Driver-side
materialization is bounded by the ring itself: each micro-batch is
counted executor-side and only its **last ``max_rows`` rows**
(``DataFrame.tail``) are ever collected, so even a restart-backlog
batch containing the entire source history ships at most ``max_rows``
rows to the driver; the rows before the tail are accounted as evicted
via ``offset``, exactly as if they had passed through the ring.
"""

from __future__ import annotations

import threading
from typing import Any

NOT_READY = "NOT_READY"
PAYLOAD = "PAYLOAD"
EOS = "EOS"


class StreamResultBuffer:
    def __init__(self, max_rows: int = 1000):
        self.max_rows = max_rows
        self._rows: list[list[Any]] = []
        self._offset = 0  # rows evicted from the front
        self._total = 0
        self._finished = False
        self._error: Exception | None = None
        self._lock = threading.Lock()

    # -- producer side (foreachBatch) ---------------------------------
    def append_batch(self, rows: list[list[Any]], total: int | None = None) -> None:
        """Append a batch of ``total`` rows of which only the trailing
        ``rows`` were materialized.

        ``total - len(rows)`` leading rows are accounted as evicted
        without ever being held (they would fall out of the ring
        immediately anyway), keeping token arithmetic exact.
        """
        total = len(rows) if total is None else total
        with self._lock:
            skipped = total - len(rows)
            self._offset += skipped
            self._rows.extend(rows)
            self._total += total
            overflow = len(self._rows) - self.max_rows
            if overflow > 0:
                del self._rows[:overflow]
                self._offset += overflow

    def foreach_batch(self, batch_df, _batch_id: int) -> None:
        # Bound driver materialization: count executor-side, then
        # collect at most the last ``max_rows`` rows. A catch-up batch
        # after a restart can hold the whole backlog — collecting it
        # in full just to trim to the ring would be unbounded.
        batch_df.persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            tail = batch_df.tail(self.max_rows)
            self.append_batch([list(r) for r in tail], total=n)
        finally:
            batch_df.unpersist()

    def finish(self, error: Exception | None = None) -> None:
        with self._lock:
            self._finished = True
            self._error = error

    # -- consumer side (token-paged fetch) ----------------------------
    def fetch(self, token: int) -> dict[str, Any]:
        """Return rows from absolute position ``token`` onward.

        Tokens index the absolute row sequence; a token older than the
        ring start is answered from the ring start (the reference UI
        shows the same eviction behavior via ``offset``).
        """
        with self._lock:
            if self._error is not None:
                raise self._error
            start = max(token, self._offset) - self._offset
            rows = self._rows[start:]
            next_token = self._offset + len(self._rows)
            if rows:
                result_type = PAYLOAD
            elif self._finished:
                result_type = EOS
            else:
                result_type = NOT_READY
            return {
                "data": rows,
                "resultType": result_type,
                "nextResultToken": next_token,
                "offset": self._offset,
                "totalRows": self._total,
                "isComplete": self._finished,
            }
