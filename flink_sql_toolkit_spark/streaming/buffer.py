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
from collections import OrderedDict
from typing import Any

NOT_READY = "NOT_READY"
PAYLOAD = "PAYLOAD"
EOS = "EOS"

# Observability counters the buffers attach to pages — the single
# source of truth for every surface that forwards them (the gateway's
# wire passthrough, the notebook runner's StatementResult.counters);
# hand-duplicated lists drift when a counter is added (review r11)
OBSERVABILITY_COUNTERS = (
    "totalRows",
    "lateDropped",
    "evictedKeys",
    "skippedRows",
    "invalidatedKeys",
)


def grouping_key_positions(df) -> list[int] | None:
    """Output positions of the outermost Aggregate's grouping columns.

    This is the key Spark's update output mode re-emits rows under —
    and therefore the key a changelog view must pair -U/+U rows on.
    Walks down from the analyzed plan's root through unary nodes,
    composing Project alias chains (``SELECT k AS kk`` still maps), to
    the first Aggregate; its grouping ``AttributeReference``s resolve
    to root-output positions by expression id. The FULL grouping key
    must resolve — pairing on a partial key would emit a retraction of
    a *different* key's row (two keys sharing the mapped columns) —
    else (or with no aggregate, or a non-column grouping expression)
    returns None and the caller treats the stream as append-only
    (+I rows), which never fabricates a wrong retraction.
    """
    try:
        jplan = df._jdf.queryExecution().analyzed()
    except Exception:  # noqa: BLE001 — non-classic DataFrame (mock)
        return None

    def seq(s) -> list:
        return [s.apply(i) for i in range(s.size())]

    def kind(n) -> str:
        return n.getClass().getSimpleName()

    # resolve: expression id at the current depth → root output position
    resolve = {a.exprId().id(): i for i, a in enumerate(seq(jplan.output()))}
    node = jplan
    while True:
        name = kind(node)
        if name == "Aggregate":
            # the Aggregate's own output list can alias key columns
            # (`SELECT a AS aa ... GROUP BY a` has no separate Project)
            for e in seq(node.aggregateExpressions()):
                if kind(e) == "Alias" and e.exprId().id() in resolve:
                    ch = e.child()
                    if kind(ch) == "AttributeReference":
                        resolve.setdefault(
                            ch.exprId().id(), resolve[e.exprId().id()]
                        )
            gids = [
                g.exprId().id()
                for g in seq(node.groupingExpressions())
                if kind(g) == "AttributeReference"
            ]
            n_grouping = node.groupingExpressions().size()
            if not gids or len(gids) != n_grouping:
                return None  # expression grouping keys: not mappable
            if not all(g in resolve for g in gids):
                return None  # key column dropped by a projection
            return sorted(resolve[g] for g in gids)
        if name == "Project":
            new: dict[int, int] = {}
            for e in seq(node.projectList()):
                en = kind(e)
                if en == "AttributeReference" and e.exprId().id() in resolve:
                    new[e.exprId().id()] = resolve[e.exprId().id()]
                elif en == "Alias" and e.exprId().id() in resolve:
                    ch = e.child()
                    if kind(ch) == "AttributeReference":
                        new[ch.exprId().id()] = resolve[e.exprId().id()]
            resolve = new
        children = seq(node.children())
        if len(children) != 1:
            return None  # join/union/leaf above the aggregate
        node = children[0]


class StreamResultBuffer:
    def __init__(self, max_rows: int = 1000):
        self.max_rows = max_rows
        self._rows: list[list[Any]] = []
        self._offset = 0  # rows evicted from the front
        self._total = 0
        self._finished = False
        self._error: Exception | None = None
        self._lock = threading.Lock()
        # sequential-token tolerance (see fetch): the last requested
        # token, the absolute start it was served from, and the
        # absolute end of the last served page
        self._last_token: int | None = None
        self._last_start = 0
        self._last_end = 0

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

        Sequential-token tolerance: the real Flink gateway numbers
        pages 0, 1, 2, … and the reference's streaming poll loop
        increments its token by one per poll instead of following
        ``nextResultToken`` (src/notebookController.ts:221-246). Under
        pure absolute semantics that loop would re-read nearly the
        whole ring every second as duplicates. So a request for
        exactly ``last_token + 1`` is served as "the next page" (rows
        after the last served page), and a repeat of ``last_token`` is
        served as a retry of that same page — both matching the real
        gateway's contract. Token 0 always means "the current ring"
        (a fresh reader), and any other token keeps the absolute
        interpretation, which is what ``nextResultToken``-following
        clients send (the two interpretations coincide for them:
        ``nextResultToken`` IS the absolute end of the last page).
        One deliberate exception to "absolute otherwise": an absolute
        RE-read that happens to land on ``last_token + 1`` (e.g.
        re-reading position 7 right after position 6) takes the
        sequential reading — the cursor cannot distinguish the two,
        and preferring sequential is what keeps the reference's
        streaming loop duplicate-free. Flink's real gateway rejects
        such tokens outright; re-readers here should restart from
        token 0 (the current ring) instead.
        The sequential reading MUST also cover tokens beyond the data
        end: the reference loop increments its token on every poll
        including empty ones, so during a stream stall the token
        outruns the served end — bounding the branch by ``last_end``
        would silently drop the rows that arrive after the stall
        (review r11 pass 2 caught exactly that regression). For an
        absolute ``nextResultToken`` follower the branch is harmless:
        its request equals the last served end, where both readings
        serve the same rows. Like the real gateway (whose fetch API
        errors on any token other than current/next), the cursor
        state makes a result stream effectively single-consumer;
        independent concurrent readers should each open their own
        operation.
        """
        with self._lock:
            if self._error is not None:
                raise self._error
            if (
                token != 0
                and self._last_token is not None
                and token == self._last_token + 1
            ):
                start_abs = self._last_end  # sequential client: next page
            elif token != 0 and token == self._last_token:
                start_abs = self._last_start  # retry of the same page
            else:
                start_abs = token  # absolute semantics
            start = max(start_abs, self._offset) - self._offset
            rows = self._rows[start:]
            next_token = self._offset + len(self._rows)
            self._last_token = token
            self._last_start = start_abs
            self._last_end = next_token
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


class ChangelogResultBuffer(StreamResultBuffer):
    """Changelog (retract-stream) view of a streaming result — Flink's
    ``SET 'sql-client.execution.result-mode' = 'changelog'``.

    Each visible row is prefixed with its RowKind ``op``: the first
    value seen for a key emits ``+I``; a later update-mode re-emission
    of that key emits the ``-U`` retraction of the previous value
    followed by the ``+U`` new value — exactly the changelog Flink's
    SQL client renders. ``key_positions`` are the output positions of
    the update-mode grouping key (``grouping_key_positions``); with no
    key (append-only query, or an unmappable grouping) every row is
    ``+I``.

    Scale bounds: per-batch driver materialization inherits the
    parent's ``tail(max_rows)`` cap, and the key→last-value map is an
    LRU capped at ``max_keys`` — evicting a key means a later update
    for it re-emits as ``+I`` instead of a ``-U``/``+U`` pair (the
    same degradation Flink's client exhibits when its result table is
    size-capped); ``evicted_keys`` makes that observable.
    """

    def __init__(
        self,
        key_positions: list[int] | None,
        max_rows: int = 1000,
        max_keys: int = 100_000,
    ):
        super().__init__(max_rows)
        self.key_positions = key_positions
        self.max_keys = max_keys
        self.evicted_keys = 0  # keys aged out of the LRU cap
        self.skipped_rows = 0  # rows dropped by the tail(max_rows) cap
        self.invalidated_keys = 0  # keys flushed after a tail skip
        self._last: OrderedDict[tuple, list] = OrderedDict()

    def fetch(self, token: int) -> dict:
        page = super().fetch(token)
        # observability: nonzero counts mean some retractions were
        # degraded to +I re-inserts — evictedKeys by the key-LRU cap,
        # invalidatedKeys/skippedRows by the tail cap (two distinct
        # pressures, kept separable for alerting — review r7)
        page["evictedKeys"] = self.evicted_keys
        page["skippedRows"] = self.skipped_rows
        page["invalidatedKeys"] = self.invalidated_keys
        return page

    def foreach_batch(self, batch_df, _batch_id: int) -> None:
        batch_df.persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            tail = batch_df.tail(self.max_rows)
        finally:
            batch_df.unpersist()
        skipped = n - len(tail)
        if skipped and self.key_positions is not None:
            # rows dropped by the tail cap may have updated keys the
            # map still holds at an older value — a later update would
            # then emit a -U carrying that stale value. Invalidate the
            # whole map (those keys degrade to +I re-inserts, never a
            # wrong retraction) and count the skip so the degradation
            # is observable (ADVICE r6).
            self.skipped_rows += skipped
            self.invalidated_keys += len(self._last)
            self._last.clear()
        out: list[list[Any]] = []
        if self.key_positions is None:
            out = [["+I", *r] for r in tail]
        else:
            for r in tail:
                row = list(r)
                key = tuple(row[i] for i in self.key_positions)
                old = self._last.get(key)
                if old is None:
                    out.append(["+I", *row])
                else:
                    out.append(["-U", *old])
                    out.append(["+U", *row])
                self._last[key] = row
                self._last.move_to_end(key)
                if len(self._last) > self.max_keys:
                    self._last.popitem(last=False)
                    self.evicted_keys += 1
        # `skipped` input rows beyond the ring cap are accounted as
        # evicted without synthesizing their changelog entries (their
        # -U/+U pairs would fall out of the ring immediately anyway)
        self.append_batch(out, total=len(out) + skipped)


class OpsPassthroughBuffer(StreamResultBuffer):
    """Changelog passthrough for operators that emit their own RowKind
    rows (the keep-last/Top-N route: a leading ``__op`` column).

    Pairing needs no key map — the operator already paired the
    retractions — but the tail(max_rows) driver cap can still drop a
    leading -U/-D whose +U/+I survives, silently corrupting the
    collapsed view; the skip is counted so the degradation is
    observable (review r7), mirroring ChangelogResultBuffer. The
    collection mechanics are inherited unchanged — only the
    accounting hook differs (review r7: no duplicated
    persist/count/tail logic to drift)."""

    def __init__(self, max_rows: int = 1000):
        super().__init__(max_rows)
        self.skipped_rows = 0

    def append_batch(self, rows: list, total: int | None = None) -> None:
        if total is not None:
            self.skipped_rows += total - len(rows)
        super().append_batch(rows, total)

    def fetch(self, token: int) -> dict:
        page = super().fetch(token)
        page["skippedRows"] = self.skipped_rows
        return page
