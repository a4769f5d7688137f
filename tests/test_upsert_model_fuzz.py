"""Model-based fuzz for the upsert-kafka batch view (r14).

The joint-ordering-domain semantics (one domain per key, decided
over live + tombstone records together — ADVICE r13 #2) are subtle
enough to deserve a reference model: random topic histories are
replayed against a ~30-line Python model implementing the DOCUMENTED
contract, and `upsert_batch_view` must agree exactly.

Model contract (mirrors the upsert_batch_view docstring):
- np(key)  = #distinct partitions over ALL of the key's records
  (live and tombstone).
- domain   = offset alone when np == 1 (Kafka's per-partition total
  order, CreateTime-safe); (ts, partition, offset) lexicographic
  when the key spans partitions.
- latest live / latest tombstone are each the domain-max of their
  side; the key is deleted iff a tombstone exists and out-orders the
  latest live record IN THE SAME DOMAIN.

Offsets are generated unique per partition (Kafka's invariant), so
no ordering ties exist and both sides are deterministic.
"""

from __future__ import annotations

import datetime as dt
import json
import random

import pytest

pytestmark = pytest.mark.fuzz

KAFKA_COLS = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def _table():
    from flink_sql_toolkit_spark.sources.ddl import parse_create_table

    return parse_create_table(
        "CREATE TABLE u (id BIGINT, name STRING, PRIMARY KEY (id) NOT "
        "ENFORCED) WITH ('connector'='upsert-kafka', 'topic'='t', "
        "'properties.bootstrap.servers'='x:9092', 'value.format'='json');"
    )


def _gen_history(rng: random.Random):
    """Random topic history: (key_id, is_tomb, partition, offset,
    ts_sec) with per-partition unique, monotone offsets."""
    n_keys = rng.randint(1, 4)
    n_parts = rng.randint(1, 3)
    next_off = dict.fromkeys(range(n_parts), 0)
    records = []
    for _ in range(rng.randint(1, 14)):
        k = rng.randint(1, n_keys)
        part = rng.randrange(n_parts)
        off = next_off[part]
        next_off[part] += 1
        # CreateTime: producer clocks are arbitrary — ts uncorrelated
        # with offset on purpose
        records.append((k, rng.random() < 0.3, part, off, rng.randint(0, 30)))
    return records


def _model(records):
    """Reference implementation of the documented view semantics."""
    per_key: dict[int, dict[str, list]] = {}
    for k, tomb, part, off, sec in records:
        side = per_key.setdefault(k, {"live": [], "tomb": []})
        side["tomb" if tomb else "live"].append((part, off, sec))
    out = {}
    for k, sides in per_key.items():
        if not sides["live"]:
            continue
        parts = {p for p, _o, _s in sides["live"] + sides["tomb"]}
        if len(parts) == 1:
            key_fn = lambda r: r[1]  # offset  # noqa: E731
        else:
            key_fn = lambda r: (r[2], r[0], r[1])  # (ts, part, off)  # noqa: E731
        live = max(sides["live"], key=key_fn)
        if sides["tomb"]:
            tomb = max(sides["tomb"], key=key_fn)
            if key_fn(tomb) > key_fn(live):
                continue  # deleted
        out[k] = f"v{live[0]}-{live[1]}"  # name encodes (part, off)
    return out


def _frame(spark, records):
    rows = []
    for k, tomb, part, off, sec in records:
        key = json.dumps({"id": k}).encode()
        val = (
            None
            if tomb
            else json.dumps({"id": k, "name": f"v{part}-{off}"}).encode()
        )
        rows.append(
            (
                bytearray(key),
                bytearray(val) if val is not None else None,
                "t",
                part,
                off,
                dt.datetime(2024, 1, 1, 0, 0, sec),
                0,
            )
        )
    return spark.createDataFrame(rows, KAFKA_COLS)


@pytest.mark.parametrize("seed", range(25))
def test_random_history_matches_model(spark, seed):
    from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

    rng = random.Random(1000 + seed)
    records = _gen_history(rng)
    expect = _model(records)
    out = upsert_batch_view(_frame(spark, records), _table())
    got = {r.id: r.name for r in out.collect()}
    assert got == expect, (
        f"seed={seed} history={records}\n got={got}\n expect={expect}"
    )
