"""Pure-Python Avro binary codec + Confluent wire-format framing.

The reference declares ``avro`` / ``avro-confluent`` as first-class
Kafka formats (test/syntax-test.fsql:626-636, option vocabulary
``avro-confluent.url`` in syntaxes/flink.tmLanguage.json:518). Spark's
JVM decode (`from_avro`) lives in the external ``spark-avro`` module,
which is not bundled with a stock PySpark install — so the connector
first tries the JVM path and falls back to this codec, which
implements the Avro 1.x binary encoding spec (public format) directly:

- zigzag-varint ints/longs, little-endian IEEE float/double,
  length-prefixed bytes/strings, 1-byte booleans
- unions (branch index + value), arrays and maps (block runs with a
  zero terminator), enums (index), fixed
- logical types: decimal (big-endian two's-complement unscaled bytes),
  timestamp-millis / timestamp-micros on long, date on int,
  time-millis / time-micros on int/long (decoded to wall-clock
  ``datetime.time`` for Spark 4.1's TimeType; ISO string on builds
  without it — matching the DDL mapping either way, see compat.py)
- Confluent wire format: 1 magic byte (0) + 4-byte big-endian schema
  id + avro body

Scale shape: decode runs as an Arrow-batched ``mapInPandas`` over the
binary payload column — per-batch Python, no shuffle, no collect; the
schema is parsed once per executor batch-iterator, not per row. This
is the documented slow path relative to JVM ``from_avro``; the
connector prefers the JVM module whenever its jar is present.

The encoder exists for fixtures/tests — it produces the payloads the
decode path is verified against (round-trip property tests).
"""

from __future__ import annotations

import json
import struct
from datetime import date, datetime, time, timedelta, timezone
from decimal import Decimal
from typing import Any, Callable, Iterator

from flink_sql_toolkit_spark.compat import SUPPORTS_TIME_TYPE

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)

# ---------------------------------------------------------------- varints


def _zigzag_encode(n: int) -> int:
    return (n << 1) if n >= 0 else (-n << 1) - 1


def _zigzag_decode(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _write_varint(out: bytearray, n: int) -> None:
    z = _zigzag_encode(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc), pos
        shift += 7


# ---------------------------------------------------------------- schema


def parse_schema(schema: str | dict) -> dict:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return schema


def _type_name(sch: Any) -> str:
    if isinstance(sch, dict):
        return sch["type"]
    if isinstance(sch, list):
        return "union"
    return sch  # plain string primitive


# ---------------------------------------------------------------- decode


def decode(buf: bytes, sch: Any, pos: int = 0) -> tuple[Any, int]:
    """Decode one value of schema ``sch`` at ``pos``; returns
    (value, next_pos)."""
    t = _type_name(sch)
    if t == "union":
        idx, pos = _read_varint(buf, pos)
        return decode(buf, sch[idx], pos)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        n, pos = _read_varint(buf, pos)
        lt = sch.get("logicalType") if isinstance(sch, dict) else None
        # integer arithmetic: float division rounds microseconds for
        # post-2004 epochs (1e15 µs exceeds float64's exact range)
        if lt == "timestamp-millis":
            return _EPOCH + timedelta(milliseconds=n), pos
        if lt == "timestamp-micros":
            return _EPOCH + timedelta(microseconds=n), pos
        if lt == "date":
            return _EPOCH.date() + timedelta(days=n), pos
        if lt in ("time-millis", "time-micros"):
            # decode to the same shape the DDL maps TIME to: a native
            # datetime.time on Spark >= 4.1 (TimeType), else the
            # wall-clock ISO string (compat.py gates both together)
            us = n * 1000 if lt == "time-millis" else n
            t_ = (datetime.min + timedelta(microseconds=us)).time()
            if SUPPORTS_TIME_TYPE:
                return t_, pos
            return t_.strftime("%H:%M:%S.%f" if us % 1_000_000 else "%H:%M:%S"), pos
        return n, pos
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        ln, pos = _read_varint(buf, pos)
        raw = bytes(buf[pos : pos + ln])
        pos += ln
        if t == "string":
            return raw.decode("utf-8"), pos
        lt = sch.get("logicalType") if isinstance(sch, dict) else None
        if lt == "decimal":
            unscaled = int.from_bytes(raw, "big", signed=True)
            return Decimal(unscaled).scaleb(-sch.get("scale", 0)), pos
        return raw, pos
    if t == "fixed":
        ln = sch["size"]
        raw = bytes(buf[pos : pos + ln])
        return raw, pos + ln
    if t == "enum":
        idx, pos = _read_varint(buf, pos)
        return sch["symbols"][idx], pos
    if t == "array":
        items: list[Any] = []
        while True:
            cnt, pos = _read_varint(buf, pos)
            if cnt == 0:
                return items, pos
            if cnt < 0:  # block with byte-size prefix
                cnt = -cnt
                _, pos = _read_varint(buf, pos)
            for _ in range(cnt):
                v, pos = decode(buf, sch["items"], pos)
                items.append(v)
    if t == "map":
        m: dict[str, Any] = {}
        while True:
            cnt, pos = _read_varint(buf, pos)
            if cnt == 0:
                return m, pos
            if cnt < 0:
                cnt = -cnt
                _, pos = _read_varint(buf, pos)
            for _ in range(cnt):
                k, pos = decode(buf, "string", pos)
                v, pos = decode(buf, sch["values"], pos)
                m[k] = v
    if t == "record":
        rec: dict[str, Any] = {}
        for f in sch["fields"]:
            rec[f["name"]], pos = decode(buf, f["type"], pos)
        return rec, pos
    raise ValueError(f"unsupported avro type: {t!r}")


def decode_record(buf: bytes, schema: str | dict) -> dict:
    value, _ = decode(buf, parse_schema(schema))
    return value


# ---------------------------------------------------------------- encode


def encode(out: bytearray, value: Any, sch: Any) -> None:
    t = _type_name(sch)
    if t == "union":
        for i, branch in enumerate(sch):
            if _matches(value, branch):
                _write_varint(out, i)
                encode(out, value, branch)
                return
        raise ValueError(f"no union branch for {value!r} in {sch}")
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
        return
    if t in ("int", "long"):
        lt = sch.get("logicalType") if isinstance(sch, dict) else None
        if lt == "date" and isinstance(value, date) and not isinstance(value, datetime):
            value = (value - _EPOCH.date()).days
        elif lt in ("time-millis", "time-micros") and isinstance(value, (str, time)):
            if isinstance(value, time):
                us = (
                    (value.hour * 3600 + value.minute * 60 + value.second) * 1_000_000
                    + value.microsecond
                )
            else:
                h, m, s = value.split(":")
                us = (int(h) * 3600 + int(m) * 60) * 1_000_000 + round(float(s) * 1e6)
            value = us // 1000 if lt == "time-millis" else us
        elif isinstance(value, datetime) and lt in (
            "timestamp-millis",
            "timestamp-micros",
        ):
            if value.tzinfo is None:
                value = value.replace(tzinfo=timezone.utc)
            unit = (
                timedelta(milliseconds=1)
                if lt == "timestamp-millis"
                else timedelta(microseconds=1)
            )
            value = (value - _EPOCH) // unit  # exact integer epoch units
        _write_varint(out, value)
        return
    if t == "float":
        out += struct.pack("<f", value)
        return
    if t == "double":
        out += struct.pack("<d", value)
        return
    if t in ("bytes", "string"):
        if t == "string":
            raw = value.encode("utf-8")
        elif isinstance(value, Decimal):
            scale = sch.get("scale", 0) if isinstance(sch, dict) else 0
            unscaled = int(value.scaleb(scale))
            ln = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(ln, "big", signed=True)
        else:
            raw = bytes(value)
        _write_varint(out, len(raw))
        out += raw
        return
    if t == "fixed":
        out += bytes(value)
        return
    if t == "enum":
        _write_varint(out, sch["symbols"].index(value))
        return
    if t == "array":
        if value:
            _write_varint(out, len(value))
            for v in value:
                encode(out, v, sch["items"])
        _write_varint(out, 0)
        return
    if t == "map":
        if value:
            _write_varint(out, len(value))
            for k, v in value.items():
                encode(out, k, "string")
                encode(out, v, sch["values"])
        _write_varint(out, 0)
        return
    if t == "record":
        for f in sch["fields"]:
            encode(out, value.get(f["name"]), f["type"])
        return
    raise ValueError(f"unsupported avro type: {t!r}")


def _matches(value: Any, branch: Any) -> bool:
    t = _type_name(branch)
    if t == "null":
        return value is None
    return value is not None


def encode_record(value: dict, schema: str | dict) -> bytes:
    out = bytearray()
    encode(out, value, parse_schema(schema))
    return bytes(out)


# ------------------------------------------------- confluent wire format

CONFLUENT_MAGIC = 0


def confluent_frame(body: bytes, schema_id: int) -> bytes:
    """magic(1) + schema-id(4, big-endian) + avro body."""
    return bytes([CONFLUENT_MAGIC]) + struct.pack(">I", schema_id) + body


def confluent_unframe(frame: bytes) -> tuple[int, bytes]:
    if not frame or frame[0] != CONFLUENT_MAGIC:
        raise ValueError("not a Confluent-framed avro message")
    return struct.unpack_from(">I", frame, 1)[0], bytes(frame[5:])


# ------------------------------------------------- DDL <-> avro schema

_SPARK_TO_AVRO = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


def avro_schema_for_columns(columns, name: str = "row") -> dict:
    """Derive the record schema from the table's declared columns —
    mirroring Flink's avro format, which derives the writer schema from
    the DDL when no explicit schema option is set. All fields nullable
    (Flink's types default nullable)."""
    fields = []
    for c in columns:
        t = c.spark_type.lower()
        if t in _SPARK_TO_AVRO:
            avro_t: Any = _SPARK_TO_AVRO[t]
        elif t.startswith("decimal"):
            prec, scale = (
                t[t.index("(") + 1 : t.index(")")].split(",") if "(" in t else ("10", "0")
            )
            avro_t = {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": int(prec),
                "scale": int(scale),
            }
        elif t.startswith("timestamp"):
            avro_t = {"type": "long", "logicalType": "timestamp-millis"}
        elif t == "date":
            avro_t = {"type": "int", "logicalType": "date"}
        elif t.startswith("time"):
            # Flink's avro format maps TIME(<=3) to time-millis on int
            # and higher precisions to time-micros on long
            prec = int(t[t.index("(") + 1 : t.index(")")]) if "(" in t else 0
            avro_t = (
                {"type": "int", "logicalType": "time-millis"}
                if prec <= 3
                else {"type": "long", "logicalType": "time-micros"}
            )
        else:
            raise ValueError(f"no avro mapping for spark type {t!r}")
        fields.append({"name": c.name, "type": ["null", avro_t]})
    return {"type": "record", "name": name, "fields": fields}


# ------------------------------------------------- Spark integration


# executor-side writer-schema caches, keyed by (registry url, id) so
# they persist across tasks within one python worker — the registry
# is consulted once per (worker, id), never per batch. _DEAD_REGISTRY
# is the negative cache: an unreachable registry costs one connect
# timeout per retry window, during which decode proceeds with the
# declared schema (the pre-registry behavior, documented in
# schema_registry.py). The entry carries WHEN it died and expires
# after _DEAD_TTL_S so a transient blip (registry restart, network
# flap) cannot poison the worker for its whole life (review r10).
_WRITER_CACHE: dict = {}
_DEAD_REGISTRY: dict = {}  # url -> monotonic seconds at failure
_DEAD_TTL_S = 60.0


def avro_decode_mapper(
    schema: str | dict,
    out_fields: list[str],
    confluent: bool,
    registry: dict | None = None,
) -> Callable[[Iterator], Iterator]:
    """Build the ``mapInPandas`` function: decodes the ``value`` binary
    column into ``out_fields``, passing every other input column
    through untouched. Arrow-batched; the schema is parsed once per
    partition-iterator.

    With ``registry`` (the picklable dict from
    ``schema_registry.registry_options``), each confluent frame's
    writer schema id resolves against the registry — Flink's
    avro-confluent deserialization contract: producers with evolved /
    reordered schemas decode correctly, projected onto the declared
    ``out_fields``. A schema id the registry rejects is a hard error.
    An UNREACHABLE registry is also a hard error for writer ids not
    already in the per-worker cache — Flink's deserializer never falls
    back to the reader schema, because decoding an evolved writer's
    binary with the declared schema yields silently misaligned values
    (ADVICE r10). ``'avro-confluent.reader-schema-fallback'='true'``
    opts into the old lossy behavior; cached ids always keep
    decoding through an outage either way."""
    import pandas as pd  # noqa: PLC0415

    sch = parse_schema(schema)

    def registry_down(sid: int, url: str) -> dict:
        if registry.get("reader_schema_fallback") == "true":
            return sch
        from flink_sql_toolkit_spark.sources.schema_registry import (  # noqa: PLC0415
            SchemaRegistryError,
        )

        raise SchemaRegistryError(
            f"schema registry {url} is unreachable and writer schema id "
            f"{sid} is not cached on this worker — refusing to decode "
            "with the declared reader schema (an evolved writer schema "
            "would decode to misaligned values). Restore the registry, "
            "or set 'avro-confluent.reader-schema-fallback' = 'true' to "
            "opt into reader-schema decode during outages."
        )

    def writer_schema(sid: int):
        import time as _time  # noqa: PLC0415

        if registry is None:
            return sch
        url = registry["url"]
        key = (url, sid)
        if key in _WRITER_CACHE:
            return _WRITER_CACHE[key]
        died = _DEAD_REGISTRY.get(url)
        if died is not None:
            if _time.monotonic() - died < _DEAD_TTL_S:
                return registry_down(sid, url)
            del _DEAD_REGISTRY[url]  # TTL elapsed: retry the registry
        from flink_sql_toolkit_spark.sources.schema_registry import (  # noqa: PLC0415
            SchemaRegistryClient,
            SchemaRegistryError,
        )

        import http.client as _hc  # noqa: PLC0415

        client = SchemaRegistryClient(url, registry.get("user_info"))
        try:
            raw = client.get_schema_by_id(sid)
        except SchemaRegistryError:
            raise  # the registry ANSWERED: it does not know this id
        except (OSError, _hc.HTTPException):
            # transport-level failure only (URLError/TimeoutError are
            # OSError subclasses; HTTPException covers a connection
            # dropped mid-body) — a registry that answered with an
            # unparsable payload must hard-error below, not silently
            # mis-decode with the declared schema (review r10, pass 4)
            _DEAD_REGISTRY[url] = _time.monotonic()
            return registry_down(sid, url)
        ws = parse_schema(raw)  # a bad ANSWERED schema propagates
        _WRITER_CACHE[key] = ws
        return ws

    def mapper(batches: Iterator) -> Iterator:
        for pdf in batches:
            decoded: list[dict] = []
            for payload in pdf["value"]:
                body = bytes(payload)
                if confluent:
                    sid, body = confluent_unframe(body)
                    decoded.append(decode_record(body, writer_schema(sid)))
                else:
                    decoded.append(decode_record(body, sch))
            cols = {f: [r.get(f) for r in decoded] for f in out_fields}
            out = pd.DataFrame(cols)
            for c in pdf.columns:
                if c != "value":
                    out[c] = pdf[c].values
            yield out

    return mapper
