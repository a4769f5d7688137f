"""Confluent Schema Registry client + avro-confluent wiring (VERDICT
r9 missing #4): the 5-byte-header framing already existed
(sources/avro_codec.py); this adds the registry REST client and tests
it against a stdlib stub server — writer-schema-per-id resolution on
decode (Flink's deserialization contract), sink-side id negotiation
via subject registration, caching, auth, and failure modes."""

from __future__ import annotations

import base64
import datetime as dt
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from flink_sql_toolkit_spark.sources import avro_codec as ac
from flink_sql_toolkit_spark.sources.connectors import (
    _decode_payload,
    kafka_writer_payload,
)
from flink_sql_toolkit_spark.sources.ddl import parse_create_table
from flink_sql_toolkit_spark.sources.schema_registry import (
    SchemaRegistryClient,
    SchemaRegistryError,
    registry_options,
    subject_for,
)


class _StubRegistry:
    """In-memory Confluent registry: schemas by id, subjects register
    with dedup, request log for cache assertions."""

    def __init__(self):
        self.schemas: dict[int, dict] = {}
        self.next_id = 100
        self.subjects: dict[str, list[int]] = {}
        self.requests: list[str] = []
        self.require_auth: str | None = None

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # noqa: A003
                pass

            def _reply(self, obj, status=200):
                payload = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _authed(self) -> bool:
                if stub.require_auth is None:
                    return True
                expect = "Basic " + base64.b64encode(
                    stub.require_auth.encode()
                ).decode("ascii")
                return self.headers.get("Authorization") == expect

            def do_GET(self):  # noqa: N802
                stub.requests.append(f"GET {self.path}")
                if not self._authed():
                    return self._reply({"message": "unauthorized"}, 401)
                m = re.match(r"^/schemas/ids/(\d+)$", self.path)
                if m:
                    sid = int(m.group(1))
                    if sid not in stub.schemas:
                        return self._reply(
                            {"error_code": 40403, "message": "Schema not found"},
                            404,
                        )
                    return self._reply({"schema": json.dumps(stub.schemas[sid])})
                m = re.match(r"^/subjects/([^/]+)/versions/latest$", self.path)
                if m and stub.subjects.get(m.group(1)):
                    sid = stub.subjects[m.group(1)][-1]
                    return self._reply(
                        {
                            "subject": m.group(1),
                            "version": len(stub.subjects[m.group(1)]),
                            "id": sid,
                            "schema": json.dumps(stub.schemas[sid]),
                        }
                    )
                self._reply({"error_code": 40401, "message": "Subject not found"}, 404)

            def do_POST(self):  # noqa: N802
                stub.requests.append(f"POST {self.path}")
                if not self._authed():
                    return self._reply({"message": "unauthorized"}, 401)
                m = re.match(r"^/subjects/([^/]+)/versions$", self.path)
                if not m:
                    return self._reply({"message": "bad route"}, 404)
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                schema = json.loads(body["schema"])
                for sid, known in stub.schemas.items():  # registry dedup
                    if known == schema:
                        return self._reply({"id": sid})
                sid = stub.next_id
                stub.next_id += 1
                stub.schemas[sid] = schema
                stub.subjects.setdefault(m.group(1), []).append(sid)
                self._reply({"id": sid})

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, kwargs={"poll_interval": 0.05},
            daemon=True,
        )
        self.thread.start()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.httpd.server_address[1]}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def registry():
    stub = _StubRegistry()
    yield stub
    stub.close()


SCHEMA_V1 = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
    ],
}
# evolved writer: reordered fields + a new one the reader drops
SCHEMA_V2 = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "name", "type": ["null", "string"]},
        {"name": "extra", "type": "long"},
        {"name": "id", "type": "long"},
    ],
}


class TestClient:
    def test_get_by_id_and_cache(self, registry):
        registry.schemas[7] = SCHEMA_V1
        c = SchemaRegistryClient(registry.url)
        assert c.get_schema_by_id(7)["fields"][0]["name"] == "id"
        c.get_schema_by_id(7)
        assert registry.requests.count("GET /schemas/ids/7") == 1  # cached

    def test_unknown_id_is_typed_error(self, registry):
        c = SchemaRegistryClient(registry.url)
        with pytest.raises(SchemaRegistryError, match="Schema not found"):
            c.get_schema_by_id(999)

    def test_register_dedups_and_latest(self, registry):
        c = SchemaRegistryClient(registry.url)
        sid = c.register("t-value", SCHEMA_V1)
        assert c.register("t-value", SCHEMA_V1) == sid  # identical → same id
        got_id, got_schema = c.get_latest("t-value")
        assert got_id == sid and got_schema == SCHEMA_V1

    def test_basic_auth_header(self, registry):
        registry.require_auth = "alice:s3cret"
        registry.schemas[5] = SCHEMA_V1
        with pytest.raises(SchemaRegistryError):
            SchemaRegistryClient(registry.url).get_schema_by_id(5)
        ok = SchemaRegistryClient(registry.url, user_info="alice:s3cret")
        assert ok.get_schema_by_id(5) == SCHEMA_V1

    def test_option_extraction(self):
        assert registry_options({}) is None
        opts = {
            "avro-confluent.url": "http://r:8081/",
            "avro-confluent.basic-auth.credentials-source": "USER_INFO",
            "avro-confluent.basic-auth.user-info": "u:p",
        }
        assert registry_options(opts) == {
            "url": "http://r:8081/", "user_info": "u:p",
        }
        assert subject_for({"topic": "clicks"}) == "clicks-value"
        assert subject_for({"avro-confluent.subject": "s1"}) == "s1"


def _kafka_frame_binary(spark, payloads):
    cols = (
        "key binary, value binary, topic string, partition int, offset bigint, "
        "timestamp timestamp, timestampType int"
    )
    rows = [
        (None, bytearray(p), "t", 0, i, dt.datetime(2024, 1, 1, 0, 0, i), 0)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, cols)


def _confluent_table(url: str, extra: str = ""):
    return parse_create_table(
        f"""
        CREATE TABLE k (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector'='kafka', 'topic'='t', 'format'='avro-confluent',
              'avro-confluent.url'='{url}'{extra});
        """
    )


class TestDecodeWithRegistry:
    def test_writer_schema_resolved_per_id(self, spark, registry):
        """Two producers, two schema versions on one topic — each
        frame decodes with ITS writer schema (Flink's deserialization
        contract), projected onto the declared columns."""
        registry.schemas[1] = SCHEMA_V1
        registry.schemas[2] = SCHEMA_V2
        payloads = [
            ac.confluent_frame(
                ac.encode_record({"id": 1, "name": "v1"}, SCHEMA_V1), 1
            ),
            ac.confluent_frame(
                ac.encode_record(
                    {"name": "v2", "extra": 9, "id": 2}, SCHEMA_V2
                ),
                2,
            ),
        ]
        raw = _kafka_frame_binary(spark, payloads)
        out = _decode_payload(raw, _confluent_table(registry.url)).collect()
        assert [(r.id, r.name) for r in out] == [(1, "v1"), (2, "v2")]

    def test_unreachable_registry_uncached_id_is_hard_error(self, spark):
        """Registry unreachable + writer id not in the worker cache →
        hard error, matching Flink's avro-confluent deserializer: a
        silent reader-schema decode of an evolved writer's frames
        yields misaligned values (ADVICE r10). The error names the
        opt-in option."""
        t = _confluent_table("http://127.0.0.1:9")  # closed port
        declared = ac.avro_schema_for_columns(t.columns)
        payloads = [
            ac.confluent_frame(
                ac.encode_record({"id": 3, "name": "x"}, declared), 42
            )
        ]
        raw = _kafka_frame_binary(spark, payloads)
        with pytest.raises(Exception, match="reader-schema-fallback"):
            _decode_payload(raw, t).collect()

    def test_unreachable_registry_fallback_is_opt_in(self, spark):
        """'avro-confluent.reader-schema-fallback'='true' restores the
        lossy degrade-to-declared-schema behavior during outages."""
        t = _confluent_table(
            "http://127.0.0.1:9",
            ", 'avro-confluent.reader-schema-fallback'='true'",
        )
        declared = ac.avro_schema_for_columns(t.columns)
        payloads = [
            ac.confluent_frame(
                ac.encode_record({"id": 3, "name": "x"}, declared), 42
            )
        ]
        raw = _kafka_frame_binary(spark, payloads)
        out = _decode_payload(raw, t).collect()
        assert [(r.id, r.name) for r in out] == [(3, "x")]


class TestSinkNegotiation:
    def test_sink_registers_and_frames_with_returned_id(self, spark, registry):
        t = _confluent_table(registry.url)
        df = spark.createDataFrame([(1, "a")], "id bigint, name string")
        row = kafka_writer_payload(df, t).collect()[0]
        sid, body = ac.confluent_unframe(bytes(row.value))
        assert sid == 100  # the stub's first assigned id
        assert registry.subjects["t-value"] == [100]
        rec = ac.decode_record(body, registry.schemas[100])
        assert rec["id"] == 1 and rec["name"] == "a"

    def test_explicit_schema_id_skips_registry(self, spark, registry):
        t = _confluent_table(registry.url, ", 'avro-confluent.schema-id'='55'")
        df = spark.createDataFrame([(1, "a")], "id bigint, name string")
        row = kafka_writer_payload(df, t).collect()[0]
        sid, _ = ac.confluent_unframe(bytes(row.value))
        assert sid == 55 and registry.requests == []

    def test_no_url_no_id_is_typed_rejection(self, spark):
        t = parse_create_table(
            "CREATE TABLE k (id BIGINT, name STRING) WITH ("
            "'connector'='kafka', 'topic'='t', 'format'='avro-confluent');"
        )
        df = spark.createDataFrame([(1, "a")], "id bigint, name string")
        with pytest.raises(NotImplementedError, match="avro-confluent.url"):
            kafka_writer_payload(df, t).collect()


def test_dead_registry_negative_cache_expires(registry):
    """A transient outage must not poison the worker forever: the
    negative cache carries a TTL, after which the registry is
    consulted again (review r10)."""
    import time

    from flink_sql_toolkit_spark.sources import avro_codec as codec

    registry.schemas[9] = SCHEMA_V1
    mapper_schema = ac.avro_schema_for_columns(
        parse_create_table(
            "CREATE TABLE k (id BIGINT, name STRING) WITH ("
            "'connector'='kafka','topic'='t','format'='avro-confluent');"
        ).columns
    )
    import pandas as pd

    frame = ac.confluent_frame(ac.encode_record({"id": 1, "name": "z"}, SCHEMA_V1), 9)
    pdf = pd.DataFrame({"value": [frame]})
    m = codec.avro_decode_mapper(
        mapper_schema, ["id", "name"], True,
        # fallback opted in: this test pins the negative-cache TTL, not
        # the (separately pinned) hard-error default
        {"url": registry.url, "reader_schema_fallback": "true"},
    )
    # simulate a recent outage: fresh entry → declared-schema fallback,
    # no HTTP traffic
    codec._DEAD_REGISTRY[registry.url] = time.monotonic()
    list(m(iter([pdf])))
    assert registry.requests == []
    # expire the entry past the TTL → the registry is consulted again
    codec._DEAD_REGISTRY[registry.url] = time.monotonic() - codec._DEAD_TTL_S - 1
    out = list(m(iter([pdf])))[0]
    assert registry.requests == ["GET /schemas/ids/9"]
    assert registry.url not in codec._DEAD_REGISTRY
    assert list(out["id"]) == [1] and list(out["name"]) == ["z"]


def test_answered_but_unparsable_schema_is_hard_error(spark, registry):
    """A registry that ANSWERS with a schema the codec cannot parse
    must hard-error, not silently decode with the declared schema
    (review r10 pass 3: only transport failures degrade)."""
    registry.schemas[33] = {"type": "no-such-avro-type"}
    payloads = [
        ac.confluent_frame(ac.encode_record({"id": 1, "name": "x"}, SCHEMA_V1), 33)
    ]
    raw = _kafka_frame_binary(spark, payloads)
    t = _confluent_table(registry.url)
    with pytest.raises(Exception, match="no-such-avro-type|avro|schema"):
        _decode_payload(raw, t).collect()
