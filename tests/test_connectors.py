"""Connector/format decode tests — kafka envelope decoding and the
upsert view are pure DataFrame transforms, testable without a broker
by constructing the kafka source's column shape."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.sources.connectors import _decode_payload, build_reader
from flink_sql_toolkit_spark.sources.ddl import parse_create_table

KAFKA_COLS = "key binary, value binary, topic string, partition int, offset bigint, timestamp timestamp, timestampType int"


def kafka_frame(spark, payloads: list[str]):
    rows = [
        (
            None,
            bytearray(p.encode()),
            "t",
            0,
            i,
            dt.datetime(2024, 1, 1, 0, 0, i),
            0,
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, KAFKA_COLS)


def table_for(fmt: str, extra: str = ""):
    return parse_create_table(
        f"""
        CREATE TABLE k (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector'='kafka', 'topic'='t', 'format'='{fmt}'{extra});
        """
    )


def test_json_decode(spark):
    raw = kafka_frame(spark, ['{"id": 1, "name": "a"}', '{"id": 2, "name": "b"}'])
    out = _decode_payload(raw, table_for("json")).collect()
    assert [(r.id, r.name) for r in out] == [(1, "a"), (2, "b")]
    assert out[0].offset == 0  # metadata columns preserved


def test_csv_decode(spark):
    raw = kafka_frame(spark, ["1,a", "2,b"])
    out = _decode_payload(raw, table_for("csv")).collect()
    assert [(r.id, r.name) for r in out] == [(1, "a"), (2, "b")]


def test_raw_decode(spark):
    raw = kafka_frame(spark, ["payload-a"])
    t = parse_create_table(
        "CREATE TABLE k (body STRING) WITH ('connector'='kafka', 'topic'='t', 'format'='raw');"
    )
    assert _decode_payload(raw, t).first().body == "payload-a"


def test_debezium_envelope_decode(spark):
    env = {
        "before": None,
        "after": {"id": 7, "name": "new"},
        "op": "c",
    }
    raw = kafka_frame(spark, [json.dumps(env)])
    out = _decode_payload(raw, table_for("debezium-json")).collect()
    assert out[0].id == 7 and out[0].name == "new" and out[0]._op == "c"


def test_canal_envelope_decode(spark):
    env = {"data": [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}], "type": "INSERT"}
    raw = kafka_frame(spark, [json.dumps(env)])
    out = _decode_payload(raw, table_for("canal-json")).collect()
    assert [(r.id, r.name, r._op) for r in out] == [(1, "x", "INSERT"), (2, "y", "INSERT")]


def test_upsert_latest_per_key(spark):
    """upsert-kafka batch view: latest record per PK by offset."""
    from pyspark.sql import Window as W

    raw = kafka_frame(
        spark,
        ['{"id": 1, "name": "v1"}', '{"id": 1, "name": "v2"}', '{"id": 2, "name": "x"}'],
    )
    t = table_for("json")
    decoded = _decode_payload(raw, t)
    w = W.partitionBy("id").orderBy(F.desc("offset"))
    latest = (
        decoded.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    assert {(r.id, r.name) for r in latest.collect()} == {(1, "v2"), (2, "x")}


def test_values_connector(spark):
    t = parse_create_table(
        """CREATE TABLE v (a BIGINT, b STRING) WITH ('connector'='values',
           'data'='[[1, "x"], [2, "y"]]');"""
    )
    out = build_reader(spark, t).collect()
    assert [(r.a, r.b) for r in out] == [(1, "x"), (2, "y")]


def test_filesystem_csv_roundtrip(spark, tmp_path):
    src = parse_create_table(
        f"""CREATE TABLE c_out (a BIGINT, b STRING)
            WITH ('connector'='filesystem', 'path'='{tmp_path}/csvs', 'format'='csv');"""
    )
    from flink_sql_toolkit_spark.sources.connectors import build_writer

    df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
    build_writer(df, src, query_name="t", checkpoint=str(tmp_path / "ckpt"))
    back = build_reader(spark, src, streaming=False).collect()
    assert sorted((r.a, r.b) for r in back) == [(1, "x"), (2, "y")]


def test_unknown_connector_message(spark):
    t = parse_create_table(
        "CREATE TABLE h (a INT) WITH ('connector'='hbase-2.2', 'table-name'='x');"
    )
    with pytest.raises(ValueError, match="not bundled"):
        build_reader(spark, t)


def test_ogg_envelope_decode(spark):
    """GoldenGate JSON: before/after images, op_type I/U/D, op_ts
    wall-clock string -> _ts_ms millis; deletes carry the before
    image (same contract as debezium)."""
    events = [
        {"before": None, "after": {"id": 1, "name": "a"}, "op_type": "I",
         "op_ts": "2020-05-13 15:40:06.000000"},
        {"before": {"id": 1, "name": "a"}, "after": {"id": 1, "name": "a2"},
         "op_type": "U", "op_ts": "2020-05-13 15:40:07.500000"},
        {"before": {"id": 1, "name": "a2"}, "after": None, "op_type": "D",
         "op_ts": "2020-05-13 15:40:08.000000"},
    ]
    raw = kafka_frame(spark, [json.dumps(e) for e in events])
    out = _decode_payload(raw, table_for("ogg-json")).orderBy("_ts_ms").collect()
    assert [(r.id, r.name, r._op) for r in out] == [
        (1, "a", "I"), (1, "a2", "U"), (1, "a2", "D")
    ]
    assert out[1]._ts_ms - out[0]._ts_ms == 1500


def test_filesystem_orc_roundtrip(spark, tmp_path):
    """ORC is a Spark builtin columnar format — the filesystem
    connector passes it straight through to the reader/writer
    (reference format vocabulary: syntaxes/flink.tmLanguage.json:518)."""
    path = str(tmp_path / "orc_tbl")
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    t = parse_create_table(
        f"""
        CREATE TABLE o (id BIGINT, name STRING)
        WITH ('connector'='filesystem', 'path'='{path}', 'format'='orc');
        """
    )
    from flink_sql_toolkit_spark.sources.connectors import build_writer

    build_writer(src, t, query_name="w", checkpoint=str(tmp_path / "ck"))
    out = build_reader(spark, t, streaming=False).orderBy("id").collect()
    assert [(r.id, r.name) for r in out] == [(1, "a"), (2, "b")]


def test_protobuf_without_module_is_typed_rejection(spark, tmp_path):
    desc = tmp_path / "schema.desc"
    desc.write_bytes(b"")
    t = table_for(
        "protobuf",
        f", 'protobuf.message-class-name'='M', 'protobuf.descriptor-file'='{desc}'",
    )
    raw = kafka_frame(spark, ["x"])
    with pytest.raises(NotImplementedError, match="spark-protobuf"):
        _decode_payload(raw, t)


def test_protobuf_missing_descriptor_is_file_error(spark):
    t = table_for(
        "protobuf",
        ", 'protobuf.message-class-name'='M', 'protobuf.descriptor-file'='/nonexistent.desc'",
    )
    raw = kafka_frame(spark, ["x"])
    with pytest.raises(FileNotFoundError):
        _decode_payload(raw, t)


def test_jdbc_derby_roundtrip(spark, tmp_path):
    """Real JDBC E2E with zero external deps: Derby's embedded driver
    ships on Spark's classpath, so jdbc:derby:memory gives a live
    write → read round-trip (reference surface:
    test/syntax-test.fsql:639-651)."""
    from flink_sql_toolkit_spark.sources.connectors import build_writer

    t = parse_create_table(
        """CREATE TABLE j (a BIGINT, b STRING)
           WITH ('connector'='jdbc',
                 'url'='jdbc:derby:memory:conn_rt;create=true',
                 'table-name'='jtab',
                 'driver'='org.apache.derby.jdbc.EmbeddedDriver');"""
    )
    df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
    build_writer(df, t, query_name="j", checkpoint=str(tmp_path / "ckpt"))
    back = build_reader(spark, t, streaming=False).collect()
    assert sorted((r.a, r.b) for r in back) == [(1, "x"), (2, "y")]
    # append semantics: a second write adds rows
    build_writer(df, t, query_name="j", checkpoint=str(tmp_path / "ckpt2"))
    assert build_reader(spark, t, streaming=False).count() == 4


# -- kafka option-translation contract (VERDICT r5 ask #6) ------------
# No broker in the sandbox; the reader construction is a pure
# dict translation, pinned here against golden Spark option dicts for
# every reference startup/bounded mode (tmLanguage.json:509,523).


def _kafka_table(with_extra: str):
    return parse_create_table(
        f"""
        CREATE TABLE k (id BIGINT, name STRING)
        WITH ('connector'='kafka', 'topic'='t',
              'properties.bootstrap.servers'='b1:9092,b2:9092',
              'format'='json'{with_extra});
        """
    )


def test_kafka_options_startup_modes():
    from flink_sql_toolkit_spark.sources.connectors import kafka_reader_options

    base = {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "t",
    }
    cases = {
        "": {**base, "startingOffsets": "latest"},  # default = group-offsets
        ", 'scan.startup.mode'='earliest-offset'": {
            **base, "startingOffsets": "earliest"
        },
        ", 'scan.startup.mode'='latest-offset'": {
            **base, "startingOffsets": "latest"
        },
        ", 'scan.startup.mode'='group-offsets'": {
            **base, "startingOffsets": "latest"  # documented approximation
        },
        ", 'scan.startup.mode'='timestamp', 'scan.startup.timestamp-millis'='1700000000000'": {
            **base, "startingTimestamp": "1700000000000"
        },
        ", 'scan.startup.mode'='specific-offsets', 'scan.startup.specific-offsets'='partition:0,offset:42;partition:1,offset:300'": {
            **base, "startingOffsets": '{"t": {"0": 42, "1": 300}}'
        },
    }
    for extra, want in cases.items():
        assert kafka_reader_options(_kafka_table(extra)) == want, extra


def test_kafka_options_bounded_and_properties():
    from flink_sql_toolkit_spark.sources.connectors import kafka_reader_options

    got = kafka_reader_options(
        _kafka_table(
            ", 'properties.group.id'='cg1', 'scan.bounded.mode'='timestamp',"
            " 'scan.bounded.timestamp-millis'='1800000000000'"
        )
    )
    assert got["kafka.group.id"] == "cg1"  # properties.* pass through
    assert got["endingTimestamp"] == "1800000000000"
    got = kafka_reader_options(
        _kafka_table(", 'scan.bounded.mode'='latest-offset'")
    )
    assert got["endingOffsets"] == "latest"
    got = kafka_reader_options(
        _kafka_table(
            ", 'scan.bounded.mode'='specific-offsets',"
            " 'scan.bounded.specific-offsets'='partition:0,offset:9'"
        )
    )
    assert got["endingOffsets"] == '{"t": {"0": 9}}'
    with pytest.raises(NotImplementedError, match="group-offsets"):
        kafka_reader_options(_kafka_table(", 'scan.bounded.mode'='group-offsets'"))
    with pytest.raises(ValueError, match="scan.bounded.mode"):
        kafka_reader_options(_kafka_table(", 'scan.bounded.mode'='nope'"))


def test_kafka_options_topic_list_and_pattern():
    from flink_sql_toolkit_spark.sources.connectors import kafka_reader_options

    t = parse_create_table(
        """
        CREATE TABLE k (id BIGINT) WITH ('connector'='kafka',
        'topic'='a;b;c', 'format'='json');
        """
    )
    assert kafka_reader_options(t)["subscribe"] == "a,b,c"
    t = parse_create_table(
        """
        CREATE TABLE k (id BIGINT) WITH ('connector'='kafka',
        'topic-pattern'='events-.*', 'format'='json');
        """
    )
    got = kafka_reader_options(t)
    assert got["subscribePattern"] == "events-.*"
    assert "subscribe" not in got


def test_kafka_specific_offsets_malformed():
    from flink_sql_toolkit_spark.sources.connectors import kafka_reader_options

    with pytest.raises(ValueError, match="specific-offsets"):
        kafka_reader_options(
            _kafka_table(
                ", 'scan.startup.mode'='specific-offsets',"
                " 'scan.startup.specific-offsets'='offset:42'"
            )
        )


def test_kafka_topic_pattern_specific_offsets_rejected():
    """specific-offsets names partitions of a concrete topic; combined
    with topic-pattern Flink rejects up front — so does the engine
    (review r6: previously built startingOffsets keyed by '')."""
    from flink_sql_toolkit_spark.sources.connectors import kafka_reader_options

    t = parse_create_table(
        """
        CREATE TABLE k (id BIGINT) WITH (
          'connector'='kafka', 'topic-pattern'='orders.*',
          'scan.startup.mode'='specific-offsets',
          'scan.startup.specific-offsets'='partition:0,offset:42',
          'format'='json');
        """
    )
    with pytest.raises(ValueError, match="topic-pattern"):
        kafka_reader_options(t)


def test_insert_select_duplicate_columns(spark, tmp_path):
    """Positional INSERT alignment must tolerate duplicate column
    names in the query output (review r6: name-based lookup raised
    AMBIGUOUS_REFERENCE)."""
    from flink_sql_toolkit_spark.engine import Engine

    engine = Engine(spark)
    sess = engine.open_session("dup-cols")
    try:
        sess.execute_statement("SET 'execution.runtime-mode'='batch'")
        sess.execute_statement(
            f"""CREATE TABLE dup_sink (a BIGINT, b BIGINT)
            WITH ('connector'='filesystem', 'path'='{tmp_path}/dup',
                  'format'='parquet')"""
        )
        sess.execute_statement(
            "INSERT INTO dup_sink SELECT x, x FROM (SELECT 7 AS x)"
        )
        page = sess.execute_statement("SELECT a, b FROM dup_sink").fetch()
        assert page["data"] == [[7, 7]]
    finally:
        sess.close()


def test_kafka_writer_options_contract():
    """Sink option translation (mirror of the reader contract): one
    concrete topic required, properties.* → kafka.*, delivery
    guarantees mapped or typed-rejected."""
    from flink_sql_toolkit_spark.sources.connectors import kafka_writer_options

    t = _kafka_table("")
    assert kafka_writer_options(t) == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "topic": "t",
    }
    # topic list and pattern are read-side shapes; sinks need ONE topic
    t2 = parse_create_table(
        """CREATE TABLE k (id BIGINT) WITH ('connector'='kafka',
        'topic'='a;b', 'format'='json');"""
    )
    with pytest.raises(ValueError, match="exactly one"):
        kafka_writer_options(t2)
    t3 = parse_create_table(
        """CREATE TABLE k (id BIGINT) WITH ('connector'='kafka',
        'topic-pattern'='a.*', 'format'='json');"""
    )
    with pytest.raises(ValueError, match="exactly one"):
        kafka_writer_options(t3)
    t4 = _kafka_table(", 'sink.delivery-guarantee'='exactly-once'")
    with pytest.raises(NotImplementedError, match="exactly-once"):
        kafka_writer_options(t4)
    t5 = _kafka_table(", 'sink.delivery-guarantee'='at-least-once'")
    assert kafka_writer_options(t5)["topic"] == "t"


def test_kafka_writer_payload_formats(spark):
    """Sink value encoding follows the declared format: json struct,
    csv with the table's delimiter, raw single column; avro write is a
    typed rejection (decode is the read-side path)."""
    from flink_sql_toolkit_spark.sources.connectors import kafka_writer_payload

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    j = kafka_writer_payload(df, _kafka_table("")).collect()[0]
    assert j.value == '{"id":1,"name":"a"}' and j.key == '{"id":1}'

    t_csv = parse_create_table(
        """CREATE TABLE k (id BIGINT, name STRING) WITH (
        'connector'='kafka', 'topic'='t', 'format'='csv',
        'csv.field-delimiter'='|');"""
    )
    c = kafka_writer_payload(df, t_csv).collect()[0]
    assert c.value == "1|a"
    # NULL fields keep their slot (concat_ws would shift columns left)
    df_null = spark.createDataFrame([(2, None)], "id long, name string")
    c2 = kafka_writer_payload(df_null, t_csv).collect()[0]
    assert c2.value == "2|"

    t_raw = parse_create_table(
        """CREATE TABLE k (name STRING) WITH ('connector'='kafka',
        'topic'='t', 'format'='raw');"""
    )
    r = kafka_writer_payload(df.select("name"), t_raw).collect()[0]
    assert r.value == "a"

    # avro sink encodes through the pure-Python codec (see
    # test_avro.py::test_avro_sink_payload_roundtrip); an unknown
    # format stays a typed rejection
    t_bad = parse_create_table(
        """CREATE TABLE k (id BIGINT, name STRING) WITH (
        'connector'='kafka', 'topic'='t', 'format'='protobuf');"""
    )
    with pytest.raises(NotImplementedError, match="protobuf"):
        kafka_writer_payload(df, t_bad)


def test_csv_reader_options_contract():
    """Flink csv.* options → Spark csv reader options."""
    from flink_sql_toolkit_spark.sources.connectors import csv_reader_options

    assert csv_reader_options({}) == {"sep": ",", "mode": "FAILFAST"}
    got = csv_reader_options(
        {
            "csv.field-delimiter": ";",
            "csv.quote-character": "'",
            "csv.escape-character": "\\",
            "csv.null-literal": "NULL",
            "csv.ignore-parse-errors": "true",
            "csv.allow-comments": "true",
        }
    )
    assert got == {
        "sep": ";",
        "mode": "PERMISSIVE",
        "quote": "'",
        "escape": "\\",
        "nullValue": "NULL",
        "comment": "#",
    }


def test_csv_filesystem_null_literal_and_quotes(spark, tmp_path):
    """csv options flow through the filesystem reader: null-literal
    rows decode to NULL, quoted fields keep the delimiter."""
    from flink_sql_toolkit_spark.sources.connectors import build_reader

    (tmp_path / "c.csv").write_text('1,"x;y",NULL\n2,b,ok\n')
    t = parse_create_table(
        f"""CREATE TABLE c (id BIGINT, s STRING, v STRING) WITH (
        'connector'='filesystem', 'path'='{tmp_path}/c.csv',
        'format'='csv', 'csv.null-literal'='NULL');"""
    )
    rows = sorted(
        (r.id, r.s, r.v) for r in build_reader(spark, t, streaming=False).collect()
    )
    assert rows == [(1, "x;y", None), (2, "b", "ok")]


def _kafka_keyed_frame(spark, records: list[tuple[str | None, str | None]]):
    """(key_json, value_json_or_None) pairs — None value = tombstone."""
    rows = [
        (
            bytearray(k.encode()) if k is not None else None,
            bytearray(v.encode()) if v is not None else None,
            "t",
            0,
            i,
            dt.datetime(2024, 1, 1, 0, 0, i),
            0,
        )
        for i, (k, v) in enumerate(records)
    ]
    return spark.createDataFrame(rows, KAFKA_COLS)


def test_upsert_tombstone_deletes_key(spark):
    """upsert-kafka batch view honors tombstones (NULL value = DELETE,
    the upsert-kafka contract): a key whose latest record is a
    tombstone leaves the view; a re-insert after a tombstone wins
    again (r11 — tombstones used to be silently ignored, serving the
    deleted key's stale record)."""
    from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

    raw = _kafka_keyed_frame(
        spark,
        [
            ('{"id": 1}', '{"id": 1, "name": "v1"}'),
            ('{"id": 2}', '{"id": 2, "name": "x"}'),
            ('{"id": 1}', None),                       # delete id=1
            ('{"id": 3}', '{"id": 3, "name": "y"}'),
            ('{"id": 3}', None),                       # delete id=3 ...
            ('{"id": 3}', '{"id": 3, "name": "y2"}'),  # ... then re-insert
        ],
    )
    out = upsert_batch_view(raw, table_for("json"))
    assert {(r.id, r.name) for r in out.collect()} == {(2, "x"), (3, "y2")}


def test_upsert_tombstone_only_key_absent(spark):
    """A key whose ONLY record is a tombstone never appears."""
    from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

    raw = _kafka_keyed_frame(
        spark,
        [('{"id": 9}', None), ('{"id": 5}', '{"id": 5, "name": "ok"}')],
    )
    out = upsert_batch_view(raw, table_for("json"))
    assert {(r.id, r.name) for r in out.collect()} == {(5, "ok")}


def test_raw_decode_bytes_and_typed_rejection(spark):
    """raw format: BYTES column passes the payload through unchanged;
    a numeric raw column (big-endian byte decode in Flink) is a typed
    rejection instead of a silent utf-8 text parse (r11)."""
    raw = kafka_frame(spark, ["payload-a"])
    t_bytes = parse_create_table(
        "CREATE TABLE kb (b BYTES) WITH ('connector'='kafka', "
        "'topic'='t', 'format'='raw');"
    )
    out = _decode_payload(raw, t_bytes).collect()
    assert bytes(out[0].b) == b"payload-a"
    t_num = parse_create_table(
        "CREATE TABLE kn (n BIGINT) WITH ('connector'='kafka', "
        "'topic'='t', 'format'='raw');"
    )
    with pytest.raises(NotImplementedError, match="big-endian"):
        _decode_payload(raw, t_num)


def test_datagen_double_min_max(spark):
    """fields.<col>.min/max bound DOUBLE/FLOAT datagen columns like
    the integer types (Flink datagen contract — r11)."""
    from flink_sql_toolkit_spark.sources.connectors import build_reader

    t = parse_create_table(
        "CREATE TABLE dg (x DOUBLE, y DOUBLE) WITH ("
        "'connector'='datagen', 'number-of-rows'='200', "
        "'fields.x.min'='5', 'fields.x.max'='7');"
    )
    rows = build_reader(spark, t, streaming=False).collect()
    assert len(rows) == 200
    assert all(5.0 <= r.x <= 7.0 for r in rows)
    assert len({round(r.x, 6) for r in rows}) > 50  # actually spread


def test_raw_sink_mirrors_reader_typing(spark):
    """raw sink: BYTES passes through unchanged (no lossy string
    cast), numeric raw columns are the same typed rejection the
    reader gives, and a multi-column raw READ is rejected like the
    sink (it silently dropped the extra columns before) — r11."""
    from flink_sql_toolkit_spark.sources.connectors import kafka_writer_payload

    t_bytes = parse_create_table(
        "CREATE TABLE kb (b BYTES) WITH ('connector'='kafka', "
        "'topic'='t', 'format'='raw');"
    )
    payload = bytes([0x92, 0xFF, 0x00, 0x41])  # not valid utf-8
    df = spark.createDataFrame([(bytearray(payload),)], "b binary")
    out = kafka_writer_payload(df, t_bytes).collect()
    assert bytes(out[0].value) == payload
    t_num = parse_create_table(
        "CREATE TABLE kn (n BIGINT) WITH ('connector'='kafka', "
        "'topic'='t', 'format'='raw');"
    )
    with pytest.raises(NotImplementedError, match="big-endian"):
        kafka_writer_payload(spark.createDataFrame([(1,)], "n bigint"), t_num)
    t_multi = parse_create_table(
        "CREATE TABLE km (a STRING, b BIGINT) WITH ('connector'='kafka', "
        "'topic'='t', 'format'='raw');"
    )
    with pytest.raises(ValueError, match="exactly one physical column"):
        _decode_payload(kafka_frame(spark, ["x"]), t_multi)


def test_upsert_non_json_key_format_skips_tombstones(spark):
    """A declared non-json key.format can't decode tombstone keys —
    the view falls back to plain latest-per-key (warned, not silent
    wrong deletes) instead of collapsing all records into one
    null-key group (r11)."""
    from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

    raw = _kafka_keyed_frame(
        spark,
        [("1", '{"id": 1, "name": "v1"}'), ("1", None), ("2", '{"id": 2, "name": "x"}')],
    )
    t = table_for("json", extra=", 'key.format'='raw'")
    out = upsert_batch_view(raw, t)
    # tombstone unhandled for raw keys: id=1 keeps its last record
    assert {(r.id, r.name) for r in out.collect()} == {(1, "v1"), (2, "x")}


def test_upsert_malformed_json_key_is_not_a_tombstone_group(spark):
    """Malformed/missing JSON keys parse to null-FIELD structs in
    PERMISSIVE mode; they must be excluded from tombstone history
    (not collapsed into one null-key group whose tombstone never
    anti-joins) — r11."""
    from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

    raw = _kafka_keyed_frame(
        spark,
        [
            ("garbage", '{"id": 1, "name": "v1"}'),
            (None, '{"id": 2, "name": "x"}'),
            ('{"id": 2}', None),  # real tombstone for id=2
        ],
    )
    out = upsert_batch_view(raw, table_for("json"))
    assert {(r.id, r.name) for r in out.collect()} == {(1, "v1")}


def test_datagen_single_sided_bound_rejected(spark):
    """A lone fields.<col>.min or .max was silently ignored (values
    violated it) — typed rejection now (r11)."""
    from flink_sql_toolkit_spark.sources.connectors import build_reader

    t = parse_create_table(
        "CREATE TABLE dg1 (x DOUBLE) WITH ('connector'='datagen', "
        "'number-of-rows'='5', 'fields.x.max'='3');"
    )
    with pytest.raises(ValueError, match="only one of"):
        build_reader(spark, t, streaming=False)


def test_kafka_sink_non_json_key_format_rejected():
    """The sink always writes JSON keys of the PK columns; a declared
    non-json key.format would put wrong-encoding keys on the wire (and
    the reader's tombstone gate would skip handling this sink's own
    data) — typed rejection, mirroring the reader's gating (r11)."""
    from flink_sql_toolkit_spark.sources.connectors import kafka_writer_payload

    t = table_for("json", extra=", 'key.format'='raw'")
    with pytest.raises(NotImplementedError, match="key.format"):
        kafka_writer_payload(None, t)


def test_datagen_bounds_on_non_numeric_rejected(spark):
    """fields.<col>.min/max on a STRING column were silently ignored
    (the generated values violated the declared bound) — typed
    rejection now (r11)."""
    from flink_sql_toolkit_spark.sources.connectors import build_reader

    t = parse_create_table(
        "CREATE TABLE dgs (s STRING) WITH ('connector'='datagen', "
        "'number-of-rows'='5', 'fields.s.min'='a', 'fields.s.max'='b');"
    )
    with pytest.raises(ValueError, match="numeric columns only"):
        build_reader(spark, t, streaming=False)
