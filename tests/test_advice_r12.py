"""Round-12 regression tests: the ADVICE r11 findings.

1. (low) upsert_batch_view ordered per-key history by Kafka offset
   alone — offsets are only comparable within one topic partition, so
   an unkeyed external producer could pick the wrong 'latest' or apply
   a stale tombstone. Now orders by (timestamp, partition, offset).
2. (low) unqualified DROP TABLE/VIEW on a persistent object of the
   wrong kind rewrote Spark's own kind-mismatch error to a misleading
   LookupError("not found"). Now only genuine not-found maps.
3. (low) the DROP TABLE view-kind check paid an O(catalog)
   listTables() per drop — now a targeted getTable lookup (behavioral
   coverage here; the listTables call is gone from the source).
4. (low) a key whose newest record had a malformed kafka key while an
   OLDER record was a tombstone got anti-joined away — tombstone
   resolution is positional now (delete only when the tombstone
   post-dates the live record): malformed keys fail open.
5. (low) key.format != json on kafka/upsert-kafka surfaced only at
   write time — CREATE TABLE now warns, and the write-time error
   mentions the plain-kafka case.
"""

from __future__ import annotations

import datetime as dt
import logging

import pytest

from flink_sql_toolkit_spark.engine import Engine

KAFKA_COLS = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def sess(engine):
    s = engine.open_session("advice-r12")
    s.execute_statement("SET 'execution.runtime-mode' = 'batch'")
    yield s
    engine.close_session(s.handle)


def _table(fmt_extra: str = ""):
    from flink_sql_toolkit_spark.sources.ddl import parse_create_table

    return parse_create_table(
        "CREATE TABLE u (id BIGINT, name STRING, PRIMARY KEY (id) NOT "
        "ENFORCED) WITH ('connector'='upsert-kafka', 'topic'='t', "
        f"'properties.bootstrap.servers'='x:9092', 'value.format'='json'"
        f"{fmt_extra});"
    )


def _frame(spark, records):
    """records: (key_json|None, value_json|None, partition, offset,
    ts_second) — explicit positions, unlike the keyed-frame helper in
    test_connectors which auto-increments offset in one partition."""
    rows = [
        (
            bytearray(k.encode()) if k is not None else None,
            bytearray(v.encode()) if v is not None else None,
            "t",
            part,
            off,
            dt.datetime(2024, 1, 1, 0, 0, sec),
            0,
        )
        for (k, v, part, off, sec) in records
    ]
    return spark.createDataFrame(rows, KAFKA_COLS)


class TestUpsertCrossPartitionOrdering:
    def test_timestamp_beats_offset_across_partitions(self, spark):
        """An unkeyed producer spreads id=1 across partitions: the
        record with the NEWER broker timestamp must win even though
        its offset is numerically smaller (offset 3 in partition 0 vs
        offset 1 in partition 1)."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 1}', '{"id": 1, "name": "old"}', 0, 3, 1),
                ('{"id": 1}', '{"id": 1, "name": "new"}', 1, 1, 5),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert {(r.id, r.name) for r in out.collect()} == {(1, "new")}

    def test_stale_cross_partition_tombstone_not_applied(self, spark):
        """A tombstone in partition 0 with a high offset but an OLD
        timestamp must not delete the re-insert that happened later in
        partition 1 (the r11 code compared offsets: 9 > 1 ⇒ wrongly
        dead)."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 7}', None, 0, 9, 2),  # old tombstone
                ('{"id": 7}', '{"id": 7, "name": "alive"}', 1, 1, 8),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert {(r.id, r.name) for r in out.collect()} == {(7, "alive")}

    def test_single_partition_offset_still_authoritative(self, spark):
        """Keyed-producer common case: equal timestamps in one
        partition fall back to the offset tiebreak."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 2}', '{"id": 2, "name": "a"}', 0, 1, 3),
                ('{"id": 2}', '{"id": 2, "name": "b"}', 0, 2, 3),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert {(r.id, r.name) for r in out.collect()} == {(2, "b")}


class TestUpsertMalformedKeyFailsOpen:
    def test_newer_live_row_with_malformed_key_survives_old_tombstone(
        self, spark
    ):
        """The live record's kafka key is garbage so it cannot join
        tombstone history — but it POST-DATES the tombstone, so it
        must survive (r11 anti-joined it away on key equality)."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 3}', '{"id": 3, "name": "v1"}', 0, 0, 0),
                ('{"id": 3}', None, 0, 1, 1),  # tombstone
                ("garbage", '{"id": 3, "name": "v2"}', 0, 2, 2),  # newer
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert {(r.id, r.name) for r in out.collect()} == {(3, "v2")}

    def test_tombstone_newest_still_deletes(self, spark):
        """Positional semantics keep the basic contract: latest record
        is the tombstone ⇒ the key leaves the view."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ("junk", '{"id": 4, "name": "v1"}', 0, 0, 0),
                ('{"id": 4}', None, 0, 1, 1),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert out.count() == 0


class TestDropKindMismatchSurfacesRealError:
    def test_drop_table_on_persistent_view_not_rewritten_to_not_found(
        self, sess
    ):
        """DROP TABLE on a GLOBAL (non-temp) view: Spark raises its own
        kind-mismatch; the engine must surface that, not 'not found'."""
        sess.spark.sql("DROP VIEW IF EXISTS adv12_pv")
        sess.spark.sql(
            "CREATE VIEW adv12_pv AS SELECT 1 AS x"
        )
        try:
            with pytest.raises(Exception) as ei:
                sess.execute_statement("DROP TABLE adv12_pv")
            assert not isinstance(ei.value, LookupError)
            assert "not found" not in str(ei.value).lower()
        finally:
            sess.spark.sql("DROP VIEW IF EXISTS adv12_pv")

    def test_drop_missing_table_still_lookup_error(self, sess):
        with pytest.raises(LookupError):
            sess.execute_statement("DROP TABLE adv12_nope")

    def test_temp_view_kind_check_survives(self, sess):
        """The targeted getTable lookup keeps the r11 behavior: DROP
        TABLE on a temp view is a kind error."""
        sess.execute_statement("CREATE VIEW adv12_tv AS SELECT 1 AS x")
        try:
            with pytest.raises(ValueError, match="is a view"):
                sess.execute_statement("DROP TABLE adv12_tv")
        finally:
            sess.execute_statement("DROP VIEW adv12_tv")


class TestKeyFormatSurfacesAtDDL:
    def test_create_table_warns_on_non_json_key(self, sess, caplog):
        with caplog.at_level(logging.WARNING, "flink_sql_toolkit_spark.engine"):
            sess.execute_statement(
                "CREATE TABLE adv12_k (id BIGINT, PRIMARY KEY (id) NOT "
                "ENFORCED) WITH ('connector'='upsert-kafka', 'topic'='k', "
                "'properties.bootstrap.servers'='x:9092', "
                "'key.format'='raw', 'value.format'='json')"
            )
        try:
            assert any(
                "key.format" in r.getMessage() and "adv12_k" in r.getMessage()
                for r in caplog.records
            )
        finally:
            sess.execute_statement("DROP TABLE adv12_k")

    def test_write_error_mentions_plain_kafka(self, spark):
        from flink_sql_toolkit_spark.sources.connectors import (
            kafka_writer_payload,
        )
        from flink_sql_toolkit_spark.sources.ddl import parse_create_table

        t = parse_create_table(
            "CREATE TABLE pk (id BIGINT) WITH ('connector'='kafka', "
            "'topic'='t', 'properties.bootstrap.servers'='x:9092', "
            "'format'='json', 'key.format'='raw');"
        )
        df = spark.range(1).withColumnRenamed("id", "id")
        with pytest.raises(NotImplementedError, match="plain kafka"):
            kafka_writer_payload(df, t)
