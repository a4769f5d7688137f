"""Round-13 regression tests: the ADVICE r12 findings.

1. (medium) the group_struct retry treated ANY bare ordinal in a
   GROUP BY as a window reference, so `GROUP BY substr(k,1,3)` /
   `GROUP BY 1` over a non-window item got `, _w` appended — which
   RESOLVES (the struct is in scope) and silently turned an
   update-mode aggregation Flink rejects into a per-window
   aggregation with different results. Ordinals now resolve against
   the SELECT list.
2. (medium) upsert_batch_view ordered per-key history by
   (timestamp, partition, offset) unconditionally — under Kafka's
   default message.timestamp.type=CreateTime, producer timestamps
   can be out of order within one partition, so the keyed
   single-partition common case could pick an older-by-offset
   record or apply a stale tombstone. Single-partition keys now
   order by offset alone; the tombstone-vs-live comparison uses
   offsets when both sit in the same partition.
3. (low) STOP JOB … WITH SAVEPOINT fell back to the session's
   shared checkpoint_root for jobs registered without a checkpoint
   (interactive streaming SELECTs). SELECT jobs now register their
   actual checkpoint; a job with none gets a typed error instead of
   a directory that is no job's state.
4. (low) the DROP not-found classifier matched the bare substring
   "not found" anywhere in the Spark error, remapping unrelated
   failures (function/catalog resolution) to a misleading
   LookupError. Now anchored on TABLE_OR_VIEW_NOT_FOUND / the
   table-or-view phrases only.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest

from flink_sql_toolkit_spark.engine import Engine, _is_table_not_found

KAFKA_COLS = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def sess(engine):
    s = engine.open_session("advice-r13")
    yield s
    engine.close_session(s.handle)


def _table():
    from flink_sql_toolkit_spark.sources.ddl import parse_create_table

    return parse_create_table(
        "CREATE TABLE u (id BIGINT, name STRING, PRIMARY KEY (id) NOT "
        "ENFORCED) WITH ('connector'='upsert-kafka', 'topic'='t', "
        "'properties.bootstrap.servers'='x:9092', 'value.format'='json');"
    )


def _frame(spark, records):
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


class TestUpsertCreateTimeSinglePartition:
    """Kafka's default message.timestamp.type=CreateTime: producer
    timestamps may be OUT OF ORDER within one partition. For a key
    whose history sits in one partition, the offset is the only
    ordering Kafka guarantees."""

    def test_older_timestamp_newer_offset_wins(self, spark):
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 1}', '{"id": 1, "name": "old"}', 0, 1, 9),
                # later append, earlier producer clock — still latest
                ('{"id": 1}', '{"id": 1, "name": "new"}', 0, 2, 3),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert {(r.id, r.name) for r in out.collect()} == {(1, "new")}

    def test_stale_same_partition_tombstone_not_applied(self, spark):
        """A tombstone at a LOWER offset (but a newer producer
        timestamp) must not delete the re-insert appended after it."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 7}', None, 0, 3, 9),  # tombstone, clock skewed ahead
                ('{"id": 7}', '{"id": 7, "name": "alive"}', 0, 5, 2),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert {(r.id, r.name) for r in out.collect()} == {(7, "alive")}

    def test_same_partition_tombstone_newer_offset_deletes(self, spark):
        """The mirror case: the tombstone at the HIGHER offset deletes
        even with an older producer timestamp."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 8}', '{"id": 8, "name": "x"}', 0, 3, 9),
                ('{"id": 8}', None, 0, 5, 2),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert out.filter("id = 8").count() == 0

    def test_cross_partition_still_timestamp_ordered(self, spark):
        """Multi-partition keys keep the r12 (ts, part, off) order —
        offsets from different partitions are not comparable."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 2}', '{"id": 2, "name": "old"}', 0, 9, 1),
                ('{"id": 2}', '{"id": 2, "name": "new"}', 1, 1, 5),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert {(r.id, r.name) for r in out.collect()} == {(2, "new")}


class TestGroupStructOrdinalResolution:
    """_append_struct_to_group_by must only treat a bare GROUP BY
    ordinal as a window reference when that ordinal's SELECT item is
    window_start/window_end/window_time."""

    @staticmethod
    def _rw(sql: str) -> str:
        from flink_sql_toolkit_spark.dialect.rewriter import (
            _append_struct_to_group_by,
        )

        return _append_struct_to_group_by(sql)

    def test_non_window_expression_grouping_unchanged(self):
        sql = (
            "SELECT substr(k,1,3) AS g, count(*) AS c FROM _tvf "
            "GROUP BY substr(k,1,3)"
        )
        assert self._rw(sql) == sql

    def test_ordinal_to_non_window_item_unchanged(self):
        sql = "SELECT substr(k,1,3) AS g, count(*) AS c FROM _tvf GROUP BY 1"
        assert self._rw(sql) == sql

    def test_ordinal_to_window_start_appends(self):
        sql = "SELECT window_start, count(*) AS c FROM _tvf GROUP BY 1"
        assert ", _w" in self._rw(sql)

    def test_second_ordinal_to_window_end_appends(self):
        sql = (
            "SELECT k, window_end AS we, count(*) AS c FROM _tvf "
            "GROUP BY 1, 2"
        )
        assert ", _w" in self._rw(sql)

    def test_named_window_column_still_appends(self):
        sql = (
            "SELECT window_start, k, count(*) AS c FROM _tvf "
            "GROUP BY window_start, k"
        )
        assert ", _w" in self._rw(sql)

    def test_insert_wrapped_select_resolves_ordinal(self):
        sql = (
            "INSERT INTO snk SELECT window_start, sum(v) AS s FROM _tvf "
            "GROUP BY 1"
        )
        assert ", _w" in self._rw(sql)

    def test_subquery_select_list_not_confused(self):
        """The ordinal resolves against the GROUP BY's own query
        block, not a subquery's select list."""
        sql = (
            "SELECT substr(k,1,3) AS g, count(*) AS c FROM "
            "(SELECT window_start, k FROM _tvf) GROUP BY 1"
        )
        assert self._rw(sql) == sql


class TestStopJobSavepoint:
    def test_with_savepoint_on_checkpointless_job_is_typed_error(self, sess):
        class _Q:
            id = "fake-q-1"
            isActive = False

            def exception(self):
                return None

            def stop(self):
                pass

        info = sess.jobs.register(_Q(), "orphan")  # no checkpoint
        with pytest.raises(RuntimeError, match="no resumable savepoint"):
            sess.execute_statement(f"STOP JOB '{info.job_id}' WITH SAVEPOINT")

    def test_plain_stop_on_checkpointless_job_returns_null_path(self, sess):
        class _Q:
            id = "fake-q-2"
            isActive = False

            def exception(self):
                return None

            def stop(self):
                pass

        info = sess.jobs.register(_Q(), "orphan2")
        rows = sess.execute_statement(f"STOP JOB '{info.job_id}'").fetch()["data"]
        assert rows == [[None]]

    def test_streaming_select_job_registers_its_checkpoint(self, sess):
        """Interactive streaming SELECT jobs carry their ACTUAL
        checkpoint, so STOP JOB … WITH SAVEPOINT returns per-job
        state, never the shared checkpoint_root (ADVICE r12)."""
        sess.execute_statement(
            "CREATE TABLE adv13_ticks (v BIGINT) WITH "
            "('connector'='datagen', 'rows-per-second'='50')"
        )
        op = sess.execute_statement("SELECT v FROM adv13_ticks")
        try:
            assert op.job_id is not None
            job = sess.jobs.get(op.job_id)
            assert job is not None and job.checkpoint, (
                "SELECT-path job must register its checkpoint"
            )
            assert job.checkpoint.startswith(sess.checkpoint_root)
            assert job.checkpoint != sess.checkpoint_root
            rows = sess.execute_statement(
                f"STOP JOB '{op.job_id}' WITH SAVEPOINT"
            ).fetch()["data"]
            assert rows == [[job.checkpoint]]
            deadline = time.time() + 10
            while time.time() < deadline and job.status == "RUNNING":
                time.sleep(0.2)
        finally:
            op.cancel()
            sess.execute_statement("DROP TABLE adv13_ticks")


class TestDropNotFoundClassifier:
    def test_function_not_found_message_not_remapped(self):
        assert not _is_table_not_found(
            Exception(
                "[UNRESOLVED_ROUTINE] The function `db`.`fn` cannot be "
                "found. A routine with that name was not found."
            )
        )

    def test_generic_not_found_substring_not_remapped(self):
        assert not _is_table_not_found(
            Exception("checkpoint file not found while executing DROP")
        )

    def test_legacy_phrase_matches(self):
        assert _is_table_not_found(Exception("Table or view not found: t"))

    def test_spark4_phrase_matches(self):
        assert _is_table_not_found(
            Exception(
                "[TABLE_OR_VIEW_NOT_FOUND] The table or view `t` "
                "cannot be found."
            )
        )

    def test_condition_anchors(self):
        class _E(Exception):
            def getCondition(self):
                return "TABLE_OR_VIEW_NOT_FOUND"

        assert _is_table_not_found(_E("anything"))
