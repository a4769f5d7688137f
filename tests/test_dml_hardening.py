"""Round-11 COW DML hardening regressions (self-review findings on
sources/dml.py — parser gaps, writer-option drops, staging leaks,
no-op rewrites)."""

from __future__ import annotations

import os

import pytest

from flink_sql_toolkit_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def sess(engine):
    s = engine.open_session("dml-hardening")
    s.execute_statement("SET 'execution.runtime-mode' = 'batch'")
    yield s
    engine.close_session(s.handle)


def _mk_parquet(sess, tmp_path, name, rows, schema, ddl_cols, extra=""):
    path = tmp_path / name
    sess.spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(path))
    sess.execute_statement(
        f"CREATE TABLE {name} ({ddl_cols}) WITH ('connector'='filesystem', "
        f"'path'='{path}', 'format'='parquet'{extra})"
    )
    return path


def _rows(sess, sql):
    return sess.execute_statement(sql).fetch()["data"]


def _stage_dirs(tmp_path) -> list[str]:
    return [
        os.path.join(r, d)
        for r, dirs, _ in os.walk(tmp_path)
        for d in dirs
        if "__cow" in d
    ]


class TestParserGaps:
    def test_backticked_table_name(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "bt_t", [(1, 10), (2, 20)], "id long, v long",
                    "id BIGINT, v BIGINT")
        out = sess.execute_statement("UPDATE `bt_t` SET v = 0 WHERE id = 1").fetch()
        assert out["data"] == [[1]]
        assert sorted(_rows(sess, "SELECT id, v FROM bt_t")) == [[1, 0], [2, 20]]
        out = sess.execute_statement("DELETE FROM `bt_t` WHERE id = 2").fetch()
        assert out["data"] == [[1]]

    def test_update_set_array_literal(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "arr_t", [(1, [9])], "id long, a array<int>",
                    "id BIGINT, a ARRAY<INT>")
        sess.execute_statement("UPDATE arr_t SET a = ARRAY[1, 2] WHERE id = 1")
        assert _rows(sess, "SELECT a FROM arr_t") == [[[1, 2]]]

    def test_update_scalar_subquery_with_inner_where(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "sq_t", [(1, 0), (2, 0)], "id long, v long",
                    "id BIGINT, v BIGINT")
        sess.spark.createDataFrame([(1, 7)], "k long, x long").createOrReplaceTempView(
            "sq_src"
        )
        sess.execute_statement(
            "UPDATE sq_t SET v = (SELECT max(x) FROM sq_src WHERE sq_src.k = 1) "
            "WHERE id = 1"
        )
        assert sorted(_rows(sess, "SELECT id, v FROM sq_t")) == [[1, 7], [2, 0]]

    def test_qualified_column_in_where(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "qual_t", [(1, 1), (2, 2)], "id long, v long",
                    "id BIGINT, v BIGINT")
        sess.execute_statement("UPDATE qual_t SET v = 99 WHERE qual_t.id = 2")
        assert sorted(_rows(sess, "SELECT id, v FROM qual_t")) == [[1, 1], [2, 99]]
        sess.execute_statement("DELETE FROM qual_t WHERE qual_t.id = 1")
        assert _rows(sess, "SELECT id FROM qual_t") == [[2]]


class TestMergeValidation:
    def _mk(self, sess, tmp_path, name):
        return _mk_parquet(sess, tmp_path, name, [(1, "a"), (2, "b")],
                           "k long, v string", "k BIGINT, v STRING")

    def test_insert_backticked_column_not_null(self, sess, tmp_path):
        self._mk(sess, tmp_path, "mg_bt")
        sess.spark.createDataFrame([(3, "c")], "k long, v string").createOrReplaceTempView("mg_src")
        sess.execute_statement(
            "MERGE INTO mg_bt t USING mg_src s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (`k`, v) VALUES (s.k, s.v)"
        )
        assert sorted(_rows(sess, "SELECT k, v FROM mg_bt")) == [
            [1, "a"], [2, "b"], [3, "c"],
        ]

    def test_update_set_typo_is_typed_error(self, sess, tmp_path):
        self._mk(sess, tmp_path, "mg_typo")
        sess.spark.createDataFrame([(1, "z")], "k long, v string").createOrReplaceTempView("mg_src2")
        with pytest.raises(ValueError, match="unknown column 'vv'"):
            sess.execute_statement(
                "MERGE INTO mg_typo t USING mg_src2 s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET vv = s.v"
            )

    def test_insert_typo_is_typed_error(self, sess, tmp_path):
        self._mk(sess, tmp_path, "mg_ityp")
        sess.spark.createDataFrame([(9, "z")], "k long, v string").createOrReplaceTempView("mg_src3")
        with pytest.raises(ValueError, match="unknown column 'kk'"):
            sess.execute_statement(
                "MERGE INTO mg_ityp t USING mg_src3 s ON t.k = s.k "
                "WHEN NOT MATCHED THEN INSERT (kk, v) VALUES (s.k, s.v)"
            )


class TestCowWriterFidelity:
    def test_csv_null_literal_survives_rewrite(self, sess, tmp_path):
        path = tmp_path / "csv_nl"
        sess.spark.createDataFrame(
            [(1, None), (2, "x")], "id long, v string"
        ).write.mode("overwrite").option("nullValue", "NULL").csv(str(path))
        sess.execute_statement(
            f"CREATE TABLE csv_nl (id BIGINT, v STRING) WITH ("
            f"'connector'='filesystem', 'path'='{path}', 'format'='csv', "
            f"'csv.null-literal'='NULL')"
        )
        assert sorted(_rows(sess, "SELECT id, v FROM csv_nl")) == [[1, None], [2, "x"]]
        # the rewrite must write NULL with the declared literal, not ''
        sess.execute_statement("UPDATE csv_nl SET v = 'y' WHERE id = 2")
        assert sorted(_rows(sess, "SELECT id, v FROM csv_nl")) == [[1, None], [2, "y"]]

    def test_failed_rewrite_leaves_no_staging_dir(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "boom_t", [(1, 1)], "id long, v long",
                    "id BIGINT, v BIGINT")
        with pytest.raises(Exception, match="boom"):
            sess.execute_statement(
                "UPDATE boom_t SET v = CAST(raise_error('boom') AS BIGINT) "
                "WHERE id = 1"
            )
        assert _stage_dirs(tmp_path) == [], "orphan __cow staging dir leaked"
        # table intact and still writable
        assert _rows(sess, "SELECT v FROM boom_t") == [[1]]

    def test_zero_affected_update_skips_rewrite(self, sess, tmp_path):
        path = _mk_parquet(sess, tmp_path, "noop_t", [(1, 1)], "id long, v long",
                           "id BIGINT, v BIGINT")
        files_before = sorted(os.listdir(path))
        out = sess.execute_statement("UPDATE noop_t SET v = 9 WHERE id = 42").fetch()
        assert out["data"] == [[0]]
        assert sorted(os.listdir(path)) == files_before, "no-op rewrote the snapshot"
        out = sess.execute_statement("DELETE FROM noop_t WHERE id = 42").fetch()
        assert out["data"] == [[0]]
        assert sorted(os.listdir(path)) == files_before


class TestTypedRejections:
    def test_envelope_table_dml_rejected(self, sess, tmp_path):
        path = tmp_path / "dbz"
        path.mkdir()
        sess.execute_statement(
            f"CREATE TABLE dbz_t (id BIGINT, v STRING) WITH ("
            f"'connector'='filesystem', 'path'='{path}', "
            f"'format'='debezium-json')"
        )
        with pytest.raises(NotImplementedError, match="changelog"):
            sess.execute_statement("UPDATE dbz_t SET v = 'x'")
        with pytest.raises(NotImplementedError, match="changelog"):
            sess.execute_statement("ALTER TABLE dbz_t COMPACT")

    def test_timestamp_partition_compact_falls_back(self, sess, tmp_path):
        path = tmp_path / "ts_part"
        sess.spark.createDataFrame(
            [(1, "2024-01-01 12:00:00")], "id long, ts string"
        ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts").write.mode(
            "overwrite"
        ).partitionBy("ts").parquet(str(path))
        sess.execute_statement(
            f"CREATE TABLE ts_part (id BIGINT, ts TIMESTAMP) PARTITIONED BY (ts) "
            f"WITH ('connector'='filesystem', 'path'='{path}', 'format'='parquet')"
        )
        out = sess.execute_statement(
            "ALTER TABLE ts_part PARTITION (ts='2024-01-01 12:00:00') COMPACT"
        ).fetch()
        assert out["data"] == [["OK"]]  # full-table fallback, not RuntimeError
        assert _rows(sess, "SELECT id FROM ts_part") == [[1]]


class TestFollowUps:
    """Second-pass findings on the hardening itself (review r11)."""

    def test_bare_trailing_where_is_typed_error(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "bw_t", [(1, 1)], "id long, v long",
                    "id BIGINT, v BIGINT")
        with pytest.raises(ValueError, match="WHERE keyword with no condition"):
            sess.execute_statement("UPDATE bw_t SET v = 9 WHERE")
        # nothing was updated
        assert _rows(sess, "SELECT v FROM bw_t") == [[1]]

    def test_col_name_quote_aware(self):
        """A backticked name containing a dot is ONE column, not a
        qualification (the DDL layer does not yet accept such columns,
        so this is pinned at the parser level)."""
        from flink_sql_toolkit_spark.sources.dml import _col_name

        assert _col_name("`a.b`") == "a.b"
        assert _col_name("t.`x`") == "x"
        assert _col_name("t.c") == "c"
        assert _col_name(" c ") == "c"
        with pytest.raises(ValueError, match="column reference"):
            _col_name("`unterminated")

    def test_zero_affected_still_analyzes_set_expr(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "an_t", [(1, 1)], "id long, v long",
                    "id BIGINT, v BIGINT")
        with pytest.raises(Exception, match="(?i)no_such_func|unresolved|cannot"):
            sess.execute_statement(
                "UPDATE an_t SET v = no_such_func(id) WHERE id = -1"
            )

    def test_csv_comments_rows_survive_rewrite(self, sess, tmp_path):
        path = tmp_path / "csv_cm"
        sess.spark.createDataFrame(
            [(1, "#notacomment"), (2, "y")], "id long, v string"
        ).selectExpr("v", "id").write.mode("overwrite").option(
            "quoteAll", "true"
        ).csv(str(path))
        sess.execute_statement(
            f"CREATE TABLE csv_cm (v STRING, id BIGINT) WITH ("
            f"'connector'='filesystem', 'path'='{path}', 'format'='csv', "
            f"'csv.allow-comments'='true')"
        )
        assert len(_rows(sess, "SELECT v FROM csv_cm")) == 2
        # the rewrite quotes every field so '#…' rows are not re-read
        # as comment lines (permanent row loss otherwise)
        sess.execute_statement("UPDATE csv_cm SET id = 9 WHERE id = 2")
        assert sorted(_rows(sess, "SELECT v, id FROM csv_cm")) == [
            ["#notacomment", 1], ["y", 9],
        ]

    def test_delete_bare_where_is_typed_error(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "bwd_t", [(1, 1)], "id long, v long",
                    "id BIGINT, v BIGINT")
        # statement normalization strips trailing whitespace, so the
        # regex itself rejects a bare trailing WHERE (the explicit
        # empty-condition guard is defense-in-depth behind it); either
        # way: a typed error, never a full-table delete
        with pytest.raises(ValueError, match="no condition|cannot parse DML"):
            sess.execute_statement("DELETE FROM bwd_t WHERE ;")
        assert _rows(sess, "SELECT id FROM bwd_t") == [[1]]  # nothing deleted

    def test_merge_empty_and_condition_is_typed_error(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "mand_t", [(1, "a")], "k long, v string",
                    "k BIGINT, v STRING")
        sess.spark.createDataFrame([(1, "z")], "k long, v string").createOrReplaceTempView("mand_src")
        with pytest.raises(ValueError, match="AND with no condition"):
            sess.execute_statement(
                "MERGE INTO mand_t t USING mand_src s ON t.k = s.k "
                "WHEN MATCHED AND  THEN DELETE"
            )
        assert _rows(sess, "SELECT k FROM mand_t") == [[1]]  # nothing deleted

    def test_qualified_backticked_set_column(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "qb_t", [(1, 1)], "id long, v long",
                    "id BIGINT, v BIGINT")
        sess.execute_statement("UPDATE qb_t SET `qb_t`.`v` = 5 WHERE id = 1")
        assert _rows(sess, "SELECT v FROM qb_t") == [[5]]

    def test_insert_into_csv_respects_declared_dialect(self, sess, tmp_path):
        """INSERT INTO (the third csv writer besides the two COW swaps)
        must honor the declared null-literal too (review r11)."""
        path = tmp_path / "csv_ins"
        path.mkdir()
        sess.execute_statement(
            f"CREATE TABLE csv_ins (id BIGINT, v STRING) WITH ("
            f"'connector'='filesystem', 'path'='{path}', 'format'='csv', "
            f"'csv.null-literal'='NULL')"
        )
        sess.execute_statement(
            "INSERT INTO csv_ins SELECT 1 AS id, CAST(NULL AS STRING) AS v"
        )
        assert _rows(sess, "SELECT id, v FROM csv_ins") == [[1, None]]

    def test_wrong_qualifier_is_typed_error(self, sess, tmp_path):
        """A qualifier that names something other than the statement's
        target must raise, not silently assign the target's column
        (review r11)."""
        _mk_parquet(sess, tmp_path, "wq_t", [(1, 1)], "id long, v long",
                    "id BIGINT, v BIGINT")
        with pytest.raises(ValueError, match="not the statement's target"):
            sess.execute_statement("UPDATE wq_t SET other_table.v = 0 WHERE id = 1")
        sess.spark.createDataFrame([(1, 9)], "k long, v long").createOrReplaceTempView("wq_src")
        _mk_parquet(sess, tmp_path, "wq_m", [(1, 1)], "k long, v long",
                    "k BIGINT, v BIGINT")
        with pytest.raises(ValueError, match="not the statement's target"):
            sess.execute_statement(
                "MERGE INTO wq_m t USING wq_src s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET s.v = 0"
            )
        # the target's own alias and name both remain legal
        sess.execute_statement(
            "MERGE INTO wq_m t USING wq_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET t.v = s.v"
        )
        assert _rows(sess, "SELECT v FROM wq_m") == [[9]]

    def test_kafka_csv_payload_uses_declared_dialect(self, sess):
        """The kafka csv sink encodes with the declared dialect so the
        topic round-trips through this table's own reader (review
        r11)."""
        from flink_sql_toolkit_spark.sources.connectors import kafka_writer_payload
        from flink_sql_toolkit_spark.sources.ddl import parse_create_table

        t = parse_create_table(
            "CREATE TABLE kcsv (id BIGINT, v STRING) WITH ("
            "'connector'='kafka', 'topic'='t', 'format'='csv', "
            "'csv.null-literal'='NULL');"
        )
        df = sess.spark.createDataFrame([(1, None)], "id long, v string")
        row = kafka_writer_payload(df, t).collect()[0]
        value = row.value if isinstance(row.value, str) else bytes(row.value).decode()
        assert value == "1,NULL"

    def test_multipart_qualifier_is_typed_error(self, sess, tmp_path):
        _mk_parquet(sess, tmp_path, "mpq_t", [(1, 1)], "id long, v long",
                    "id BIGINT, v BIGINT")
        with pytest.raises(ValueError, match="multi-part qualifier"):
            sess.execute_statement(
                "UPDATE mpq_t SET other_db.mpq_t.v = 0 WHERE id = 1"
            )
        assert _rows(sess, "SELECT v FROM mpq_t") == [[1]]
