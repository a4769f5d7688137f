"""Round-10 regression tests: the ADVICE r9 findings plus VERDICT r9
ask #4 (dependent-generated-column guards on ALTER TABLE DROP/RENAME).

ADVICE r9 items covered here:
1. (medium) the SESSION gaps-and-islands fallback leaked its _new /
   _sess helper columns into `SELECT *` results — the TVF relation
   must be exactly input columns + window_start/window_end/window_time
   (FLIP-145 output schema); same for TUMBLE/HOP (_w) and
   CUMULATE (_ws/_k).
2. (medium) ALTER TABLE … MODIFY WATERMARK validated only physical
   columns, falsely rejecting the canonical computed-rowtime pattern.
3. (low) CREATE/ALTER DATABASE on a Spark catalog re-embedded parsed
   option values without re-escaping quotes.
4. (low) _rt_type mangled struct field-name case (tests in
   test_metadata.py::test_rt_type_struct_field_named_timestamp).
5. (low) CREATE TABLE … PARTITIONED BY (…) WITH (…) LIKE src matched
   neither CREATE regex and fell through to an opaque parse error.
"""

from __future__ import annotations

from fastwrite import write_rows

import pytest

from flink_sql_toolkit_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def sess(engine):
    s = engine.open_session("advice-r10")
    s.execute_statement("SET 'execution.runtime-mode' = 'batch'")
    yield s
    engine.close_session(s.handle)


def run(sess, sql):
    op = sess.execute_statement(sql)
    out = op.fetch()
    return out["data"] if isinstance(out, dict) else op._rows


def cols_of(sess, sql) -> list[str]:
    op = sess.execute_statement(sql)
    out = op.fetch()
    return [c["name"] for c in out["columns"]] if isinstance(out, dict) else [
        c[0] for c in op._cols
    ]


class TestTvfOutputSchema:
    """ADVICE r9 #1 — window TVF relations expose NO helper columns
    and DO expose window_time (window_end - 1ms, FLIP-145)."""

    @pytest.fixture(autouse=True)
    def _events(self, sess):
        sess.execute_statement(
            "CREATE VIEW IF NOT EXISTS tvf10 AS SELECT TIMESTAMP '2024-01-01 00:00:00' + "
            "make_interval(0,0,0,0,0,0,s) AS ts, s % 3 AS k, CAST(s AS DOUBLE) AS v "
            "FROM (SELECT explode(sequence(0, 99)) AS s)"
        )
        yield
        sess.execute_statement("DROP VIEW IF EXISTS tvf10")

    @pytest.mark.parametrize(
        "tvf",
        [
            "TUMBLE(TABLE tvf10, DESCRIPTOR(ts), INTERVAL '10' SECOND)",
            "HOP(TABLE tvf10, DESCRIPTOR(ts), INTERVAL '5' SECOND, INTERVAL '10' SECOND)",
            "CUMULATE(TABLE tvf10, DESCRIPTOR(ts), INTERVAL '10' SECOND, INTERVAL '20' SECOND)",
            "SESSION(TABLE tvf10 PARTITION BY k, DESCRIPTOR(ts), INTERVAL '2' SECOND)",
        ],
        ids=["tumble", "hop", "cumulate", "session"],
    )
    def test_star_schema_is_flink_shape(self, sess, tvf):
        names = cols_of(sess, f"SELECT * FROM TABLE({tvf}) LIMIT 1")
        assert names == ["ts", "k", "v", "window_start", "window_end", "window_time"]

    def test_window_time_is_end_minus_1ms(self, sess):
        rows = run(
            sess,
            "SELECT DISTINCT window_end, window_time FROM TABLE("
            "TUMBLE(TABLE tvf10, DESCRIPTOR(ts), INTERVAL '10' SECOND)) "
            "ORDER BY window_end LIMIT 2",
        )
        for end, wt in rows:
            assert (end - wt).total_seconds() == pytest.approx(0.001)

    def test_session_fallback_merges_without_helpers(self, sess):
        # row-preserving shape (no GROUP BY): sessions still merge and
        # only the three window columns are added
        rows = run(
            sess,
            "SELECT k, ts, window_start, window_end FROM TABLE("
            "SESSION(TABLE tvf10 PARTITION BY k, DESCRIPTOR(ts), INTERVAL '5' SECOND)) "
            "WHERE k = 0 ORDER BY ts LIMIT 5",
        )
        # k=0 rows are 3s apart (< 5s gap): one merged session per key
        starts = {r[2] for r in rows}
        assert len(starts) == 1

    def test_window_time_in_group_by(self, sess):
        # window_time folds into the grouped session_window form
        # (functionally determined by the window — Flink allows it as
        # a grouping key; the folded shape stays streaming-valid)
        rows = run(
            sess,
            "SELECT window_start, window_time, COUNT(*) AS n FROM TABLE("
            "SESSION(TABLE tvf10, DESCRIPTOR(ts), INTERVAL '2' SECOND)) "
            "GROUP BY window_start, window_end, window_time",
        )
        assert len(rows) == 1 and rows[0][2] == 100

    def test_window_time_folds_to_session_window(self, sess):
        """The session fold (streaming-valid) handles window_time —
        it must NOT bail to the batch-only gaps-and-islands path."""
        from flink_sql_toolkit_spark.dialect import rewrite

        out = rewrite(
            "SELECT k, window_start, window_time, SUM(v) AS s FROM TABLE("
            "SESSION(TABLE tvf10 PARTITION BY k, DESCRIPTOR(ts), INTERVAL '2' SECOND)) "
            "GROUP BY k, window_start, window_time"
        )
        assert "session_window" in out and "TABLE(" not in out
        assert "INTERVAL '1' MILLISECOND AS window_time" in out
        rows = run(
            sess,
            "SELECT k, window_start, window_time, COUNT(*) AS n FROM TABLE("
            "SESSION(TABLE tvf10 PARTITION BY k, DESCRIPTOR(ts), INTERVAL '2' SECOND)) "
            "GROUP BY k, window_start, window_time ORDER BY k",
        )
        # 100 rows, k in {0,1,2}, 3s apart per key > 2s gap: every row
        # its own session — window_time = window_end - 1ms throughout
        assert len(rows) == 100
        assert all((r[1] is not None and r[2] is not None) for r in rows)


class TestModifyWatermarkComputedRowtime:
    """ADVICE r9 #2 — MODIFY WATERMARK on a computed or metadata
    rowtime column (the canonical Flink pattern) must validate."""

    def test_computed_rowtime(self, sess):
        sess.execute_statement(
            "CREATE TABLE mw_t (raw STRING, ts AS TO_TIMESTAMP(raw), "
            "WATERMARK FOR ts AS ts - INTERVAL '5' SECOND) "
            "WITH ('connector'='datagen','number-of-rows'='1')"
        )
        run(sess, "ALTER TABLE mw_t MODIFY WATERMARK FOR ts AS ts - INTERVAL '10' SECOND")
        assert sess.connector_tables["mw_t"].watermark.delay == "10 seconds"

    def test_metadata_rowtime(self, sess):
        sess.execute_statement(
            "CREATE TABLE mw_m (v STRING, ts TIMESTAMP_LTZ(3) METADATA FROM 'timestamp', "
            "WATERMARK FOR ts AS ts) "
            "WITH ('connector'='kafka','topic'='t','properties.bootstrap.servers'='x')"
        )
        run(sess, "ALTER TABLE mw_m MODIFY WATERMARK FOR ts AS ts - INTERVAL '1' SECOND")
        assert sess.connector_tables["mw_m"].watermark.delay == "1 seconds"

    def test_unknown_column_still_rejected(self, sess):
        sess.execute_statement(
            "CREATE TABLE mw_x (a INT, ts TIMESTAMP(3), WATERMARK FOR ts AS ts) "
            "WITH ('connector'='blackhole')"
        )
        with pytest.raises(LookupError):
            run(sess, "ALTER TABLE mw_x MODIFY WATERMARK FOR ghost AS ghost")


class TestDatabasePropertyEscaping:
    """ADVICE r9 #3 — quoted values survive the Flink→Spark
    DBPROPERTIES translation."""

    def test_create_and_alter_database_quote_value(self, sess, spark):
        run(sess, "CREATE DATABASE IF NOT EXISTS esc_db WITH ('note'='it''s fine')")
        try:
            # value round-trips through Spark's catalog intact
            got = {
                r["info_name"]: r["info_value"]
                for r in spark.sql("DESCRIBE DATABASE EXTENDED esc_db").collect()
            }
            assert "it's fine" in got.get("Properties", "")
            run(sess, "ALTER DATABASE esc_db SET ('note'='now ''two'' quotes')")
            got = {
                r["info_name"]: r["info_value"]
                for r in spark.sql("DESCRIBE DATABASE EXTENDED esc_db").collect()
            }
            assert "now 'two' quotes" in got.get("Properties", "")
        finally:
            spark.sql("DROP DATABASE IF EXISTS esc_db")


class TestCreateLikeWithPartitioning:
    """ADVICE r9 #5 — the new table's own PARTITIONED BY / DISTRIBUTED
    clauses parse and merge per Flink's LIKE semantics."""

    def test_new_table_partitioned_by(self, sess):
        sess.execute_statement(
            "CREATE TABLE like_src10 (a INT, p STRING) "
            "WITH ('connector'='blackhole')"
        )
        run(
            sess,
            "CREATE TABLE like_new10 (extra DOUBLE) PARTITIONED BY (p) "
            "WITH ('connector'='blackhole') LIKE like_src10",
        )
        t = sess.connector_tables["like_new10"]
        assert t.partitioned_by == ["p"]
        assert [c.name for c in t.columns] == ["a", "p", "extra"]

    def test_both_sides_partitioned_rejected(self, sess):
        sess.execute_statement(
            "CREATE TABLE like_psrc (a INT, p STRING) PARTITIONED BY (p) "
            "WITH ('connector'='blackhole')"
        )
        with pytest.raises(ValueError, match="EXCLUDING PARTITIONS"):
            run(
                sess,
                "CREATE TABLE like_pnew (q STRING) PARTITIONED BY (q) "
                "WITH ('connector'='blackhole') LIKE like_psrc",
            )
        # EXCLUDING PARTITIONS resolves it: the new clause wins
        run(
            sess,
            "CREATE TABLE like_pnew (q STRING) PARTITIONED BY (q) "
            "WITH ('connector'='blackhole') LIKE like_psrc (EXCLUDING PARTITIONS)",
        )
        assert sess.connector_tables["like_pnew"].partitioned_by == ["q"]

    def test_new_table_distributed(self, sess):
        sess.execute_statement(
            "CREATE TABLE like_dsrc (a INT) WITH ('connector'='blackhole')"
        )
        run(
            sess,
            "CREATE TABLE like_dnew () DISTRIBUTED BY HASH(a) INTO 4 BUCKETS "
            "WITH ('connector'='blackhole') LIKE like_dsrc",
        )
        t = sess.connector_tables["like_dnew"]
        assert t.distributed_by == ["a"] and t.bucket_count == 4


class TestDropRenameDependentColumns:
    """VERDICT r9 ask #4 — FLIP-273 parity: a column referenced by a
    generated column's expression (or the watermark expression) cannot
    be dropped, and renaming it is rejected; computed and metadata
    columns themselves ARE droppable."""

    @pytest.fixture()
    def dep_t(self, sess):
        sess.execute_statement(
            "CREATE TABLE dep_t (a INT, b INT, c AS a + 1, "
            "m TIMESTAMP_LTZ(3) METADATA FROM 'timestamp', "
            "ts TIMESTAMP(3), WATERMARK FOR ts AS ts - INTERVAL '5' SECOND) "
            "WITH ('connector'='kafka','topic'='t','properties.bootstrap.servers'='x')"
        )
        return sess.connector_tables["dep_t"]

    def test_drop_column_with_dependent_generated(self, sess, dep_t):
        with pytest.raises(ValueError, match="computed column 'c'"):
            run(sess, "ALTER TABLE dep_t DROP a")

    def test_rename_column_with_dependent_generated(self, sess, dep_t):
        with pytest.raises(ValueError, match="computed column 'c'"):
            run(sess, "ALTER TABLE dep_t RENAME a TO z")

    def test_drop_watermark_expression_source(self, sess, dep_t):
        # ts is the watermark column itself — existing guard
        with pytest.raises(ValueError, match="watermark"):
            run(sess, "ALTER TABLE dep_t DROP ts")

    def test_drop_computed_column_itself(self, sess, dep_t):
        run(sess, "ALTER TABLE dep_t DROP c")
        assert not dep_t.computed
        # with the dependent gone, a is droppable
        run(sess, "ALTER TABLE dep_t DROP a")
        assert all(c.name != "a" for c in dep_t.columns)

    def test_drop_metadata_column_itself(self, sess, dep_t):
        run(sess, "ALTER TABLE dep_t DROP m")
        assert not dep_t.metadata

    def test_drop_metadata_column_under_watermark(self, sess):
        sess.execute_statement(
            "CREATE TABLE dep_m (v STRING, mts TIMESTAMP_LTZ(3) METADATA FROM 'timestamp', "
            "WATERMARK FOR mts AS mts) "
            "WITH ('connector'='kafka','topic'='t','properties.bootstrap.servers'='x')"
        )
        with pytest.raises(ValueError, match="watermark"):
            run(sess, "ALTER TABLE dep_m DROP mts")


# -- VERDICT r9 ask #3: rank-aware dedup router, adversarial text ------


def _t10(s: int):
    import datetime as dt

    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _stream_view10(spark, tmp_path, name, schema, rows):
    write_rows(f"{tmp_path}/{name}", rows, schema)
    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/{name}")
        .createOrReplaceTempView(name)
    )


class TestDedupRouterAdversarial:
    """Directed cases over the r9 residual-conjunct + rn-scan text
    surface, live through the router (the property suite pins the
    same invariants over generated inputs)."""

    @pytest.fixture()
    def src(self, spark, tmp_path):
        _stream_view10(
            spark, tmp_path, "adv_dedup_src", "k long, ts timestamp, v long",
            [(1, _t10(1), 7), (1, _t10(2), 8), (2, _t10(3), 9)],
        )
        return "adv_dedup_src"

    def _route(self, spark, sql, **kw):
        from flink_sql_toolkit_spark.dialect.over_sql import (
            rewrite_streaming_dedup_sql,
        )

        return rewrite_streaming_dedup_sql(spark, sql, **kw)

    def test_literal_or_in_string_routes(self, spark, src):
        routed = self._route(
            spark,
            f"SELECT k, v FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k "
            f"ORDER BY ts) AS rn FROM {src}) WHERE rn = 1 AND v <> ' OR 1=1 '",
        )
        assert routed is not None
        assert "' OR 1=1 '" in routed  # literal survives verbatim

    def test_literal_order_by_in_string_routes(self, spark, src):
        routed = self._route(
            spark,
            f"SELECT k, v FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k "
            f"ORDER BY ts) AS rn FROM {src}) WHERE rn = 1 AND v <> 'x ORDER BY y'",
        )
        assert routed is not None and "'x ORDER BY y'" in routed

    def test_depth0_or_falls_back(self, spark, src):
        routed = self._route(
            spark,
            f"SELECT k, v FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k "
            f"ORDER BY ts) AS rn FROM {src}) WHERE rn = 1 AND v = 1 OR v = 2",
        )
        assert routed is None  # precedence change: must not route

    def test_rn_literal_does_not_select_rank_mode(self, spark, src):
        routed = self._route(
            spark,
            f"SELECT k, v, 'rn' FROM (SELECT *, ROW_NUMBER() OVER (PARTITION "
            f"BY k ORDER BY ts) AS rn FROM {src}) WHERE rn = 1",
        )
        assert routed is not None
        # the routed view is rank-free: no rn column materialized
        view = routed.split(" FROM ")[-1].split()[0]
        assert "rn" not in spark.table(view).columns

    def test_rn_in_wider_expression_routes_rank_aware(self, spark, src):
        routed = self._route(
            spark,
            f"SELECT k, rn + 1 AS r2 FROM (SELECT *, ROW_NUMBER() OVER "
            f"(PARTITION BY k ORDER BY ts) AS rn FROM {src}) WHERE rn <= 2",
        )
        assert routed is not None
        view = routed.split(" FROM ")[-1].split()[0]
        assert "rn" in spark.table(view).columns
        assert spark.sql(routed).columns == ["k", "r2"]

    def test_mixed_case_backticked_keys_route(self, spark, src):
        routed = self._route(
            spark,
            f"SELECT k, v FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY `K` "
            f"ORDER BY `TS`) AS rn FROM {src}) WHERE rn = 1",
        )
        # Spark resolves case-insensitively; the router canonicalizes
        # to the schema casing instead of failing in the executor
        assert routed is not None

    def test_residual_referencing_rn_gets_rank_view(self, spark, src):
        routed = self._route(
            spark,
            f"SELECT k, v FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k "
            f"ORDER BY ts) AS rn FROM {src}) WHERE rn <= 2 AND rn = 2",
        )
        assert routed is not None
        view = routed.split(" WHERE ")[0].split(" FROM ")[-1].split()[0]
        assert "rn" in spark.table(view).columns


# -- review r10: guard/scan edge cases ---------------------------------


class TestReviewR10Commands:
    def test_drop_ignores_column_name_inside_literal(self, sess):
        """`concat('k', name)` does not reference a column named k —
        the dependency scan masks string literals (review r10)."""
        sess.execute_statement(
            "CREATE TABLE lit_dep (k INT, name STRING, "
            "label AS CONCAT('k', name)) WITH ('connector'='blackhole')"
        )
        run(sess, "ALTER TABLE lit_dep DROP k")  # must NOT be rejected
        assert all(c.name != "k" for c in sess.connector_tables["lit_dep"].columns)

    def test_rename_updates_watermark_expr_on_other_column(self, sess):
        """A watermark declared on ts but whose expression also
        references another column must follow that column's rename —
        a dangling name breaks the next synthesize/read (review r10)."""
        sess.execute_statement(
            "CREATE TABLE wm_dep (backup_ts TIMESTAMP(3), ts TIMESTAMP(3), "
            "WATERMARK FOR ts AS GREATEST(ts, backup_ts) - INTERVAL '1' SECOND) "
            "WITH ('connector'='blackhole')"
        )
        run(sess, "ALTER TABLE wm_dep RENAME backup_ts TO b2")
        wm = sess.connector_tables["wm_dep"].watermark
        assert wm.column == "ts"
        assert "b2" in wm.delay_expr and "backup_ts" not in wm.delay_expr
        # the synthesized DDL round-trips (no dangling reference)
        ddl = run(sess, "SHOW CREATE TABLE wm_dep")[0][0]
        assert "backup_ts" not in ddl

    def test_rename_does_not_touch_literal_in_watermark_expr(self, sess):
        sess.execute_statement(
            "CREATE TABLE wm_lit (a TIMESTAMP(3), ts TIMESTAMP(3), "
            "WATERMARK FOR ts AS IF(DATE_FORMAT(ts, 'a') = 'a', ts, a)) "
            "WITH ('connector'='blackhole')"
        )
        run(sess, "ALTER TABLE wm_lit RENAME a TO renamed_a")
        wm = sess.connector_tables["wm_lit"].watermark
        assert "'a'" in wm.delay_expr  # the literal survives
        assert "renamed_a" in wm.delay_expr

    def test_set_reset_with_quoted_value(self, sess):
        run(sess, "SET 'pipeline.name' = 'bob''s job'")
        conf = dict(run(sess, "SET"))
        assert conf["pipeline.name"] == "bob's job"
        run(sess, "RESET 'pipeline.name'")
        assert "pipeline.name" not in dict(run(sess, "SET"))


class TestReviewR10Pass3:
    def test_case_insensitive_dependency_guard(self, sess):
        """Spark resolves identifiers case-insensitively — an
        uppercase-spelled reference must not escape the FLIP-273
        guard (review r10 pass 3)."""
        sess.execute_statement(
            "CREATE TABLE ci_dep (ts TIMESTAMP(3), c AS CAST(TS AS TIMESTAMP_LTZ(3))) "
            "WITH ('connector'='blackhole')"
        )
        with pytest.raises(ValueError, match="computed column 'c'"):
            run(sess, "ALTER TABLE ci_dep DROP ts")

    def test_case_insensitive_watermark_follow_on_rename(self, sess):
        sess.execute_statement(
            "CREATE TABLE ci_wm (backup_ts TIMESTAMP(3), ts TIMESTAMP(3), "
            "WATERMARK FOR ts AS GREATEST(ts, BACKUP_TS) - INTERVAL '1' SECOND) "
            "WITH ('connector'='blackhole')"
        )
        run(sess, "ALTER TABLE ci_wm RENAME backup_ts TO b2")
        wm = sess.connector_tables["ci_wm"].watermark
        assert "b2" in wm.delay_expr
        assert "backup_ts" not in wm.delay_expr.lower()

    def test_rename_computed_and_metadata_columns(self, sess):
        """RENAME resolves all three column kinds, like DROP and
        MODIFY WATERMARK (review r10 pass 3)."""
        sess.execute_statement(
            "CREATE TABLE rn_kinds (raw STRING, c AS UPPER(raw), "
            "m TIMESTAMP_LTZ(3) METADATA FROM 'timestamp') "
            "WITH ('connector'='kafka','topic'='t','properties.bootstrap.servers'='x')"
        )
        run(sess, "ALTER TABLE rn_kinds RENAME c TO c2")
        t = sess.connector_tables["rn_kinds"]
        assert [x.name for x in t.computed] == ["c2"]
        run(sess, "ALTER TABLE rn_kinds RENAME m TO m2")
        assert [x.name for x in t.metadata] == ["m2"]
        # a rename colliding with a computed column's name is rejected
        with pytest.raises(ValueError, match="already exists"):
            run(sess, "ALTER TABLE rn_kinds RENAME raw TO c2")


class TestReviewR10Pass4:
    def test_keyword_positions_are_not_references(self, sess):
        """A column named like an INTERVAL unit or cast-target type
        must not collide with keyword positions (pass 4: the (?i)
        scan rewrote INTERVAL '5' SECOND on renaming `second`)."""
        sess.execute_statement(
            "CREATE TABLE kw_t (ts TIMESTAMP(3), second INT, x STRING, "
            "c AS CAST(x AS DATE), "
            "WATERMARK FOR ts AS ts - INTERVAL '5' SECOND) "
            "WITH ('connector'='blackhole')"
        )
        run(sess, "ALTER TABLE kw_t RENAME second TO s2")
        wm = sess.connector_tables["kw_t"].watermark
        assert wm.delay_expr.upper().endswith("INTERVAL '5' SECOND")
        # a column named `date` is droppable despite CAST(x AS DATE)
        run(sess, "ALTER TABLE kw_t ADD date STRING")
        run(sess, "ALTER TABLE kw_t DROP date")

    def test_backticked_reference_guards_and_follows(self, sess):
        sess.execute_statement(
            "CREATE TABLE bt_t (ts TIMESTAMP(3), other TIMESTAMP(3), "
            "c AS CAST(`ts` AS TIMESTAMP_LTZ(3)), "
            "WATERMARK FOR other AS GREATEST(other, `ts`) - INTERVAL '1' SECOND) "
            "WITH ('connector'='blackhole')"
        )
        # the backticked spelling is a reference: DROP must reject
        with pytest.raises(ValueError, match="computed column 'c'"):
            run(sess, "ALTER TABLE bt_t DROP ts")
        # drop the computed dependency, then rename — the backticked
        # watermark reference follows
        run(sess, "ALTER TABLE bt_t DROP c")
        run(sess, "ALTER TABLE bt_t RENAME ts TO event_ts")
        wm = sess.connector_tables["bt_t"].watermark
        assert "`event_ts`" in wm.delay_expr and "ts`" not in wm.delay_expr.replace("event_ts", "")

    def test_rename_lookup_and_collisions_case_insensitive(self, sess):
        sess.execute_statement(
            "CREATE TABLE cs_t (aa INT, bb INT) WITH ('connector'='blackhole')"
        )
        # uppercase spelling resolves (Spark-style)
        run(sess, "ALTER TABLE cs_t RENAME AA TO cc")
        names = [c.name for c in sess.connector_tables["cs_t"].columns]
        assert names == ["cc", "bb"]
        # collision check is case-insensitive
        with pytest.raises(ValueError, match="already exists"):
            run(sess, "ALTER TABLE cs_t RENAME bb TO CC")
        # a pure case-change rename of the same column stays legal
        run(sess, "ALTER TABLE cs_t RENAME cc TO CC")
        assert [c.name for c in sess.connector_tables["cs_t"].columns] == ["CC", "bb"]

    def test_synthesize_escapes_option_keys(self):
        from flink_sql_toolkit_spark.sources.ddl import (
            Column,
            ConnectorTable,
            parse_create_table,
            synthesize_ddl,
        )

        t = ConnectorTable(
            "q", columns=[Column("a", "int")],
            options={"connector": "blackhole", "o'k": "v'1"},
        )
        ddl = synthesize_ddl(t)
        back = parse_create_table(ddl + ";")
        assert back.options["o'k"] == "v'1"


class TestReviewR10Pass5:
    def test_drop_spec_guard_case_insensitive(self, sess):
        sess.execute_statement(
            "CREATE TABLE p5_pk (id INT NOT NULL, v STRING, "
            "PRIMARY KEY (ID) NOT ENFORCED) WITH ('connector'='blackhole')"
        )
        with pytest.raises(ValueError, match="referenced"):
            run(sess, "ALTER TABLE p5_pk DROP id")

    def test_alter_set_reset_escaped_keys(self, sess):
        sess.execute_statement(
            "CREATE TABLE p5_opt (a INT) WITH ('connector'='blackhole', 'o''k'='v1')"
        )
        t = sess.connector_tables["p5_opt"]
        assert t.options["o'k"] == "v1"
        run(sess, "ALTER TABLE p5_opt SET ('o''k'='v2')")
        assert t.options["o'k"] == "v2" and "k" not in t.options
        run(sess, "ALTER TABLE p5_opt RESET ('o''k')")
        assert "o'k" not in t.options

    def test_rename_into_case_duplicate_rejected(self, sess):
        # case-duplicate columns are legal in case-sensitive Flink;
        # renaming must not create two identical names
        sess.execute_statement(
            "CREATE TABLE p5_dup (a INT, A2 INT) WITH ('connector'='blackhole')"
        )
        with pytest.raises(ValueError, match="already exists"):
            run(sess, "ALTER TABLE p5_dup RENAME a TO a2")

    def test_datetime_function_unit_slots_not_references(self, sess):
        sess.execute_statement(
            "CREATE TABLE p5_units (ts TIMESTAMP(3), second INT, "
            "WATERMARK FOR ts AS TIMESTAMPADD(SECOND, -5, ts)) "
            "WITH ('connector'='blackhole')"
        )
        run(sess, "ALTER TABLE p5_units RENAME second TO s2")
        wm = sess.connector_tables["p5_units"].watermark
        assert "TIMESTAMPADD(SECOND, -5, ts)" in wm.delay_expr
        # and DROP of the unit-named column is not falsely blocked
        run(sess, "ALTER TABLE p5_units DROP s2")

    def test_add_and_modify_resolve_case_insensitively(self, sess):
        sess.execute_statement(
            "CREATE TABLE p5_ci (ts TIMESTAMP(3)) WITH ('connector'='blackhole')"
        )
        run(sess, "ALTER TABLE p5_ci MODIFY TS TIMESTAMP(6)")
        run(sess, "ALTER TABLE p5_ci ADD WATERMARK FOR TS AS TS - INTERVAL '5' SECOND")
        assert sess.connector_tables["p5_ci"].watermark is not None


class TestReviewR10Pass6:
    def test_create_rejects_case_duplicate_columns(self, sess):
        with pytest.raises(ValueError, match="duplicate column"):
            sess.execute_statement(
                "CREATE TABLE p6_dup (a INT, A INT) WITH ('connector'='blackhole')"
            )

    def test_add_rejects_case_duplicate(self, sess):
        sess.execute_statement(
            "CREATE TABLE p6_add (ts TIMESTAMP(3)) WITH ('connector'='blackhole')"
        )
        with pytest.raises(ValueError, match="already exists"):
            run(sess, "ALTER TABLE p6_add ADD TS INT")

    def test_reset_passthrough_escapes_key(self, sess, spark):
        spark.sql("CREATE TABLE IF NOT EXISTS p6_spark (a INT) USING parquet")
        try:
            spark.sql("ALTER TABLE p6_spark SET TBLPROPERTIES ('o''k'='v')")
            run(sess, "ALTER TABLE p6_spark RESET ('o''k')")
            props = spark.sql("SHOW TBLPROPERTIES p6_spark").collect()
            assert not any(r["key"] == "o'k" for r in props)
        finally:
            spark.sql("DROP TABLE IF EXISTS p6_spark")

    def test_substring_from_still_references(self, sess):
        # a unit-named column before FROM outside EXTRACT is a real ref
        sess.execute_statement(
            "CREATE TABLE p6_sub (day STRING, d2 AS SUBSTRING(day FROM 2)) "
            "WITH ('connector'='blackhole')"
        )
        with pytest.raises(ValueError, match="computed column 'd2'"):
            run(sess, "ALTER TABLE p6_sub DROP day")
        # while EXTRACT's unit slot stays a keyword position
        sess.execute_statement(
            "CREATE TABLE p6_ext (day STRING, ts TIMESTAMP(3), "
            "e AS EXTRACT(DAY FROM ts)) WITH ('connector'='blackhole')"
        )
        run(sess, "ALTER TABLE p6_ext DROP day")  # not falsely blocked

    def test_modify_metadata_column_and_computed_rejection(self, sess):
        sess.execute_statement(
            "CREATE TABLE p6_mod (v STRING, c AS UPPER(v), "
            "hdrs STRING METADATA FROM 'topic') "
            "WITH ('connector'='kafka','topic'='t','properties.bootstrap.servers'='x')"
        )
        run(sess, "ALTER TABLE p6_mod MODIFY hdrs VARCHAR(100)")
        t = sess.connector_tables["p6_mod"]
        assert next(m for m in t.metadata if m.name == "hdrs").spark_type == "string"
        with pytest.raises(ValueError, match="computed column 'c'"):
            run(sess, "ALTER TABLE p6_mod MODIFY c INT")
