"""CREATE/DROP/ALTER CATALOG, the DATABASE DDL family, and
DISTRIBUTED BY bucketing (FLIP-376).

The reference grammar declares these statements
(syntaxes/flink.tmLanguage.json:371 catalog DDL, :203 DATABASE /
DISTRIBUTED BY keywords); the client walks catalog → database → table
trees (src/catalogProvider.ts). Spark cannot load catalog plugins at
runtime, so DDL-created catalogs are emulated session-side
(catalogs.py module doc)."""

from __future__ import annotations

import glob
import tempfile

import pytest

from flink_sql_toolkit_spark.engine import Engine
from flink_sql_toolkit_spark.sources.ddl import parse_create_table


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def sess(engine):
    s = engine.open_session("catalog-ddl")
    yield s
    engine.close_session(s.handle)


def run(sess, sql):
    return sess.execute_statement(sql)._rows


class TestCatalogDDL:
    def test_create_show_use_drop_roundtrip(self, sess):
        run(sess, "CREATE CATALOG c1 WITH ('type'='generic_in_memory')")
        assert ["c1"] in run(sess, "SHOW CATALOGS")
        run(sess, "USE CATALOG c1")
        assert run(sess, "SHOW CURRENT CATALOG") == [["c1"]]
        # default database materializes with the catalog
        assert run(sess, "SHOW CURRENT DATABASE") == [["default"]]
        run(sess, "USE CATALOG spark_catalog")
        assert run(sess, "SHOW CURRENT CATALOG") == [["spark_catalog"]]
        run(sess, "DROP CATALOG c1")
        assert ["c1"] not in run(sess, "SHOW CATALOGS")

    def test_type_option_required(self, sess):
        with pytest.raises(ValueError, match="type"):
            run(sess, "CREATE CATALOG bad WITH ('foo'='bar')")

    def test_duplicate_and_if_not_exists(self, sess):
        run(sess, "CREATE CATALOG c2 WITH ('type'='generic_in_memory')")
        with pytest.raises(ValueError, match="already exists"):
            run(sess, "CREATE CATALOG c2 WITH ('type'='generic_in_memory')")
        assert run(sess, "CREATE CATALOG IF NOT EXISTS c2 WITH ('type'='x')") == [["OK"]]

    def test_drop_current_catalog_rejected(self, sess):
        run(sess, "CREATE CATALOG c3 WITH ('type'='generic_in_memory')")
        run(sess, "USE CATALOG c3")
        with pytest.raises(ValueError, match="currently in use"):
            run(sess, "DROP CATALOG c3")

    def test_drop_missing(self, sess):
        with pytest.raises(LookupError):
            run(sess, "DROP CATALOG nope")
        assert run(sess, "DROP CATALOG IF EXISTS nope") == [["OK"]]

    def test_alter_and_describe(self, sess):
        run(sess, "CREATE CATALOG c4 COMMENT 'my cat' WITH ('type'='t0','opt'='a')")
        run(sess, "ALTER CATALOG c4 SET ('opt'='b','extra'='1')")
        run(sess, "ALTER CATALOG c4 COMMENT 'renamed'")
        rows = dict(run(sess, "DESCRIBE CATALOG EXTENDED c4"))
        assert rows["type"] == "t0"
        assert rows["comment"] == "renamed"
        assert rows["option:opt"] == "b" and rows["option:extra"] == "1"
        run(sess, "ALTER CATALOG c4 RESET ('extra')")
        rows = dict(run(sess, "DESCRIBE CATALOG EXTENDED c4"))
        assert "option:extra" not in rows
        with pytest.raises(ValueError, match="type"):
            run(sess, "ALTER CATALOG c4 RESET ('type')")

    def test_describe_plain_and_missing(self, sess):
        run(sess, "CREATE CATALOG c5 WITH ('type'='t')")
        rows = run(sess, "DESCRIBE CATALOG c5")
        assert rows == [["name", "c5"], ["type", "t"], ["comment", ""]]
        with pytest.raises(LookupError):
            run(sess, "DESCRIBE CATALOG ghost")


class TestDatabaseDDL:
    def test_emulated_database_lifecycle(self, sess):
        run(sess, "CREATE CATALOG dc WITH ('type'='generic_in_memory','default-database'='main')")
        run(sess, "USE CATALOG dc")
        assert run(sess, "SHOW DATABASES") == [["main"]]
        run(sess, "CREATE DATABASE extra COMMENT 'x' WITH ('owner'='me')")
        assert run(sess, "SHOW DATABASES") == [["extra"], ["main"]]
        with pytest.raises(ValueError, match="already exists"):
            run(sess, "CREATE DATABASE extra")
        run(sess, "CREATE DATABASE IF NOT EXISTS extra")
        run(sess, "USE extra")
        assert run(sess, "SHOW CURRENT DATABASE") == [["extra"]]
        # connector table created here scopes to dc.extra's browse tree
        run(sess, "CREATE TABLE scoped_t (a INT) WITH ('connector'='datagen','number-of-rows'='2')")
        assert run(sess, "SHOW TABLES") == [["scoped_t"]]
        with pytest.raises(ValueError, match="not empty"):
            run(sess, "DROP DATABASE extra")
        run(sess, "USE main")
        run(sess, "DROP DATABASE extra CASCADE")
        assert run(sess, "SHOW DATABASES") == [["main"]]
        run(sess, "ALTER DATABASE main SET ('k'='v')")
        assert sess.emulated_catalogs.catalogs["dc"].databases["main"].properties == {"k": "v"}

    def test_use_missing_database(self, sess):
        run(sess, "CREATE CATALOG uc WITH ('type'='t')")
        run(sess, "USE CATALOG uc")
        with pytest.raises(LookupError):
            run(sess, "USE nope")

    def test_spark_branch_with_translates_to_dbproperties(self, sess):
        """Flink's WITH ('k'='v') on a real Spark catalog becomes
        WITH DBPROPERTIES — Spark rejects the Flink spelling raw."""
        run(sess, "CREATE DATABASE IF NOT EXISTS fstk_dbtest COMMENT 'spark side' WITH ('a'='1')")
        try:
            rows = sess.spark.sql(
                "DESCRIBE DATABASE EXTENDED fstk_dbtest"
            ).collect()
            info = {r[0]: r[1] for r in rows}
            assert "spark side" in info.get("Comment", "")
            run(sess, "ALTER DATABASE fstk_dbtest SET ('a'='2')")
            props = {r[0]: r[1] for r in sess.spark.sql("DESCRIBE DATABASE EXTENDED fstk_dbtest").collect()}
            assert "a,2" in props.get("Properties", "")  # Spark renders ((a,2))
        finally:
            run(sess, "DROP DATABASE IF EXISTS fstk_dbtest")

    def test_qualified_ref_binds_named_catalog(self, sess):
        run(sess, "CREATE CATALOG qc WITH ('type'='t')")
        run(sess, "CREATE DATABASE qc.side")
        assert "side" in sess.emulated_catalogs.catalogs["qc"].databases
        run(sess, "DROP DATABASE qc.side")
        assert "side" not in sess.emulated_catalogs.catalogs["qc"].databases
        with pytest.raises(LookupError, match="catalog"):
            run(sess, "CREATE DATABASE ghostcat.db1")


class TestDistributedBy:
    def test_parse_variants(self):
        t = parse_create_table(
            "CREATE TABLE b1 (k INT, v STRING) DISTRIBUTED BY HASH(k) INTO 4 BUCKETS"
            " WITH ('connector'='blackhole');"
        )
        assert (t.distributed_by, t.bucket_algorithm, t.bucket_count) == (["k"], "HASH", 4)
        t = parse_create_table(
            "CREATE TABLE b2 (k INT) DISTRIBUTED INTO 3 BUCKETS WITH ('connector'='blackhole');"
        )
        assert (t.distributed_by, t.bucket_count) == ([], 3)
        t = parse_create_table(
            "CREATE TABLE b3 (a INT, b INT) DISTRIBUTED BY RANGE(a, b) PARTITIONED BY (b)"
            " WITH ('connector'='blackhole');"
        )
        assert (t.distributed_by, t.bucket_algorithm, t.bucket_count) == (["a", "b"], "RANGE", None)
        assert t.partitioned_by == ["b"]
        # plain tables keep an empty distribution
        t = parse_create_table("CREATE TABLE b4 (a INT) WITH ('connector'='blackhole');")
        assert t.distributed_by == [] and t.bucket_count is None

    def test_hash_buckets_on_filesystem_sink(self, sess):
        d = tempfile.mkdtemp()
        run(sess, f"CREATE TABLE hsink (k INT, v INT) DISTRIBUTED BY HASH(k) INTO 4 BUCKETS"
                  f" WITH ('connector'='filesystem','path'='{d}','format'='parquet')")
        run(sess, "INSERT INTO hsink SELECT CAST(id % 16 AS INT), CAST(id AS INT)"
                  " FROM (SELECT EXPLODE(SEQUENCE(0, 499)) AS id)")
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 4
        # bucket contract: every key lands in exactly one file
        import duckdb

        con = duckdb.connect()
        worst = con.sql(
            f"SELECT max(c) FROM (SELECT count(DISTINCT filename) c FROM "
            f"read_parquet('{d}/*.parquet', filename=true) GROUP BY k)"
        ).fetchone()[0]
        assert worst == 1
        assert con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0] == 500

    def test_range_buckets_are_sorted_and_disjoint(self, sess):
        d = tempfile.mkdtemp()
        run(sess, f"CREATE TABLE rsink (k INT) DISTRIBUTED BY RANGE(k) INTO 3 BUCKETS"
                  f" WITH ('connector'='filesystem','path'='{d}','format'='parquet')")
        run(sess, "INSERT INTO rsink SELECT CAST(id AS INT) FROM (SELECT EXPLODE(SEQUENCE(0, 299)) AS id)")
        import duckdb

        con = duckdb.connect()
        spans = con.sql(
            f"SELECT min(k), max(k) FROM read_parquet('{d}/*.parquet', filename=true)"
            f" GROUP BY filename ORDER BY 1"
        ).fetchall()
        assert len(spans) == 3
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2  # min/max-prunable, non-overlapping files

    def test_show_create_table_roundtrips_clause(self, sess):
        run(sess, "CREATE TABLE sct (k INT) DISTRIBUTED BY HASH(k) INTO 2 BUCKETS"
                  " WITH ('connector'='blackhole')")
        ddl = run(sess, "SHOW CREATE TABLE sct")[0][0]
        assert "DISTRIBUTED BY HASH(k) INTO 2 BUCKETS" in ddl


class TestReviewRegressions:
    """Fixes from the late-r9 self-review (code-review findings)."""

    def test_use_qualified_catalog_database(self, sess):
        run(sess, "CREATE CATALOG qdc WITH ('type'='t')")
        run(sess, "CREATE DATABASE qdc.extra")
        run(sess, "USE qdc.extra")
        assert run(sess, "SHOW CURRENT CATALOG") == [["qdc"]]
        assert run(sess, "SHOW CURRENT DATABASE") == [["extra"]]

    def test_show_databases_from_unknown_catalog_errors(self, sess):
        with pytest.raises(LookupError, match="ghost"):
            run(sess, "SHOW DATABASES FROM ghost")

    def test_qualified_spark_catalog_database_ddl(self, sess):
        """A qualified ref to a real Spark catalog keeps the qualifier
        so the DDL runs against the named catalog."""
        try:
            run(sess, "CREATE DATABASE IF NOT EXISTS spark_catalog.fstk_qref")
            dbs = [r[0] for r in sess.spark.sql("SHOW DATABASES IN spark_catalog").collect()]
            assert "fstk_qref" in dbs
        finally:
            run(sess, "DROP DATABASE IF EXISTS spark_catalog.fstk_qref")

    def test_rename_to_updates_browse_registry(self, sess):
        run(sess, "CREATE CATALOG rc WITH ('type'='t')")
        run(sess, "USE CATALOG rc")
        run(sess, "CREATE TABLE rn_t (a INT) WITH ('connector'='datagen','number-of-rows'='1')")
        assert run(sess, "SHOW TABLES") == [["rn_t"]]
        run(sess, "ALTER TABLE rn_t RENAME TO rn_t2")
        assert run(sess, "SHOW TABLES") == [["rn_t2"]]
        run(sess, "USE CATALOG spark_catalog")


class TestCreateTableLike:
    """Flink CREATE TABLE … LIKE src (INCLUDING/EXCLUDING/OVERWRITING
    …) — merge semantics per the Flink table DDL docs."""

    BASE = ("CREATE TABLE like_base (id BIGINT, v DOUBLE, ts TIMESTAMP(3),"
            " WATERMARK FOR ts AS ts - INTERVAL '5' SECOND,"
            " PRIMARY KEY (id) NOT ENFORCED)"
            " WITH ('connector'='kafka','topic'='orders',"
            "'properties.bootstrap.servers'='h:9092')")

    def test_plain_like_copies_everything(self, sess):
        run(sess, self.BASE)
        run(sess, "CREATE TABLE like_c1 WITH ('properties.group.id'='g1') LIKE like_base")
        t = sess.connector_tables["like_c1"]
        assert [c.name for c in t.columns] == ["id", "v", "ts"]
        assert t.primary_key == ["id"] and t.watermark.delay == "5 seconds"
        assert t.options["topic"] == "orders"  # inherited
        assert t.options["properties.group.id"] == "g1"  # merged in
        # SHOW CREATE TABLE shows the resolved (expanded) form
        ddl = run(sess, "SHOW CREATE TABLE like_c1")[0][0]
        assert "WATERMARK" in ddl and "LIKE" not in ddl

    def test_option_overwrite_default_and_including(self, sess):
        run(sess, self.BASE.replace("like_base", "like_b2"))
        # Flink's no-like-options default is INCLUDING ALL OVERWRITING
        # OPTIONS — the canonical "same table, different topic"
        # pattern works with the new value winning (review r9: it
        # previously raised)
        run(sess, "CREATE TABLE like_c2 WITH ('topic'='other') LIKE like_b2")
        assert sess.connector_tables["like_c2"].options["topic"] == "other"
        # explicit INCLUDING OPTIONS makes a conflicting key an error
        with pytest.raises(ValueError, match="OVERWRITING OPTIONS"):
            run(sess, "CREATE TABLE like_c2b WITH ('topic'='x')"
                      " LIKE like_b2 (INCLUDING OPTIONS)")
        run(sess, "CREATE TABLE like_c2c WITH ('topic'='y')"
                  " LIKE like_b2 (OVERWRITING OPTIONS)")
        assert sess.connector_tables["like_c2c"].options["topic"] == "y"

    def test_excluding_all_including_options(self, sess):
        run(sess, self.BASE.replace("like_base", "like_b3"))
        run(sess, "CREATE TABLE like_c3 (extra STRING, WATERMARK FOR ts AS"
                  " ts - INTERVAL '1' SECOND) WITH ('scan.startup.mode'='latest-offset')"
                  " LIKE like_b3 (EXCLUDING ALL INCLUDING OPTIONS)")
        t = sess.connector_tables["like_c3"]
        assert [c.name for c in t.columns] == ["id", "v", "ts", "extra"]
        assert t.primary_key == []  # constraints excluded
        assert t.watermark.delay == "1 seconds"  # redefined, not inherited
        assert t.options["scan.startup.mode"] == "latest-offset"
        assert t.options["topic"] == "orders"  # options included

    def test_excluding_watermarks_and_dup_column(self, sess):
        run(sess, self.BASE.replace("like_base", "like_b4"))
        run(sess, "CREATE TABLE like_c4 LIKE like_b4 (EXCLUDING WATERMARKS)")
        assert sess.connector_tables["like_c4"].watermark is None
        with pytest.raises(ValueError, match="already defined"):
            run(sess, "CREATE TABLE like_c5 (id INT) WITH () LIKE like_b4")

    def test_if_not_exists_and_unknown_source(self, sess):
        run(sess, self.BASE.replace("like_base", "like_b5"))
        run(sess, "CREATE TABLE like_c6 LIKE like_b5")
        assert run(sess, "CREATE TABLE IF NOT EXISTS like_c6 LIKE like_b5") == [["OK"]]
        with pytest.raises(ValueError, match="already exists"):
            run(sess, "CREATE TABLE like_c6 LIKE like_b5")

    def test_distribution_inherited(self, sess):
        run(sess, "CREATE TABLE like_b6 (k INT) DISTRIBUTED BY HASH(k) INTO 4 BUCKETS"
                  " WITH ('connector'='blackhole')")
        run(sess, "CREATE TABLE like_c7 LIKE like_b6")
        t = sess.connector_tables["like_c7"]
        assert (t.distributed_by, t.bucket_count) == (["k"], 4)


def test_completions_include_emulated_catalogs(sess):
    run(sess, "CREATE CATALOG comp_c WITH ('type'='t')")
    run(sess, "CREATE DATABASE comp_c.db1")
    run(sess, "USE comp_c.db1")
    run(sess, "CREATE TABLE comp_t (a INT) WITH ('connector'='datagen','number-of-rows'='1')")
    items = sess.completions("SELECT * FROM ")
    cats = {i["label"] for i in items if i["kind"] == "catalog"}
    assert "comp_c" in cats
    dbs = {i["label"] for i in sess.completions("comp_c.", line_prefix="comp_c.")
           if i["kind"] == "database"}
    assert dbs == {"db1", "default"}
    tabs = {i["label"] for i in sess.completions("comp_c.db1.", line_prefix="comp_c.db1.")
            if i["kind"] == "table"}
    assert tabs == {"comp_t"}
    run(sess, "USE CATALOG spark_catalog")


class TestCatalogHardeningR11:
    """Fresh-eyes review findings on the emulated-catalog layer."""

    def test_multipart_db_ref_is_typed_error(self, sess):
        sess.execute_statement(
            "CREATE CATALOG mp_cat WITH ('type'='generic_in_memory')"
        )
        with pytest.raises(ValueError, match="catalog.*database|resolve"):
            sess.execute_statement("DROP DATABASE a.b.c CASCADE")

    def test_escaped_quote_in_comments_and_option_keys(self, sess):
        sess.execute_statement(
            "CREATE CATALOG esc_cat COMMENT 'it''s fine' "
            "WITH ('type'='generic_in_memory', 'o''k'='v''1')"
        )
        rows = sess.execute_statement(
            "DESCRIBE CATALOG EXTENDED esc_cat"
        ).fetch()["data"]
        by = dict((r[0], r[1]) for r in rows)
        assert by["comment"] == "it's fine"
        assert by["option:o'k"] == "v'1"

    def test_drop_catalog_cleans_up_tables(self, sess):
        sess.execute_statement(
            "CREATE CATALOG gc_cat WITH ('type'='generic_in_memory')"
        )
        sess.execute_statement("USE CATALOG gc_cat")
        sess.execute_statement(
            "CREATE TABLE gc_t (a INT) WITH ('connector'='blackhole')"
        )
        sess.execute_statement("USE CATALOG spark_catalog")
        sess.execute_statement("DROP CATALOG gc_cat")
        assert "gc_t" not in sess.connector_tables
        names = [r[0] for r in sess.execute_statement("SHOW TABLES").fetch()["data"]]
        assert "gc_t" not in names

    def test_default_database_is_protected(self, sess):
        sess.execute_statement(
            "CREATE CATALOG dd_cat WITH ('type'='generic_in_memory')"
        )
        sess.execute_statement("CREATE DATABASE dd_cat.other")
        with pytest.raises(ValueError, match="default database"):
            sess.execute_statement("DROP DATABASE dd_cat.`default`")
        with pytest.raises(LookupError, match="no such database"):
            sess.execute_statement(
                "ALTER CATALOG dd_cat SET ('default-database'='ghost')"
            )
        # repointing to an EXISTING database is fine
        sess.execute_statement(
            "ALTER CATALOG dd_cat SET ('default-database'='other')"
        )

    def test_alter_catalog_set_type_rejected(self, sess):
        sess.execute_statement(
            "CREATE CATALOG ty_cat WITH ('type'='generic_in_memory')"
        )
        with pytest.raises(ValueError, match="changing 'type'"):
            sess.execute_statement("ALTER CATALOG ty_cat SET ('type'='jdbc')")

    def test_drop_spark_catalog_distinct_error(self, sess):
        """A Spark catalog that EXISTS (listed by SHOW CATALOGS) but is
        a startup plugin answers 'cannot be dropped', not 'does not
        exist' — while a truly unknown name stays a LookupError."""
        sess.spark.conf.set("spark.sql.catalog.plugin_cat", "com.example.Cat")
        try:
            with pytest.raises(ValueError, match="cannot be dropped"):
                sess.execute_statement("DROP CATALOG plugin_cat")
            with pytest.raises(LookupError, match="does not exist"):
                sess.execute_statement("DROP CATALOG truly_unknown_cat")
        finally:
            sess.spark.conf.unset("spark.sql.catalog.plugin_cat")

    def test_configured_catalog_visible_before_first_use(self, sess):
        """spark.sql.catalog.<name> startup confs count as existing
        catalogs even before Spark loads them."""
        from flink_sql_toolkit_spark.catalogs import _spark_catalog_names

        sess.spark.conf.set("spark.sql.catalog.preconf_cat", "com.example.Cat")
        try:
            assert "preconf_cat" in _spark_catalog_names(sess)
        finally:
            # clean up so the shared session's catalog listings stay
            # order-independent for later tests (review r11)
            sess.spark.conf.unset("spark.sql.catalog.preconf_cat")
        assert "preconf_cat" not in _spark_catalog_names(sess)

    def test_reset_is_atomic_and_rejects_kv_forms(self, sess):
        sess.execute_statement(
            "CREATE CATALOG rs_cat WITH ('type'='t', 'k1'='a', 'k2'='b')"
        )
        # a later invalid key must not leave earlier keys popped
        with pytest.raises(ValueError, match="changing 'type'"):
            sess.execute_statement("ALTER CATALOG rs_cat RESET ('k1', 'type')")
        props = sess.emulated_catalogs.catalogs["rs_cat"].properties
        assert props.get("k1") == "a", "RESET half-applied before failing"
        # malformed k=v items are rejected, not treated as two keys
        with pytest.raises(ValueError, match="quoted keys"):
            sess.execute_statement("ALTER CATALOG rs_cat RESET ('k1'='k2')")
        assert props.get("k1") == "a" and props.get("k2") == "b"

    def test_startup_conf_catalog_detected(self, sess):
        """The SparkContext (startup) conf scan stays covered — the
        runtime SQLConf path is exercised by the plugin tests above."""
        from flink_sql_toolkit_spark.catalogs import _spark_catalog_names

        sess.spark.sparkContext._conf.set(
            "spark.sql.catalog.startup_cat_r11", "com.example.Cat"
        )
        assert "startup_cat_r11" in _spark_catalog_names(sess)
