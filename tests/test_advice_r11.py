"""Round-11 regression tests: the ADVICE r10 findings.

1. (medium) avro-confluent registry-unreachable fallback made opt-in —
   pinned in test_schema_registry.py (hard error by default, option
   restores the lossy decode).
2. (low) CREATE TABLE … LIKE merged case-insensitively colliding
   columns (`A` vs inherited `a`), producing a table Spark quarantines
   with AMBIGUOUS_REFERENCE at first read.
3. (low) ALTER TABLE … MODIFY on a metadata column applied the type
   but silently dropped NOT NULL / COMMENT — returned OK for work not
   done.
4. (low) gateway open_session orphan-session leak on a failing
   property SET — pinned in test_gateway.py::TestHardeningR11.
"""

from __future__ import annotations

import pytest

from flink_sql_toolkit_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def sess(engine):
    s = engine.open_session("advice-r11")
    s.execute_statement("SET 'execution.runtime-mode' = 'batch'")
    yield s
    engine.close_session(s.handle)


class TestLikeCaseInsensitiveDuplicates:
    def test_physical_case_collision_rejected(self, sess):
        sess.execute_statement(
            "CREATE TABLE like_ci_src (a INT, p STRING) "
            "WITH ('connector'='blackhole')"
        )
        with pytest.raises(ValueError, match="(?i)already defined|duplicate"):
            sess.execute_statement(
                "CREATE TABLE like_ci_new (A DOUBLE) "
                "WITH ('connector'='blackhole') LIKE like_ci_src"
            )
        assert "like_ci_new" not in sess.connector_tables

    def test_cross_category_case_collision_rejected(self, sess):
        """A new physical column colliding with an inherited COMPUTED
        column crosses the per-category checks — the merged-table
        validation catches it."""
        sess.execute_statement(
            "CREATE TABLE like_ci_gsrc (a INT, g AS a + 1) "
            "WITH ('connector'='blackhole')"
        )
        with pytest.raises(ValueError, match="(?i)duplicate|already defined"):
            sess.execute_statement(
                "CREATE TABLE like_ci_gnew (G DOUBLE) "
                "WITH ('connector'='blackhole') LIKE like_ci_gsrc"
            )
        assert "like_ci_gnew" not in sess.connector_tables

    def test_computed_overwriting_matches_case_insensitively(self, sess):
        """OVERWRITING GENERATED replaces `g` when the new table spells
        it `G` — one merged column, not two colliding ones."""
        sess.execute_statement(
            "CREATE TABLE like_ci_osrc (a INT, g AS a + 1) "
            "WITH ('connector'='blackhole')"
        )
        sess.execute_statement(
            "CREATE TABLE like_ci_onew (G AS a * 2) "
            "WITH ('connector'='blackhole') "
            "LIKE like_ci_osrc (OVERWRITING GENERATED)"
        )
        t = sess.connector_tables["like_ci_onew"]
        assert [c.name for c in t.computed] == ["G"]
        assert t.computed[0].expr.replace(" ", "") == "a*2"


class TestModifyMetadataColumn:
    def _mk(self, sess, name):
        sess.execute_statement(
            f"CREATE TABLE {name} (id INT, "
            "part_no INT METADATA FROM 'partition' VIRTUAL) "
            "WITH ('connector'='blackhole')"
        )

    def test_type_only_modify_ok(self, sess):
        self._mk(sess, "md_mod_ok")
        sess.execute_statement("ALTER TABLE md_mod_ok MODIFY part_no BIGINT")
        t = sess.connector_tables["md_mod_ok"]
        assert t.metadata[0].spark_type == "bigint"

    def test_not_null_on_metadata_rejected(self, sess):
        self._mk(sess, "md_mod_nn")
        with pytest.raises(ValueError, match="NOT NULL.*metadata column"):
            sess.execute_statement(
                "ALTER TABLE md_mod_nn MODIFY part_no BIGINT NOT NULL"
            )
        # nothing was half-applied
        assert sess.connector_tables["md_mod_nn"].metadata[0].spark_type == "int"

    def test_comment_on_metadata_rejected(self, sess):
        self._mk(sess, "md_mod_c")
        with pytest.raises(ValueError, match="COMMENT.*metadata column"):
            sess.execute_statement(
                "ALTER TABLE md_mod_c MODIFY part_no BIGINT COMMENT 'nope'"
            )
        assert sess.connector_tables["md_mod_c"].metadata[0].spark_type == "int"
