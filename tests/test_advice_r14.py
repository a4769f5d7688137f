"""Round-14 regression tests: the ADVICE r13 findings.

1. (medium) _execute_statement_set published each member's derived
   savepoint path through the SHARED sess.flink_conf while the child
   Operation executed — statements run on their own threads, so a
   concurrently submitted INSERT could observe the transient value
   and adopt <root>/set-<i> as its checkpointLocation (two active
   queries, one checkpoint dir). The path now rides the member's
   Operation as an explicit override; the session conf is never
   touched.
2. (low) upsert_batch_view decided the offset-vs-(ts,part,off)
   ordering domain PER SIDE (live history / tombstone history
   separately), but the final tombstone-vs-live filter could compare
   under the cross-partition rule — so a tombstone discarded during
   offset-order selection (lower offset, higher timestamp) could
   have out-ordered the surviving live row: a missed delete. The
   domain is now decided once per key over live+tombstone records
   JOINTLY and used for both selection and the final comparison.
3. (low) _quantize used floor(x·1e6 + 0.5) while the DuckDB oracle
   used round() — which disagree for doubles one ULP below a .5
   boundary. The oracle now spells out the identical floor/ceil
   half-away-from-zero form (_q_sql), so edge rounding is shared,
   not engine-dependent.
"""

from __future__ import annotations

import datetime as dt

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
    s = engine.open_session("advice-r14")
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


class TestUpsertJointOrderingDomain:
    """ADVICE r13 #2: selection and the tombstone-vs-live comparison
    must use ONE ordering domain per key, decided over the key's
    live AND tombstone records jointly."""

    def test_discarded_tombstone_cannot_hide_a_delete(self, spark):
        """The exact ADVICE scenario: tombstone history is
        single-partition (so r13 selected its winner by offset —
        off 5, ts 1), the live row sits in another partition, and the
        DISCARDED tombstone (off 3, ts 9) out-orders the live row
        (ts 5) under the cross-partition rule the final filter used.
        r13 missed the delete; with the joint domain the key spans
        partitions, selection runs on (ts, part, off), the ts-9
        tombstone wins selection AND the comparison — deleted."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 9}', None, 0, 5, 1),  # selected by offset in r13
                ('{"id": 9}', None, 0, 3, 9),  # discarded, yet newest by ts
                ('{"id": 9}', '{"id": 9, "name": "x"}', 1, 2, 5),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert out.filter("id = 9").count() == 0

    def test_joint_single_partition_key_stays_offset_ordered(self, spark):
        """All of a key's records (live + tombstone) in one partition:
        the offset stays authoritative end-to-end — a clock-skewed
        tombstone at a lower offset must not delete."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        raw = _frame(
            spark,
            [
                ('{"id": 5}', None, 0, 3, 9),  # skewed-ahead tombstone
                ('{"id": 5}', '{"id": 5, "name": "alive"}', 0, 6, 2),
            ],
        )
        out = upsert_batch_view(raw, _table())
        assert {(r.id, r.name) for r in out.collect()} == {(5, "alive")}

    def test_cross_partition_key_count_attached_and_zero_when_keyed(
        self, spark
    ):
        """VERDICT r13 ask #6: best-effort ordering is observable —
        the view carries the count of keys whose history spans
        partitions."""
        from flink_sql_toolkit_spark.sources.connectors import upsert_batch_view

        spread = _frame(
            spark,
            [
                ('{"id": 1}', '{"id": 1, "name": "a"}', 0, 1, 1),
                ('{"id": 1}', '{"id": 1, "name": "b"}', 1, 1, 2),
                ('{"id": 2}', '{"id": 2, "name": "c"}', 0, 2, 3),
            ],
        )
        out = upsert_batch_view(spread, _table())
        # a memoized CALLABLE, never an eager count: the engine
        # re-registers connector views after every statement, so an
        # eager job would rescan the topic per statement
        assert out._upsert_cross_partition_keys() == 1
        assert out._upsert_cross_partition_keys() == 1  # memoized

        keyed = _frame(
            spark,
            [
                ('{"id": 1}', '{"id": 1, "name": "a"}', 0, 1, 1),
                ('{"id": 2}', '{"id": 2, "name": "c"}', 1, 1, 3),
            ],
        )
        out2 = upsert_batch_view(keyed, _table())
        assert out2._upsert_cross_partition_keys() == 0


class TestStatementSetSavepointIsolation:
    """ADVICE r13 #1: the statement set must not publish its members'
    derived savepoint paths through the shared session conf."""

    def test_member_paths_ride_operations_not_session_conf(
        self, sess, tmp_path, monkeypatch
    ):
        import flink_sql_toolkit_spark.engine as eng

        spark = sess.spark
        src = f"{tmp_path}/set_src"
        spark.createDataFrame([(1,)], "id long").write.parquet(src)
        sess.execute_statement(
            f"""CREATE TABLE iso_src (id BIGINT) WITH (
            'connector'='filesystem', 'path'='{src}', 'format'='parquet')"""
        )
        for i in (1, 2):
            sess.execute_statement(
                f"""CREATE TABLE iso_sink{i} (id BIGINT) WITH (
                'connector'='filesystem', 'path'='{tmp_path}/sink{i}',
                'format'='parquet')"""
            )

        seen: list[tuple[str, str | None, str | None]] = []
        real_op = eng.Operation

        class SpyOp(real_op):
            def execute(self):
                seen.append(
                    (
                        self.statement.split()[0].upper(),
                        sess.flink_conf.get("execution.savepoint.path"),
                        self._savepoint_override,
                    )
                )
                return super().execute()

        monkeypatch.setattr(eng, "Operation", SpyOp)
        op = sess.execute_statement(
            "BEGIN STATEMENT SET; "
            "INSERT INTO iso_sink1 SELECT id FROM iso_src; "
            "INSERT INTO iso_sink2 SELECT id FROM iso_src; "
            "END;"
        )
        try:
            # the session conf NEVER carried a derived member path —
            # a concurrent INSERT on another thread reading it mid-set
            # would have seen None, exactly as before the set started
            assert all(conf is None for _stmt, conf, _ov in seen), seen
            overrides = [ov for stmt, _c, ov in seen if stmt == "INSERT"]
            assert len(overrides) == 2
            assert overrides[0].endswith("/set-0") and overrides[1].endswith(
                "/set-1"
            ), overrides
            root0 = overrides[0].rsplit("/set-", 1)[0]
            assert overrides[1].rsplit("/set-", 1)[0] == root0
        finally:
            page = op.fetch(0)
            for row in page["data"]:
                if row and row[0] != "OK":
                    sess.execute_statement(f"STOP JOB '{row[0]}'")


class TestQuantizerParity:
    """ADVICE r13 #3: the Spark (numpy) and DuckDB quantizers must be
    the SAME expression — including one ULP below .5 boundaries where
    floor(x+0.5) and C round() disagree."""

    def test_edge_values_agree_bit_for_bit(self):
        import duckdb
        import numpy as np

        from flink_sql_toolkit_spark.operators.similarity import (
            _q_sql,
            _quantize,
        )

        edges = [
            0.49999999999999994e-6,   # rounds UP under floor(x+0.5)
            -0.49999999999999994e-6,
            2.5e-6, -2.5e-6, 0.5e-6, -0.5e-6,
            1.4999999999999998e-6, 0.0, 1e-6, -1e-6, 0.123456789,
        ]
        spark_side = _quantize(np.array(edges)).astype(int).tolist()
        con = duckdb.connect()
        duck_side = [
            con.execute(f"SELECT {_q_sql(repr(x))}").fetchone()[0]
            for x in edges
        ]
        con.close()
        assert spark_side == duck_side, list(
            zip(edges, spark_side, duck_side)
        )


class TestTopPKernelTieBreak:
    """The one case the fixture gate can't be trusted to exercise:
    EXACT quantized-dot ties. The kernel's stable argsort and the
    oracle's list-sort over {d: -dot, cid} structs must both order
    tied clusters by ascending cluster id."""

    def test_planted_tie_matches_list_sort_oracle(self, spark):
        import duckdb
        import numpy as np

        from pyspark.sql import functions as F

        from flink_sql_toolkit_spark.operators.similarity import (
            _assign_topp_kernel,
            _qdot_sql,
            _quantize,
        )

        # centroids 10 and 20 are identical → every vector ties them
        cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
        ids = [10, 20, 30]
        kernel = _assign_topp_kernel(cents, ids, 3)
        emb = [[0.5, 0.1], [0.0, 0.9], [-0.3, -0.2]]
        df = spark.createDataFrame([(e,) for e in emb], "embedding array<double>")
        spark_probes = [
            r[0] for r in df.select(kernel(F.col("embedding"))).collect()
        ]

        con = duckdb.connect()
        duck_probes = []
        for e in emb:
            dots = [
                con.execute(
                    f"SELECT {_qdot_sql('a', 'b')} FROM (SELECT "
                    f"{list(map(float, e))}::DOUBLE[] AS a, "
                    f"{list(map(float, c))}::DOUBLE[] AS b)"
                ).fetchone()[0]
                for c in cents
            ]
            row = con.execute(
                "SELECT list_transform(list_sort([{'d': -l[i], 'cid': ids[i]} "
                "FOR i IN range(1, len(l)+1)]), s -> s.cid) "
                f"FROM (SELECT {dots}::BIGINT[] AS l, {ids}::BIGINT[] AS ids)"
            ).fetchone()[0]
            duck_probes.append(row)
        con.close()
        assert spark_probes == duck_probes, (spark_probes, duck_probes)
        # the tie orders by ascending cluster id on both sides
        for p in spark_probes:
            i10, i20 = p.index(10), p.index(20)
            assert i10 < i20, p
        # and numpy's own argmax (first max) agrees with probes[0]
        d = _quantize(np.array(emb)) @ _quantize(np.array(cents)).T
        assert [p[0] for p in spark_probes] == [
            ids[i] for i in d.argmax(axis=1)
        ]

    def test_quantizer_parity_random_sweep(self):
        """Randomized quantizer parity (complements the fixed edge
        list): numpy _quantize and the DuckDB _q_sql expression agree
        on embedding-scale doubles, including values manufactured to
        sit near .5 quantization boundaries."""
        import duckdb
        import numpy as np

        from flink_sql_toolkit_spark.operators.similarity import (
            _q_sql,
            _quantize,
        )

        rng = np.random.default_rng(42)
        xs = np.concatenate([
            rng.uniform(-1, 1, 200),
            # values at and around k + 0.5 quanta (the tie boundary)
            (rng.integers(-1000, 1000, 100) + 0.5) / 1_000_000.0,
            np.nextafter(
                (rng.integers(-1000, 1000, 100) + 0.5) / 1_000_000.0, -np.inf
            ),
        ])
        spark_side = _quantize(xs).astype(int).tolist()
        con = duckdb.connect()
        con.execute("CREATE TABLE t(x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(float(x),) for x in xs])
        duck_side = [
            r[0] for r in con.execute(
                f"SELECT {_q_sql('x')} FROM t"
            ).fetchall()
        ]
        con.close()
        mism = [
            (float(x), a, b)
            for x, a, b in zip(xs, spark_side, duck_side)
            if a != b
        ]
        assert not mism, mism[:10]
