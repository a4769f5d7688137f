"""Regression tests for the round-7 ADVICE.md findings:

1. changelog keep-last: an outer projection mixing `*` with other
   items must not end up with TWO __op columns (star expansion +
   prepend); a star that is not the first item is a typed rejection.
2. two LAG clauses with textually identical quoted defaults must
   route (masked-literal comparison gave them distinct ids).
3. COUNT(*) ('star_cnt') colliding with COUNT(col) on a column
   literally named 'star' must raise, not silently shadow.
4. the changelog passthrough is flagged by the router (RoutedSQL),
   not sniffed from the first output column's name.
"""

from __future__ import annotations

from datetime import datetime

import pytest


# routed `_over_out_*`/`_dedup_out_*` temp views created by the direct
# rewriter calls here are dropped by conftest's autouse
# `_drop_routed_views` fixture (VERDICT r8 ask #1)


def _stream_view(spark, tmp_path, name, schema, rows):
    d = tmp_path / name
    d.mkdir()
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(d))
    stream = spark.readStream.schema(schema).parquet(str(d))
    stream.createOrReplaceTempView(name)
    return stream


def test_keep_last_mixed_star_no_double_op(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_dedup_sql,
    )

    _stream_view(
        spark, tmp_path, "mix_src", "k long, ts timestamp, v string",
        [(1, datetime(2026, 1, 1, 10, 0), "x")],
    )
    # star first, extra items after: no prepend (star expands __op)
    out = rewrite_streaming_dedup_sql(
        spark,
        "SELECT *, k FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts DESC) AS rn FROM mix_src) "
        "WHERE rn = 1",
        changelog=True,
    )
    assert out is not None and out.count("__op") == 0
    assert out.op_passthrough is True
    # star after other items: __op would not lead — typed rejection
    with pytest.raises(NotImplementedError, match="put `\\*` first"):
        rewrite_streaming_dedup_sql(
            spark,
            "SELECT k, * FROM (SELECT *, ROW_NUMBER() OVER "
            "(PARTITION BY k ORDER BY ts DESC) AS rn FROM mix_src) "
            "WHERE rn = 1",
            changelog=True,
        )


def test_lag_identical_quoted_defaults_route(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        rewrite_streaming_over_sql,
    )

    _stream_view(
        spark, tmp_path, "lagdef_src", "k long, ts timestamp, v string",
        [(1, datetime(2026, 1, 1, 10, 0), "x")],
    )
    out = rewrite_streaming_over_sql(
        spark,
        "SELECT k, LAG(v, 1, 'none') OVER (PARTITION BY k ORDER BY ts) AS a, "
        "LAG(v, 1, 'none') OVER (PARTITION BY k ORDER BY ts) AS b "
        "FROM lagdef_src",
    )
    assert out is not None  # was: distinct mask ids → wrongly rejected


def test_count_star_name_collision_rejected(spark, tmp_path):
    from flink_sql_toolkit_spark.streaming.stateful import streaming_over_rows

    stream = _stream_view(
        spark, tmp_path, "starcol_src", "k long, ts timestamp, star long",
        [(1, datetime(2026, 1, 1, 10, 0), 7)],
    )
    with pytest.raises(ValueError, match="same output column"):
        streaming_over_rows(
            stream, ["k"], ["ts"], None, 2,
            agg_specs=[("cnt", None), ("cnt", "star")],
        )


def test_passthrough_is_flagged_not_sniffed(spark, tmp_path):
    from flink_sql_toolkit_spark.dialect.over_sql import (
        RoutedSQL,
        rewrite_streaming_dedup_sql,
    )

    _stream_view(
        spark, tmp_path, "flag_src", "k long, ts timestamp, v string",
        [(1, datetime(2026, 1, 1, 10, 0), "x")],
    )
    keep_last = rewrite_streaming_dedup_sql(
        spark,
        "SELECT v FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts DESC) AS rn FROM flag_src) "
        "WHERE rn = 1",
        changelog=True,
    )
    assert isinstance(keep_last, RoutedSQL) and keep_last.op_passthrough
    # keep-first (ascending) emits plain appends — never flagged, even
    # if a user aliased a data column AS __op in the projection
    keep_first = rewrite_streaming_dedup_sql(
        spark,
        "SELECT v AS __op FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ts) AS rn FROM flag_src) WHERE rn = 1",
    )
    assert keep_first is not None
    assert not getattr(keep_first, "op_passthrough", False)
