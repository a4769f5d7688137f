"""Unit tests for window TVF builders (SURVEY.md §2.6)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_sql_toolkit_spark.operators.tvf import cumulate, hop, session, tumble


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 30)),
        (2, dt.datetime(2024, 1, 1, 0, 14, 59)),
        (3, dt.datetime(2024, 1, 1, 0, 15, 0)),
        (4, dt.datetime(2024, 1, 1, 0, 59, 59)),
    ]
    return spark.createDataFrame(rows, ["id", "ts"])


def test_tumble_assigns_one_window(frame):
    out = tumble(frame, "ts", "15 minutes").collect()
    assert len(out) == 4
    by_id = {r.id: r for r in out}
    assert by_id[2].window_start == dt.datetime(2024, 1, 1, 0, 0)
    assert by_id[3].window_start == dt.datetime(2024, 1, 1, 0, 15)
    assert by_id[3].window_end == dt.datetime(2024, 1, 1, 0, 30)


def test_hop_fanout(frame):
    out = hop(frame, "ts", "5 minutes", "15 minutes").collect()
    # every row lands in exactly size/slide = 3 windows
    assert len(out) == 12
    for r in out:
        assert r.window_start <= r.ts < r.window_end


def test_session_merges_within_gap(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 0, 4, 0)),   # within 5 min gap → same session
        (1, dt.datetime(2024, 1, 1, 0, 30, 0)),  # new session
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = (
        df.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .count()
        .collect()
    )
    assert sorted(r["count"] for r in out) == [1, 2]


def test_cumulate_windows_cover_row(frame):
    out = cumulate(frame, "ts", 900, 3600).collect()
    # row at 00:00:30 belongs to all 4 cumulative windows of its hour;
    # row at 00:59:59 only to the last one
    counts = {}
    for r in out:
        counts[r.id] = counts.get(r.id, 0) + 1
        assert r.window_start <= r.ts < r.window_end
    assert counts[1] == 4
    assert counts[4] == 1


def test_cumulate_rejects_bad_step(frame):
    with pytest.raises(ValueError):
        cumulate(frame, "ts", 700, 3600)
