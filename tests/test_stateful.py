"""applyInPandasWithState operators: state must survive micro-batch
boundaries (forced with maxFilesPerTrigger=1 over a file source)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_sql_toolkit_spark.streaming.stateful import streaming_dedup, streaming_funnel


def _write_batches(spark, path):
    """Two files = two micro-batches; the A-rows of user 7's match
    arrive in batch 1, the closing B-row in batch 2."""
    b1 = [
        (7, dt.datetime(2024, 1, 1, 0, 0, 1), "view"),
        (7, dt.datetime(2024, 1, 1, 0, 0, 2), "view"),
        (8, dt.datetime(2024, 1, 1, 0, 0, 3), "view"),
        (8, dt.datetime(2024, 1, 1, 0, 0, 4), "purchase"),
    ]
    b2 = [
        (7, dt.datetime(2024, 1, 1, 0, 1, 0), "purchase"),
        (9, dt.datetime(2024, 1, 1, 0, 1, 1), "purchase"),  # no A → no match
    ]
    schema = "user_id long, ts timestamp, event_type string"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(f"{path}/in/b1")
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("overwrite").parquet(f"{path}/in/b2")


def test_funnel_state_crosses_microbatches(spark, tmp_path):
    _write_batches(spark, tmp_path)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in/*")
    )
    out = streaming_funnel(
        stream, "user_id", "ts", "event_type <> 'purchase'", "event_type = 'purchase'"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.user_id: r for r in spark.table("funnel_out").collect()}
    assert set(rows) == {7, 8}  # user 9 never matched
    assert rows[8].n_before == 1
    # user 7's A-rows were in batch 1, B in batch 2 → state crossed
    assert rows[7].n_before == 2
    assert rows[7].start_ts == dt.datetime(2024, 1, 1, 0, 0, 1)
    assert rows[7].purchase_ts == dt.datetime(2024, 1, 1, 0, 1, 0)


def test_streaming_dedup_keep_first(spark, tmp_path):
    data = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), "first"),
        (1, dt.datetime(2024, 1, 1, 0, 0, 5), "dup"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 2), "only"),
    ]
    schema = "k long, ts timestamp, tag string"
    spark.createDataFrame(data, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/in"
    )
    stream = spark.readStream.schema(schema).parquet(f"{tmp_path}/in")
    out = streaming_dedup(stream, ["k"], "ts", "10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedup_out").collect()
    assert len(rows) == 2
    assert {r.k for r in rows} == {1, 2}
