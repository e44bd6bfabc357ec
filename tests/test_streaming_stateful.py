"""Stateful + windowed Structured Streaming operators over the events
table (file-source micro-batches, availableNow drain)."""

import os

import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.streaming.stateful import (
    stateful_sessionize,
    windowed_type_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """A small slice of the events table written as a streaming source dir."""
    p = str(tmp_path_factory.mktemp("events_src"))
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 20)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(p)
    )
    return p


def test_stateful_sessionize_matches_batch(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    src = spark.readStream.schema(schema).parquet(events_dir)
    sessions = stateful_sessionize(src)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)

    # batch oracle: session count per user via lag-gap (same 30-min rule)
    from obiemachinelearningframework_spark.queries import q_sessionize_events

    batch = q_sessionize_events(spark, "/root/testdata/sf0.001").filter(F.col("user_id") < 20)
    # streaming emits an open (closed=False) snapshot per micro-batch plus a
    # closed=True row when a session ends (gap OR event-time timeout) — the
    # same session can appear as both, so count distinct session starts.
    stream_counts = got.groupBy("user_id").agg(
        F.countDistinct("session_start").alias("n_sessions_stream")
    )
    j = batch.join(stream_counts, "user_id").collect()
    assert j, "no users compared"
    for r in j:
        assert r.n_sessions_stream == r.n_sessions, r


def test_windowed_type_counts_with_watermark(spark, tmp_path):
    # synthetic mention stream with event_time spread over hours
    rows = [(f"d{i}", "Operator" if i % 2 == 0 else "Dataset",
             f"2026-01-01 {i % 6:02d}:15:00") for i in range(60)]
    src_dir = str(tmp_path / "m_src")
    spark.createDataFrame(rows, ["doc_key", "type_id", "event_time_s"]).withColumn(
        "event_time", F.col("event_time_s").cast("timestamp")
    ).drop("event_time_s").coalesce(1).write.mode("overwrite").parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = windowed_type_counts(stream, window="1 hour", watermark="2 hours")
    out_dir = str(tmp_path / "m_out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "m_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    # events i=0..59 at hour i%6 with type by i%2: i = h+6k keeps the parity
    # of h, so each hour-window holds 10 mentions of ONE type. Append mode
    # emits only windows the watermark has closed: final watermark =
    # max(event_time) 05:15 - 2h = 03:15, so windows ending 01/02/03:00
    # (hours 0-2) flush; hours 3-5 stay open when the availableNow drain ends.
    rows = {(r.window_start.hour, r.type_id): r.n_mentions for r in got.collect()}
    assert rows == {(0, "Operator"): 10, (1, "Dataset"): 10, (2, "Operator"): 10}
