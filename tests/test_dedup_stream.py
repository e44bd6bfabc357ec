"""Streaming exact dedup (streaming/dedup_stream.py): a duplicate text
must be dropped within a drain, across files, AND across drains (state is
checkpointed); distinct texts all pass; a re-drain with no new files
appends nothing (exactly-once)."""

import datetime

import pytest

from obiemachinelearningframework_spark.streaming.dedup_stream import stream_dedup_exact

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _rows(spark, rows, path):
    from obiemachinelearningframework_spark.streaming.dedup_stream import DOC_SCHEMA

    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_dedup_exact(spark, tmp_path):
    in_dir, out_dir, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    def ts(minutes):
        return T0 + datetime.timedelta(minutes=minutes)

    # batch 1: two distinct texts + one in-batch duplicate
    _rows(spark, [
        (1, "alpha beta gamma", "en", "web", ts(0)),
        (2, "delta epsilon", "en", "web", ts(1)),
        (3, "alpha beta gamma", "en", "crawl", ts(2)),   # dup of doc 1
    ], in_dir)
    stream_dedup_exact(spark, in_dir, out_dir, ck)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 2
    assert sorted(r.doc_id for r in got1.collect()) in ([1, 2], [2, 3])

    # batch 2: one new text + one cross-drain duplicate (inside watermark)
    _rows(spark, [
        (4, "zeta eta theta", "en", "web", ts(3)),
        (5, "delta epsilon", "en", "crawl", ts(4)),       # dup of doc 2
    ], in_dir)
    stream_dedup_exact(spark, in_dir, out_dir, ck)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 3
    texts = sorted(r.text for r in got2.collect())
    assert texts == ["alpha beta gamma", "delta epsilon", "zeta eta theta"]

    # exactly-once: re-drain with no new files appends nothing
    stream_dedup_exact(spark, in_dir, out_dir, ck)
    assert spark.read.parquet(out_dir).count() == 3
