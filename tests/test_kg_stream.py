"""Streaming KG MERGE (streaming/kg_stream.py): triple-op stream folded
into a snapshot with exactly-once batch semantics, atomic A/B commit,
and idempotent re-application."""

import pandas as pd

from obiemachinelearningframework_spark.streaming.kg_stream import (
    _merge_batch,
    read_snapshot,
    stream_kg_merge,
)


def _write_ops(spark, path, rows):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["subj", "pred", "obj", "op"])
    ).coalesce(1).write.mode("append").parquet(path)


def _snap_set(spark, snap_dir):
    return {tuple(r) for r in read_snapshot(spark, snap_dir).collect()}


def test_stream_merge_applies_ops(spark, tmp_path):
    inp, snap, ck = str(tmp_path / "in"), str(tmp_path / "snap"), str(tmp_path / "ck")

    _write_ops(spark, inp, [
        ("e1", "p", "x", "add"),
        ("e2", "p", "y", "add"),
        ("e3", "q", "z", "add"),
    ])
    stream_kg_merge(spark, inp, snap, ck)
    assert _snap_set(spark, snap) == {("e1", "p", "x"), ("e2", "p", "y"),
                                      ("e3", "q", "z")}

    # second drain: retract one, add one, and retract-then-re-add a key
    # in the SAME batch (the add must win)
    _write_ops(spark, inp, [
        ("e2", "p", "y", "retract"),
        ("e4", "p", "w", "add"),
        ("e1", "p", "x", "retract"),
        ("e1", "p", "x", "add"),
    ])
    stream_kg_merge(spark, inp, snap, ck)
    assert _snap_set(spark, snap) == {("e1", "p", "x"), ("e3", "q", "z"),
                                      ("e4", "p", "w")}

    # third drain with NO new files: exactly-once — nothing reprocessed
    before = _snap_set(spark, snap)
    stream_kg_merge(spark, inp, snap, ck)
    assert _snap_set(spark, snap) == before


def test_merge_batch_is_idempotent(spark, tmp_path):
    """Crash-replay safety: applying the same batch twice (checkpoint
    lost after the snapshot flip) yields the same snapshot."""
    snap = str(tmp_path / "snap2")
    import os
    os.makedirs(snap, exist_ok=True)
    batch = spark.createDataFrame(pd.DataFrame(
        [("a", "p", "1", "add"), ("b", "p", "2", "add"), ("a", "q", "3", "retract")],
        columns=["subj", "pred", "obj", "op"]))
    _merge_batch(spark, batch, snap)
    once = _snap_set(spark, snap)
    _merge_batch(spark, batch, snap)
    assert _snap_set(spark, snap) == once == {("a", "p", "1"), ("b", "p", "2")}
