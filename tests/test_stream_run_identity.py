"""Round-4 verdict #8: the deleted-and-recreated-checkpoint scenario,
driven against EVERY stateful streaming sink (cms/gram already pin it in
their own suites).

Two families, two contracts:

* ``batch_id=<epoch>`` partition-overwrite sinks (incremental dedup
  annotations, ANN delta maintenance, ANN top-k serving): replay-safe by
  construction, but a recreated checkpoint restarts epochs at 0 and its
  batches — with availableNow boundaries that are NOT stable across runs
  — would clobber the old run's partitions. These must refuse loudly
  (``assert_sink_run_identity``) and leave the old output untouched.
* the idempotent-MERGE sink (kg_stream): anti-join+union converges to
  the same snapshot under full re-derivation, so a recreated checkpoint
  is safe by construction — pinned here as the reason it carries no
  guard.
"""

import shutil

import pyspark.sql.functions as F
import pytest

from obiemachinelearningframework_spark.streaming.ann_stream import (
    build_ann_index,
    stream_ann_index_update,
    stream_ann_topk,
)
from obiemachinelearningframework_spark.streaming.dedup_stream import DOC_SCHEMA
from obiemachinelearningframework_spark.streaming.incremental_dedup_stream import (
    build_reference_index,
    stream_dedup_incremental,
)
from obiemachinelearningframework_spark.streaming.kg_stream import (
    TRIPLE_OP_SCHEMA,
    read_snapshot,
    stream_kg_merge,
)

SF_DIR = "/root/testdata/sf0.001"
T0 = __import__("datetime").datetime(2024, 1, 1)


def _emb(spark, lo, hi, col="vec_id"):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select(
            F.col("vec_id").alias(col),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )


def _drive_dedup(spark, tmp, batch):
    in_dir, out = str(tmp / "in"), str(tmp / "out")
    idx = str(tmp / "idx")
    if not (tmp / "idx").exists():
        ref = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta", "en", "web", T0)],
            DOC_SCHEMA,
        )
        build_reference_index(ref, idx)
    rows = [(i, f"doc number {i} body words", "en", "web", T0) for i in batch]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append").parquet(in_dir)
    stream_dedup_incremental(spark, in_dir, idx, out, str(tmp / "ck"))
    return out


def _drive_ann_update(spark, tmp, batch):
    in_dir, idx = str(tmp / "in"), str(tmp / "idx")
    if not (tmp / "idx").exists():
        build_ann_index(_emb(spark, 0, 60), idx, k=4)
    _emb(spark, *batch).coalesce(1).write.mode("append").parquet(in_dir)
    stream_ann_index_update(spark, in_dir, idx, str(tmp / "ck"))
    return str(tmp / "idx" / "lists_delta")


def _drive_ann_topk(spark, tmp, batch):
    in_dir, idx, out = str(tmp / "in"), str(tmp / "idx"), str(tmp / "out")
    if not (tmp / "idx").exists():
        build_ann_index(_emb(spark, 0, 60), idx, k=4)
    _emb(spark, *batch, col="qid").coalesce(1).write.mode("append").parquet(in_dir)
    stream_ann_topk(spark, in_dir, idx, out, str(tmp / "ck"))
    return out


@pytest.mark.parametrize(
    "drive,b1,b2",
    [
        (_drive_dedup, [1, 2], [3, 4]),
        (_drive_ann_update, (60, 65), (65, 70)),
        (_drive_ann_topk, (0, 5), (5, 10)),
    ],
    ids=["incremental_dedup", "ann_maintain", "ann_topk"],
)
def test_partition_sinks_refuse_recreated_checkpoint(spark, tmp_path, drive, b1, b2):
    out = drive(spark, tmp_path, b1)
    before = sorted(repr(r) for r in spark.read.parquet(out).collect())
    assert before

    shutil.rmtree(str(tmp_path / "ck"))       # checkpoint lost/recreated
    with pytest.raises(Exception, match="written by streaming run"):
        drive(spark, tmp_path, b2)
    # the old run's partitions survive untouched
    assert sorted(repr(r) for r in spark.read.parquet(out).collect()) == before


def test_kg_merge_converges_under_recreated_checkpoint(spark, tmp_path):
    in_dir, snap, ck = (str(tmp_path / d) for d in ("in", "snap", "ck"))
    ops = [("s1", "p", "o1", "add"), ("s2", "p", "o2", "add"),
           ("s1", "p", "o3", "add")]
    spark.createDataFrame(ops, TRIPLE_OP_SCHEMA).coalesce(1).write.mode(
        "append").parquet(in_dir)
    stream_kg_merge(spark, in_dir, snap, ck)
    first = {tuple(r) for r in read_snapshot(spark, snap).collect()}
    assert first

    shutil.rmtree(ck)
    # fresh checkpoint re-feeds EVERY input file through the MERGE — the
    # anti-join+union discipline is idempotent, so the snapshot converges
    # to the identical state instead of corrupting
    stream_kg_merge(spark, in_dir, snap, ck)
    assert {tuple(r) for r in read_snapshot(spark, snap).collect()} == first
