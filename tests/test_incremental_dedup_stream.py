"""Streaming near-dup annotation vs a static reference index
(streaming/incremental_dedup_stream.py): the map-only signature equals
the batch groupBy signature bit-for-bit; near-dups of reference docs are
flagged with their best match while novel docs pass with NULLs, across
drains; a re-drain with no new files appends nothing; a replayed epoch
overwrites its own partition instead of double-appending."""

import datetime

from obiemachinelearningframework_spark.queries import (
    INCR_EST_MIN,
    N_MINHASH,
    q_minhash_signature,
)
from obiemachinelearningframework_spark.streaming.dedup_stream import DOC_SCHEMA
from obiemachinelearningframework_spark.streaming.incremental_dedup_stream import (
    annotate_batch,
    build_reference_index,
    doc_signatures,
    stream_dedup_incremental,
)

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, text, "en", "web", T0 + datetime.timedelta(minutes=i))
         for i, text in rows],
        DOC_SCHEMA,
    )


def _write(spark, rows, path):
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(path)


def test_maponly_signature_equals_batch(spark):
    """min over the shingle multiset == min over the distinct shingle
    set, so the zero-exchange streaming signature must be bit-identical
    to queries.q_minhash_signature on the real fixture corpus."""
    batch = {r.doc_id: tuple(r[f"h{i}"] for i in range(N_MINHASH))
             for r in q_minhash_signature(spark, SF_DIR).collect()}
    stream = {r.doc_id: tuple(r[f"h{i}"] for i in range(N_MINHASH))
              for r in doc_signatures(
                  spark.read.parquet(f"{SF_DIR}/documents.parquet")).collect()
              if r.h0 is not None}
    assert stream == batch


def test_stream_dedup_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    idx_dir = str(tmp_path / "idx")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    ref_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    build_reference_index(
        _docs(spark, [(100, ref_text),
                      (101, "one two three four five six seven eight")]),
        idx_dir,
    )

    # batch 1: a near-dup of ref 100 (one word changed) + a novel doc
    near = "alpha beta gamma delta epsilon zeta eta theta iota MU"
    _write(spark, [(1, near), (2, "totally different words here entirely")],
           in_dir)
    stream_dedup_incremental(spark, in_dir, idx_dir, out_dir, ck)
    got1 = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    assert set(got1) == {1, 2}
    assert got1[1].dup_of == 100 and got1[1].est_jaccard >= INCR_EST_MIN
    assert got1[2].dup_of is None and got1[2].est_jaccard is None

    # batch 2: an exact copy of ref 101 (agreement 1.0) + a short doc
    # (< one shingle -> NULL signature -> passes as novel)
    _write(spark, [(3, "one two three four five six seven eight"),
                   (4, "ab")], in_dir)
    stream_dedup_incremental(spark, in_dir, idx_dir, out_dir, ck)
    got2 = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    assert set(got2) == {1, 2, 3, 4}
    assert got2[3].dup_of == 101 and got2[3].est_jaccard == 1.0
    assert got2[4].dup_of is None

    # exactly-once: re-drain with no new files appends nothing
    stream_dedup_incremental(spark, in_dir, idx_dir, out_dir, ck)
    assert spark.read.parquet(out_dir).count() == 4


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """A crash between the partition write and the checkpoint commit
    replays the epoch; dynamic partition overwrite makes the replay
    rewrite batch_id=<epoch> instead of appending a second copy."""
    import pyspark.sql.functions as F

    idx_dir = str(tmp_path / "idx")
    out_dir = str(tmp_path / "out")
    build_reference_index(_docs(spark, [(100, "a b c d e f g h")]), idx_dir)
    ref_sigs = spark.read.parquet(f"{idx_dir}/sigs")
    ref_bands = spark.read.parquet(f"{idx_dir}/bands")
    batch = _docs(spark, [(1, "a b c d e f g h"), (2, "x y z w v u t s")])
    for _ in range(2):  # same epoch written twice = replay
        (
            annotate_batch(batch, ref_sigs, ref_bands)
            .withColumn("batch_id", F.lit(7))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
    got = spark.read.parquet(out_dir)
    assert got.count() == 2
    assert {r.doc_id: r.dup_of for r in got.collect()} == {1: 100, 2: None}
