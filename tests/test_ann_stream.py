"""Streaming similarity search vs a static IVF index
(streaming/ann_stream.py): the streamed top-k equals the batch
operators/ivf.ivf_topk answer row-for-row for the same queries and
index; a second drain serves only the newly-arrived queries; a re-drain
with no new files appends nothing."""

import pyspark.sql.functions as F

from obiemachinelearningframework_spark.operators.ivf import ivf_topk, train_codebook
from obiemachinelearningframework_spark.streaming.ann_stream import (
    build_ann_index,
    stream_ann_topk,
)

SF_DIR = "/root/testdata/sf0.001"
K, NPROBE, CB_K = 3, 2, 8


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _queries(spark, lo, hi):
    return (
        _emb(spark)
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )


def _batch_expected(spark, lo, hi):
    emb = _emb(spark)
    codebook = train_codebook(emb, k=CB_K)
    qids = _queries(spark, lo, hi).select("qid")
    return {
        (r.qid, r.nid, r.rank, r.cos)
        for r in ivf_topk(emb, codebook, qids, k=K, nprobe=NPROBE).collect()
    }


def test_stream_ann_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    idx_dir = str(tmp_path / "idx")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    build_ann_index(_emb(spark), idx_dir, k=CB_K)

    # drain 1: queries 0..10
    _queries(spark, 0, 10).coalesce(1).write.mode("append").parquet(in_dir)
    stream_ann_topk(spark, in_dir, idx_dir, out_dir, ck, k=K, nprobe=NPROBE)
    got1 = {
        (r.qid, r.nid, r.rank, r.cos) for r in spark.read.parquet(out_dir).collect()
    }
    assert got1 == _batch_expected(spark, 0, 10)
    assert len({q for q, _, _, _ in got1}) == 10
    # every query got a full, properly-ranked top-k
    for q in {q for q, _, _, _ in got1}:
        assert sorted(r for (qq, _, r, _) in got1 if qq == q) == list(range(1, K + 1))

    # drain 2: only the new queries are served, earlier output untouched
    _queries(spark, 10, 15).coalesce(1).write.mode("append").parquet(in_dir)
    stream_ann_topk(spark, in_dir, idx_dir, out_dir, ck, k=K, nprobe=NPROBE)
    got2 = {
        (r.qid, r.nid, r.rank, r.cos) for r in spark.read.parquet(out_dir).collect()
    }
    assert got2 == _batch_expected(spark, 0, 15)

    # drain 3: nothing new -> nothing appended
    stream_ann_topk(spark, in_dir, idx_dir, out_dir, ck, k=K, nprobe=NPROBE)
    got3 = {
        (r.qid, r.nid, r.rank, r.cos) for r in spark.read.parquet(out_dir).collect()
    }
    assert got3 == got2


def test_stream_index_update_and_compaction(spark, tmp_path):
    """Index maintenance: streamed vectors join the serving view exactly
    as if they had been indexed at build time; a re-drain adds nothing;
    compaction folds the delta into the base without changing a single
    served row."""
    from obiemachinelearningframework_spark.streaming.ann_stream import (
        compact_ann_index,
        load_lists,
        stream_ann_index_update,
    )
    import os

    idx_dir = str(tmp_path / "idx")
    upd_in = str(tmp_path / "upd_in")
    upd_ck = str(tmp_path / "upd_ck")

    emb = _emb(spark)
    n_total = emb.count()
    base = emb.filter(F.col("vec_id") < 400)
    build_ann_index(base, idx_dir, k=CB_K)

    def _vectors(lo, hi):
        return (
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        )

    _vectors(400, 450).coalesce(1).write.mode("append").parquet(upd_in)
    stream_ann_index_update(spark, upd_in, idx_dir, upd_ck)
    _vectors(450, 10**9).coalesce(1).write.mode("append").parquet(upd_in)
    stream_ann_index_update(spark, upd_in, idx_dir, upd_ck)
    assert load_lists(spark, idx_dir).count() == n_total

    # expected: batch ivf_topk over the FULL corpus with the BASE codebook
    codebook = spark.read.parquet(f"{idx_dir}/codebook")
    qids = _queries(spark, 395, 405).select("qid")
    expected = {
        (r.qid, r.nid, r.rank, r.cos)
        for r in ivf_topk(emb, codebook, qids, k=K, nprobe=NPROBE).collect()
    }
    # served answers must involve streamed vectors for this query range
    assert any(nid >= 400 for _, nid, _, _ in expected)

    def _serve(tag):
        in_dir = str(tmp_path / f"in_{tag}")
        out_dir = str(tmp_path / f"out_{tag}")
        ck = str(tmp_path / f"ck_{tag}")
        _queries(spark, 395, 405).coalesce(1).write.mode("append").parquet(in_dir)
        stream_ann_topk(spark, in_dir, idx_dir, out_dir, ck, k=K, nprobe=NPROBE)
        return {
            (r.qid, r.nid, r.rank, r.cos)
            for r in spark.read.parquet(out_dir).collect()
        }

    assert _serve("pre") == expected

    # re-drain with nothing new: the delta (and so the view) is unchanged
    stream_ann_index_update(spark, upd_in, idx_dir, upd_ck)
    assert load_lists(spark, idx_dir).count() == n_total

    compact_ann_index(spark, idx_dir)
    assert os.path.exists(f"{idx_dir}/CURRENT")
    assert not os.path.isdir(f"{idx_dir}/lists_delta")
    assert load_lists(spark, idx_dir).count() == n_total
    assert _serve("post") == expected


def test_compaction_crash_window_is_noop(spark, tmp_path):
    """Crash AFTER the CURRENT flip but BEFORE the delta clear: leftover
    delta rows duplicate vectors already folded into the base; the
    serving view must dedup them into exactly the committed index."""
    from obiemachinelearningframework_spark.streaming.ann_stream import (
        compact_ann_index,
        load_lists,
        stream_ann_index_update,
    )
    import os
    import shutil

    idx_dir = str(tmp_path / "idx")
    upd_in = str(tmp_path / "upd_in")
    upd_ck = str(tmp_path / "upd_ck")

    emb = _emb(spark)
    n_total = emb.count()
    build_ann_index(emb.filter(F.col("vec_id") < 400), idx_dir, k=CB_K)
    (
        emb.filter(F.col("vec_id") >= 400)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .coalesce(1).write.mode("append").parquet(upd_in)
    )
    stream_ann_index_update(spark, upd_in, idx_dir, upd_ck)

    # snapshot the delta, compact, then restore the delta = the crash state
    delta_dir = os.path.join(idx_dir, "lists_delta")
    saved = str(tmp_path / "delta_saved")
    shutil.copytree(delta_dir, saved)
    compact_ann_index(spark, idx_dir)
    assert not os.path.isdir(delta_dir)
    shutil.copytree(saved, delta_dir)

    view = load_lists(spark, idx_dir)
    assert view.count() == n_total
    assert view.select("nid").distinct().count() == n_total
    # a fresh compaction from the crash state converges to the same index
    compact_ann_index(spark, idx_dir)
    assert load_lists(spark, idx_dir).count() == n_total
