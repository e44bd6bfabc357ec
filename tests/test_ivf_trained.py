"""Trained-codebook IVF (operators/ivf.py): where the deterministic
first-K codebook degrades, KMeans recovers.

Fixture: 8 clusters laid out SEQUENTIALLY (vec_ids 0-24 = cluster 0, ...),
so the first-16-vectors codebook collapses onto one cluster — the regime
the registry query's pinned codebook cannot serve. The KMeans-trained
codebook must reach recall >= 0.9 on brute-force top-3 across queries from
every cluster, probing only nprobe=2 of 8 lists."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window as W, functions as F

from obiemachinelearningframework_spark import queries as Q
from obiemachinelearningframework_spark.operators.ivf import ivf_topk, train_codebook


@pytest.fixture(scope="module")
def seq_clustered(spark, tmp_path_factory):
    rng = np.random.RandomState(41)
    n_clusters, per_cluster, d = 8, 25, 16
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.normal(0, 1, d)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + 0.05 * rng.normal(0, 1, d)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    out = str(tmp_path_factory.mktemp("ivf_seq") / "sf")
    spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"])).write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")
    qids = list(range(0, n_clusters * per_cluster, per_cluster))  # one per cluster
    return out, qids


def test_trained_codebook_recall(spark, seq_clustered):
    sf_dir, qids = seq_clustered
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = spark.createDataFrame([(q,) for q in qids], ["qid"])

    bf_pairs = Q._emb_pairs_cosine(spark, sf_dir, query_filter=lambda q: q.isin(qids))
    w = W.partitionBy("qid").orderBy(F.desc(F.round("cos", 6)), F.asc("nid"))
    bf = (
        bf_pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "nid")
        .cache()
    )
    n = bf.count()

    codebook = train_codebook(emb, k=8, seed=7)
    assert codebook.count() == 8
    got = ivf_topk(emb, codebook, qdf, k=3, nprobe=2).select("qid", "nid")
    recall = bf.join(got, ["qid", "nid"]).count() / n
    assert recall >= 0.9, f"trained-codebook IVF recall {recall:.3f} < 0.9"


def test_trained_codebook_spans_clusters(spark, seq_clustered):
    """Assignment balance: no single inverted list holds the whole corpus
    (the failure mode of the pinned codebook on sequential layout)."""
    sf_dir, _ = seq_clustered
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codebook = train_codebook(emb, k=8, seed=7)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    from obiemachinelearningframework_spark.operators.ivf import _cos_expr

    ac = e.crossJoin(F.broadcast(codebook)).select(
        "vec_id", "cid", _cos_expr("v", "cv").alias("cos_c")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc(F.round("cos_c", 6)), F.asc("cid"))
    lists = ac.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
    sizes = [r["count"] for r in lists.groupBy("cid").count().collect()]
    assert max(sizes) <= 0.5 * sum(sizes), f"degenerate list sizes {sizes}"
