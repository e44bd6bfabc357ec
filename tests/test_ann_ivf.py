"""IVF ANN (queries.q_ann_topk_ivf): recall + probe reduction.

Same contract as the LSH-bucketed test: on clustered embeddings (the
regime where sub-brute-force ANN is meaningful) the NPROBE-list probe must
recover nearly all brute-force top-3 neighbors while scanning only a small
fraction of the corpus per query. The codebook is the first IVF_K vec_ids,
so the fixture lays clusters out round-robin — any prefix of vec_ids then
spans every cluster, which is what a k-means-trained codebook would give.
On the near-orthogonal driver testdata embeddings recall is low for ANY
sub-brute scheme (top-1 cos ~ 0.36 there); that regime is covered by the
exact-slice baseline, not asserted here.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window as W, functions as F

from obiemachinelearningframework_spark import queries as Q


@pytest.fixture(scope="module")
def rr_clustered_sf_dir(spark, tmp_path_factory):
    rng = np.random.RandomState(23)
    n_clusters, per_cluster, d = 8, 25, 16
    centers = []
    for _ in range(n_clusters):
        c = rng.normal(0, 1, d)
        centers.append(c / np.linalg.norm(c))
    rows = []
    for vid in range(n_clusters * per_cluster):
        v = centers[vid % n_clusters] + 0.05 * rng.normal(0, 1, d)
        rows.append((vid, [float(x) for x in v]))
    out = str(tmp_path_factory.mktemp("ivf") / "sf")
    spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"])).write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")
    return out


def _brute_topk_slice(spark, sf_dir, k=3):
    pairs = Q._emb_pairs_cosine(spark, sf_dir, query_filter=lambda q: q < Q.IVF_MAX_QID)
    w = W.partitionBy("qid").orderBy(F.desc(F.round("cos", 6)), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid")
    )


def test_ivf_recall_on_clustered_embeddings(spark, rr_clustered_sf_dir):
    bf = _brute_topk_slice(spark, rr_clustered_sf_dir).cache()
    ivf = Q.q_ann_topk_ivf(spark, rr_clustered_sf_dir).select("qid", "nid")
    n = bf.count()
    tp = bf.join(ivf, ["qid", "nid"]).count()
    recall = tp / n
    assert recall >= 0.9, f"IVF recall {recall:.3f} < 0.9 on clustered data"


def test_ivf_probe_reduction(spark, rr_clustered_sf_dir):
    """The point of the inverted lists: candidates scored per query must be
    far fewer than the corpus (here NPROBE=2 of IVF_K=16 lists)."""
    e = spark.read.parquet(f"{rr_clustered_sf_dir}/embeddings.parquet")
    n = e.count()
    ac = Q._ivf_assign(spark, rr_clustered_sf_dir)
    w = W.partitionBy("vec_id").orderBy(F.desc(F.round("cos_c", 6)), F.asc("cid"))
    lists = ac.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
    probes = (
        ac.filter(F.col("vec_id") < Q.IVF_MAX_QID)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= Q.IVF_NPROBE)
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    cand = probes.join(lists.withColumnRenamed("vec_id", "nid"), "cid").filter(
        F.col("qid") != F.col("nid")
    )
    per_query = cand.groupBy("qid").count().agg(F.max("count")).collect()[0][0]
    assert per_query <= 0.5 * n, f"probe scanned {per_query}/{n} vectors per query"
