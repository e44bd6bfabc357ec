"""IVF similarity search as a reusable operator: trained codebook +
inverted-list probe.

The registry query (queries.q_ann_topk_ivf) pins the codebook to the first
IVF_K corpus vectors so the DuckDB oracle sees identical centroids; THIS
module is the production form of the same plan — the codebook comes from
Spark ML KMeans over a bounded corpus SAMPLE (the offline "train" step
every real IVF index runs; constant-cost, like the OBIE model fit), and
the serving plan is unchanged:

* assignment — one map-side stage, codebook broadcast (fine up to ~10^5
  centroids / a few hundred MB; past that — e.g. K ~ sqrt(N) at 10^12
  vectors — production systems go two-level (coarse codebook to shard,
  fine codebook per shard, IMI-style), which composes from this same
  operator applied per shard);
* inverted lists — partitioned by centroid id;
* query probe — joins only (queries x nprobe) rows against the lists,
  never the corpus; exact cosine runs on probed candidates alone.

At 10^12 vectors the ONLY corpus-sized work is the assignment map and the
per-list candidate scoring — no all-pairs product anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

CODEBOOK_SAMPLE_MAX = 100_000   # KMeans train sample cap: the codebook is a
                                # sketch; more sample past ~1000x k adds
                                # nothing but driver/ML time


def train_codebook(emb: DataFrame, k: int = 16, seed: int = 7,
                   sample_max: int = CODEBOOK_SAMPLE_MAX) -> DataFrame:
    """embeddings(vec_id, embedding:array) -> (cid, cv:array<double>) via
    Spark ML KMeans on a deterministic bounded sample. Deterministic in
    (corpus, seed)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    n = emb.count()
    frac = min(1.0, sample_max / max(n, 1))
    sample = emb.sample(fraction=frac, seed=seed) if frac < 1.0 else emb
    train = sample.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    km = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="_c")
    model = km.fit(train)
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    spark = emb.sparkSession
    return spark.createDataFrame(centers, ["cid", "cv"]).select(
        "cid", F.col("cv").cast("array<double>").alias("cv")
    )


def _cos_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def ivf_topk(emb: DataFrame, codebook: DataFrame, query_ids: DataFrame,
             k: int = 3, nprobe: int = 2) -> DataFrame:
    """(vec_id, embedding) x broadcast codebook(cid, cv) -> top-k cosine
    neighbors for the vectors in query_ids(qid), scanning only ``nprobe``
    inverted lists per query. Whole-array cosine via zip_with/aggregate
    (JVM-side, no explode — one row per (vector, centroid))."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ac = (
        e.crossJoin(F.broadcast(codebook))
        .select("vec_id", "v", "cid", _cos_expr("v", "cv").alias("cos_c"))
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.desc(F.round("cos_c", 6)), F.asc("cid"))
    ranked = ac.withColumn("r", F.row_number().over(w_assign))
    lists = ranked.filter(F.col("r") == 1).select(
        F.col("vec_id").alias("nid"), F.col("v").alias("nv"), "cid"
    )
    probes = (
        ranked.join(F.broadcast(query_ids.select(F.col("qid").alias("vec_id"))), "vec_id")
        .filter(F.col("r") <= nprobe)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "cid")
    )
    cand = probes.join(lists, "cid").filter(F.col("qid") != F.col("nid"))
    scored = cand.select("qid", "nid", _cos_expr("qv", "nv").alias("cos")).dropDuplicates(
        ["qid", "nid"]
    )
    w = W.partitionBy("qid").orderBy(F.desc(F.round("cos", 6)), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cos"))
    )
