"""IVF-ADC product quantization (trained, residual-encoded) — the
production form of the registry's `ann_topk_ivfpq` query.

The registry query pins both codebooks to the first corpus vectors so
the DuckDB oracle sees identical centroids (same convention as
`ann_topk_ivf`); THIS module is what a real deployment runs (Jegou et
al., TPAMI 2011, the IVFADC system): sub-codebooks are KMeans-trained
on the RESIDUALS v - coarse_centroid(v), which is what lets PQ
discriminate WITHIN a coarse cell — quantizing raw vectors with
untrained codebooks collapses exactly where ANN needs resolution (see
tests/test_ann_ivfpq.py for the measured difference).

Scale shape (10^12 vectors):
* train: constant-cost — KMeans over a bounded residual sample per
  subspace (PQ_M small fits, driver-side model, like the OBIE fit);
* encode: ONE map pass with both codebooks broadcast; the stored index
  is PQ_M small ints per vector (32x-64x smaller than raw floats);
* serve: candidates from nprobe inverted lists; ADC joins a
  (queries x nprobe x PQ_M x PQ_K) broadcast lookup table against the
  candidates' codes — raw vectors are read ONLY to rerank the
  per-query shortlist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

PQ_TRAIN_SAMPLE_MAX = 100_000


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _residuals(emb: DataFrame, coarse: DataFrame) -> DataFrame:
    """(vec_id, v) x broadcast coarse(cid, cv) -> (vec_id, cid, rv) with
    rv = v - nearest(cv) by squared L2 (deterministic cid tie-break)."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    scored = e.crossJoin(F.broadcast(coarse)).select(
        "vec_id", "v", "cid", "cv", F.round(_l2sq(F.col("v"), F.col("cv")), 6).alias("d2")
    )
    w = W.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "v", "cid",
                F.zip_with("v", "cv", lambda x, y: x - y).alias("rv"))
    )


def train_pq(emb: DataFrame, coarse: DataFrame, m: int = 8, k: int = 16,
             seed: int = 7, sample_max: int = PQ_TRAIN_SAMPLE_MAX) -> DataFrame:
    """Per-subspace KMeans over residual sub-vectors -> (m, j, c).
    Deterministic in (corpus, coarse, seed); constant-cost (bounded
    sample, PQ_M driver-side fits)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    res = _residuals(emb, coarse)
    n = res.count()
    frac = min(1.0, sample_max / max(n, 1))
    sample = (res.sample(fraction=frac, seed=seed) if frac < 1.0 else res).select("rv")
    sample = sample.cache()
    dim = len(sample.first()["rv"])
    sub = dim // m
    rows = []
    for mi in range(m):
        train = sample.select(
            array_to_vector(F.slice("rv", mi * sub + 1, sub)).alias("features")
        )
        model = KMeans(k=k, seed=seed + mi, featuresCol="features",
                       predictionCol="_c").fit(train)
        for j, c in enumerate(model.clusterCenters()):
            rows.append((mi, j, [float(x) for x in c]))
    sample.unpersist()
    return emb.sparkSession.createDataFrame(rows, ["m", "j", "c"]).select(
        "m", "j", F.col("c").cast("array<double>").alias("c")
    )


def encode_pq(emb: DataFrame, coarse: DataFrame, pq_cb: DataFrame) -> DataFrame:
    """One broadcast map pass -> the stored index (vec_id, cid, m, j)."""
    sub = F.slice(F.col("rv"), F.col("m") * F.size("c") + 1, F.size("c"))
    return (
        _residuals(emb, coarse)
        .crossJoin(F.broadcast(pq_cb))
        .select("vec_id", "cid", "m", "j", F.round(_l2sq(sub, F.col("c")), 6).alias("sd"))
        .groupBy("vec_id", "cid", "m")
        .agg(F.min(F.struct("sd", "j")).alias("best"))
        .select("vec_id", "cid", "m", F.col("best.j").alias("j"))
    )


def ivfpq_topk(emb: DataFrame, coarse: DataFrame, pq_cb: DataFrame,
               query_ids: DataFrame, k: int = 3, nprobe: int = 2,
               shortlist: int = 16) -> DataFrame:
    """Serve: nprobe lists -> ADC over codes -> exact-L2 rerank of the
    shortlist. Returns (qid, nid, rank, adc, l2)."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    scored = e.crossJoin(F.broadcast(coarse)).select(
        "vec_id", "v", "cid", "cv", F.round(_l2sq(F.col("v"), F.col("cv")), 6).alias("d2")
    )
    w = W.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
    ranked = scored.withColumn("r", F.row_number().over(w))

    codes = encode_pq(emb, coarse, pq_cb)
    lists = codes.select(F.col("vec_id").alias("nid"), "cid", "m", "j")

    probes = (
        ranked.join(F.broadcast(query_ids.select(F.col("qid").alias("vec_id"))), "vec_id")
        .filter(F.col("r") <= nprobe)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "cid", "cv")
    )
    # per-(query, probed list) residual lookup table — broadcast-sized:
    # queries x nprobe x PQ_M x PQ_K rows
    sub = F.slice(F.col("rq"), F.col("m") * F.size("c") + 1, F.size("c"))
    lut = (
        probes.select("qid", "cid", F.zip_with("qv", "cv", lambda x, y: x - y).alias("rq"))
        .crossJoin(F.broadcast(pq_cb))
        .select("qid", "cid", "m", "j", F.round(_l2sq(sub, F.col("c")), 6).alias("d"))
    )
    adc = (
        probes.select("qid", "cid").join(lists, "cid")
        .filter(F.col("qid") != F.col("nid"))
        .join(F.broadcast(lut), ["qid", "cid", "m", "j"])
        .groupBy("qid", "nid")
        .agg(F.round(F.sum("d"), 6).alias("adc"))
        .withColumn("sr", F.row_number().over(
            W.partitionBy("qid").orderBy(F.asc("adc"), F.asc("nid"))))
        .filter(F.col("sr") <= shortlist)
    )
    qv = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qvec"))
    nv = e.select(F.col("vec_id").alias("nid"), F.col("v").alias("nvec"))
    return (
        adc.join(qv, "qid").join(nv, "nid")
        .select("qid", "nid", "adc",
                F.round(_l2sq(F.col("qvec"), F.col("nvec")), 6).alias("l2"))
        .withColumn("rank", F.row_number().over(
            W.partitionBy("qid").orderBy(F.asc("l2"), F.asc("nid"))))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", F.round("adc", 4).alias("adc"),
                F.round("l2", 4).alias("l2"))
    )
