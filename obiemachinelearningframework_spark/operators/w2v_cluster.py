"""Word2Vec cluster feature templates (Spark ML-backed).

Re-creates the reference's embedding-cluster template family:

* ``templates/Word2VecClusterTemplate.java:166-212`` — cluster-ID features
  of an annotation's FIRST and LAST mention token and of the ±window
  context tokens, from a pre-trained word2vec clustering (the reference
  loads an external cluster file; here the clustering is TRAINED on the
  corpus with Spark ML, so the operator is self-contained).
* ``templates/SlotFillerClusterDistanceTemplate.java`` (docs ``:1-15``) —
  min/avg/max pairwise embedding distances between the fillers assigned to
  the same slot, binned (are this slot's fillers semantically close?).

Spark-first shape: ``pyspark.ml.feature.Word2Vec`` fits token vectors on
the tokenized corpus (one distributed job, model-sized output);
``pyspark.ml.clustering.KMeans`` clusters the vocabulary (vocabulary-sized
input). The resulting ``(token, cluster)`` map is broadcast and joined
onto mention tokens — feature emission is a plain projection, exactly like
every other template family. At 100 TB the Word2Vec fit runs on a sample
(embedding quality saturates long before the corpus does) and the
token->cluster map stays vocabulary-sized either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fit_token_clusters(instances: DataFrame, vector_size: int = 32, k: int = 16,
                       min_count: int = 2, seed: int = 7) -> DataFrame:
    """instances(doc_key, content) -> (token, cluster, vector).

    Word2Vec over whitespace/non-word tokenized, lowercased documents, then
    KMeans over the VOCABULARY vectors (vocabulary-sized, not corpus-sized).
    Deterministic in (corpus, seed)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import Word2Vec

    sents = instances.select(
        F.filter(F.split(F.lower("content"), r"\W+"), lambda t: F.length(t) >= 2).alias("words")
    )
    w2v = Word2Vec(
        vectorSize=vector_size, minCount=min_count, seed=seed,
        inputCol="words", outputCol="_vec", numPartitions=1, maxIter=1,
    )
    model = w2v.fit(sents)
    vecs = model.getVectors().withColumnRenamed("word", "token")  # (token, vector)
    km = KMeans(k=k, seed=seed, featuresCol="vector", predictionCol="cluster")
    kmodel = km.fit(vecs)
    return kmodel.transform(vecs).select("token", "cluster", "vector")


def w2v_cluster_features(pairs: DataFrame, clusters: DataFrame) -> DataFrame:
    """(pair_id, slot_name, text, _l_raw, _r_raw) x broadcast
    (token, cluster) -> long-format cluster-ID features:

        w2v_first[slot]=<c>   cluster of the mention's first token
        w2v_last[slot]=<c>    cluster of the mention's last token
        w2v_ctx[slot]=<c>     cluster of each ±1 context token

    ``_l_raw``/``_r_raw`` are the bounded context slices ``build_pairs``
    already carries. Tokens absent from the cluster map (rare tokens) emit
    nothing, like the reference's cluster-file misses."""
    cmap = F.broadcast(clusters.select("token", "cluster"))
    toks = pairs.select(
        "pair_id", "slot_name",
        F.filter(F.split(F.lower("text"), r"\W+"), lambda t: F.length(t) >= 1).alias("_mt"),
        F.lower(F.coalesce("_l_raw", F.lit(""))).alias("_lc"),
        F.lower(F.coalesce("_r_raw", F.lit(""))).alias("_rc"),
    ).select(
        "pair_id", "slot_name",
        F.try_element_at("_mt", F.lit(1)).alias("first_tok"),
        F.try_element_at("_mt", F.lit(-1)).alias("last_tok"),
        F.try_element_at(F.filter(F.split("_lc", r"\W+"), lambda t: F.length(t) >= 1), F.lit(-1)).alias("l1"),
        F.try_element_at(F.filter(F.split("_rc", r"\W+"), lambda t: F.length(t) >= 1), F.lit(1)).alias("r1"),
    )
    outs = []
    for col, name in (("first_tok", "w2v_first"), ("last_tok", "w2v_last"),
                      ("l1", "w2v_ctx"), ("r1", "w2v_ctx")):
        outs.append(
            toks.select("pair_id", "slot_name", F.col(col).alias("token"))
            .filter(F.col("token").isNotNull() & (F.col("token") != ""))
            .join(cmap, "token")
            .select(
                "pair_id",
                F.concat(F.lit(f"{name}["), F.col("slot_name"), F.lit("]="),
                         F.col("cluster")).alias("feature"),
                F.lit(1.0).alias("value"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    # duplicate context emissions collapse like the reference's feature set
    return res.groupBy("pair_id", "feature").agg(F.max("value").alias("value"))


DIST_BINS = (0.1, 0.25, 0.5, 1.0)


def slot_filler_cluster_distance_features(assignments: DataFrame,
                                          clusters: DataFrame) -> DataFrame:
    """(doc_key, root_id, slot_name, text) x (token, vector) -> per
    (root, slot) binned min/avg/max pairwise cosine distances between the
    slot's filler embeddings (first mention token), the
    SlotFillerClusterDistanceTemplate signal: fillers of one slot should be
    semantically homogeneous. Slots with < 2 embedded fillers emit nothing
    (the reference emits no factor for singleton scopes)."""
    from pyspark.ml.functions import vector_to_array

    first_tok = F.try_element_at(
        F.filter(F.split(F.lower("text"), r"\W+"), lambda t: F.length(t) >= 1), F.lit(1)
    )
    # filler identity for pairing: obj_id when the assignments table carries
    # it, else the full filler text — never the first token alone, so two
    # distinct fillers sharing a first token ("Manchester United" /
    # "Manchester City") still form a pair and a repeated token cannot
    # double-count
    fid = F.col("obj_id") if "obj_id" in assignments.columns else F.col("text")
    emb = (
        assignments.select(
            "doc_key", "root_id", "slot_name", fid.alias("_fid"), first_tok.alias("token")
        )
        .join(
            F.broadcast(
                clusters.select("token", vector_to_array("vector").alias("vec"))
            ),
            "token",
        )
    )
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_key") == F.col("b.doc_key"))
        & (F.col("a.root_id") == F.col("b.root_id"))
        & (F.col("a.slot_name") == F.col("b.slot_name"))
        & (F.col("a._fid") < F.col("b._fid")),
    )
    # JVM-side cosine distance: zip_with dot products, no Python UDF
    dot = F.aggregate(
        F.zip_with("a.vec", "b.vec", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.greatest(
            F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x), F.lit(1e-30)
        )
    )
    d = pairs.select(
        F.col("a.doc_key").alias("doc_key"), F.col("a.root_id").alias("root_id"),
        F.col("a.slot_name").alias("slot_name"),
        (F.lit(1.0) - dot / (norm("a.vec") * norm("b.vec"))).alias("dist"),
    )
    agg = d.groupBy("doc_key", "root_id", "slot_name").agg(
        F.min("dist").alias("dmin"), F.avg("dist").alias("davg"), F.max("dist").alias("dmax")
    )
    outs = []
    for col, name in (("dmin", "w2v_dist_min"), ("davg", "w2v_dist_avg"), ("dmax", "w2v_dist_max")):
        bin_expr = F.lit("ge1")
        for bnd in reversed(DIST_BINS):
            bin_expr = F.when(F.col(col) < bnd, F.lit(f"lt{bnd}")).otherwise(bin_expr)
        outs.append(
            agg.select(
                "doc_key", "root_id", "slot_name",
                F.concat(F.lit(f"{name}["), F.col("slot_name"), F.lit("]="), bin_expr).alias("feature"),
                F.lit(1.0).alias("value"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _smallest_range(lists):
    """Smallest [lo, hi] covering one element from each sorted list — the
    reference's exponential permute (DSSlotFillerClusterDistanceTemplate
    .java:129-142 minimizes max-min over the cartesian product) solved in
    O(N log k) with the classic k-pointer heap sweep. Returns (dist,
    avg_dist) with avg = dist // k (the reference's int division :137)."""
    import heapq

    k = len(lists)
    heap = [(lst[0], i, 0) for i, lst in enumerate(lists)]
    heapq.heapify(heap)
    hi = max(lst[0] for lst in lists)
    best = None
    while True:
        lo, i, j = heap[0]
        span = hi - lo
        if best is None or span < best:
            best = span
        if j + 1 == len(lists[i]):
            break
        nxt = lists[i][j + 1]
        heapq.heapreplace(heap, (nxt, i, j + 1))
        hi = max(hi, nxt)
    return best, best // k


DS_DIST_BOUNDS = (0, 50, 100, 200, 500)
DS_AVG_BOUNDS = (0, 10, 20, 30, 50, 100)


def ds_cluster_distance_features(assignments: DataFrame, mentions: DataFrame) -> DataFrame:
    """DSSlotFillerClusterDistanceTemplate (templates/
    DSSlotFillerClusterDistanceTemplate.java:104-186): per root, over the
    DISTINCT individuals assigned to its slots, the minimal char-span
    covering one NERL mention position of EACH individual (distant
    supervision: every mention of the filler counts, not just the assigned
    span), emitted as the reference's threshold features
    ``MIN DIST > {0,50,100,200,500}`` and ``MIN AVGDIST >
    {0,10,20,30,50,100}`` (avg = dist // k). Individuals with no mention
    rows are dropped; roots with < 2 embedded individuals emit nothing
    (the reference returns on positions.size() <= 1).

    Scale shape: the (root, individual) set is assignment-sized and the
    mention join is doc_key-prefixed; the per-(doc, root) python step sees
    only that root's filler positions (applyInPandas, Arrow-batched)."""
    import pandas as pd

    picked = (
        assignments.filter(F.col("individual_id").isNotNull())
        .select("doc_key", "root_id", "individual_id")
        .distinct()
    )
    pos = picked.join(
        mentions.filter(F.col("individual_id").isNotNull())
        .select("doc_key", "individual_id", "onset"),
        ["doc_key", "individual_id"],
    )

    def per_root(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_key, root_id = pdf.doc_key.iloc[0], pdf.root_id.iloc[0]
        lists = [
            sorted(g.onset.tolist())
            for _, g in pdf.groupby("individual_id")
        ]
        if len(lists) <= 1:
            return pd.DataFrame(columns=["doc_key", "root_id", "feature", "value"])
        dist, avg = _smallest_range(lists)
        rows = [
            (doc_key, root_id, f"ds_mindist>{b}", 1.0)
            for b in DS_DIST_BOUNDS if dist > b
        ] + [
            (doc_key, root_id, f"ds_minavgdist>{b}", 1.0)
            for b in DS_AVG_BOUNDS if avg > b
        ]
        return pd.DataFrame(rows, columns=["doc_key", "root_id", "feature", "value"])

    return pos.groupBy("doc_key", "root_id").applyInPandas(
        per_root, schema="doc_key string, root_id string, feature string, value double"
    )
