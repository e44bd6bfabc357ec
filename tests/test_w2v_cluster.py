"""Word2Vec cluster template family (Spark ML-backed) + LibLinear trainer."""

from pyspark.ml.linalg import Vectors
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.operators.w2v_cluster import (
    fit_token_clusters,
    slot_filler_cluster_distance_features,
    w2v_cluster_features,
)


def test_fit_token_clusters_deterministic(spark):
    inst = spark.createDataFrame(
        [("d%d" % i, "alpha beta gamma delta alpha beta") for i in range(8)],
        ["doc_key", "content"],
    )
    c1 = {(r.token, r.cluster) for r in fit_token_clusters(inst, k=2).collect()}
    c2 = {(r.token, r.cluster) for r in fit_token_clusters(inst, k=2).collect()}
    assert c1 == c2 and len(c1) >= 3  # alpha/beta/gamma/delta (minCount=2 keeps repeats)
    assert {t for t, _ in c1} <= {"alpha", "beta", "gamma", "delta"}


def test_w2v_cluster_features_emission(spark):
    pairs = spark.createDataFrame(
        [("p1", "team", "Real Madrid", "plays for", "in the league"),
         ("p2", "team", "zzz", None, None)],
        ["pair_id", "slot_name", "text", "_l_raw", "_r_raw"],
    )
    clusters = spark.createDataFrame(
        [("real", 3), ("madrid", 5), ("for", 1), ("in", 2)], ["token", "cluster"]
    )
    out = {(r.pair_id, r.feature) for r in w2v_cluster_features(pairs, clusters).collect()}
    assert ("p1", "w2v_first[team]=3") in out      # first mention token 'real'
    assert ("p1", "w2v_last[team]=5") in out       # last mention token 'madrid'
    assert ("p1", "w2v_ctx[team]=1") in out        # left context l1 'for'
    assert ("p1", "w2v_ctx[team]=2") in out        # right context r1 'in'
    # 'zzz' is not in the cluster map -> no features for p2
    assert not any(p == "p2" for p, _ in out)


def test_slot_filler_cluster_distance_bins(spark):
    # two fillers with identical vectors -> dist 0 (lt0.1); one far vector
    clusters = spark.createDataFrame(
        [("aaa", 0, Vectors.dense([1.0, 0.0])),
         ("bbb", 0, Vectors.dense([1.0, 0.0])),
         ("ccc", 1, Vectors.dense([0.0, 1.0]))],
        ["token", "cluster", "vector"],
    )
    near = spark.createDataFrame(
        [("d1", "r1", "honours", "aaa cup"), ("d1", "r1", "honours", "bbb cup")],
        ["doc_key", "root_id", "slot_name", "text"],
    )
    feats = {r.feature for r in slot_filler_cluster_distance_features(near, clusters).collect()}
    assert feats == {
        "w2v_dist_min[honours]=lt0.1",
        "w2v_dist_avg[honours]=lt0.1",
        "w2v_dist_max[honours]=lt0.1",
    }
    far = spark.createDataFrame(
        [("d1", "r1", "honours", "aaa cup"), ("d1", "r1", "honours", "ccc cup")],
        ["doc_key", "root_id", "slot_name", "text"],
    )
    feats = {r.feature for r in slot_filler_cluster_distance_features(far, clusters).collect()}
    assert "w2v_dist_max[honours]=ge1" in feats    # orthogonal vectors: dist 1.0
    # singleton slots emit nothing
    single = spark.createDataFrame(
        [("d1", "r1", "team", "aaa")], ["doc_key", "root_id", "slot_name", "text"]
    )
    assert slot_filler_cluster_distance_features(single, clusters).count() == 0


def test_liblinear_trainer_contract(spark):
    """L1 path returns the same (feature, weight) + threshold contract and
    separates an obviously separable toy problem."""
    from obiemachinelearningframework_spark.operators.trainer import (
        THRESHOLD_PREFIX,
        train_weights_liblinear,
    )

    rows, labs = [], []
    for i in range(40):
        pid = f"p{i}"
        good = i % 2 == 0
        rows.append((pid, "sig[team]", 1.0 if good else 0.0))
        rows.append((pid, "bias[team]", 1.0))
        labs.append((pid, "team", 1.0 if good else 0.0))
    feats = spark.createDataFrame(rows, ["pair_id", "feature", "value"]).filter(F.col("value") > 0)
    labels = spark.createDataFrame(labs, ["pair_id", "slot_name", "label"])
    w = train_weights_liblinear(feats, labels)
    wmap = dict(zip(w.feature, w.weight))
    assert wmap["sig[team]"] > 0.0
    assert f"{THRESHOLD_PREFIX}[team]" in wmap
    # the calibrated threshold separates positives from negatives
    th = wmap[f"{THRESHOLD_PREFIX}[team]"]
    assert wmap["sig[team]"] + wmap.get("bias[team]", 0.0) > th >= wmap.get("bias[team]", 0.0) - 1e-9
