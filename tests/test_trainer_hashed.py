"""Feature-hashed trainer: no driver collect of the feature VOCABULARY.

Round-2 verdict (What's wrong #3): ``assemble_vectors`` collects the
distinct training features to the driver — corpus-vocabulary-bounded once
the bow/bigram/char-3-gram families run over a large training split. The
hashing path (``train_weights_hashed``) replaces the named vocabulary with
signed crc32 hashing: the only driver-sized object is the model itself,
hard-bounded by ``n_buckets``. Pinned here:

* cross-runtime hash agreement — Spark's ``F.crc32`` (JVM, used at fit
  and relational-scoring time) and Python's ``zlib.crc32`` (used by the
  fused kernel's ``HashedWeights``) must map every feature name to the
  same signed bucket;
* the full pipeline with ``trainer='hashed'`` still meets the P/R >= 0.95
  triple-parity gate, and the fused path agrees with the relational path
  triple-for-triple (hashing flows through both scorers identically);
* a synthetic >10^5-distinct-feature table trains with a model hard-
  bounded by n_buckets (collision regime exercised with tiny buckets);
* model save/load round-trips the hashed representation.
"""

import zlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.evaluator import triple_prf
from obiemachinelearningframework_spark.operators.trainer import (
    HASHED_DIM_FEATURE,
    HASHED_PREFIX,
    THRESHOLD_PREFIX,
    hash_feature_names,
    hashed_dim,
    train_weights_hashed,
)
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


def _py_bucket(name: str, dim: int) -> tuple[str, float]:
    b = name.encode("utf-8")
    sign = 1.0 if zlib.crc32(b + b"#") % 2 == 1 else -1.0
    return f"{HASHED_PREFIX}{zlib.crc32(b) % dim}", sign


def test_spark_and_python_hash_agree(spark):
    names = [
        "bias[team]", "bow[team]=fc", "c3g[name]=#na", "ib[born]=in",
        "strsim>=0.9[team]", "filler[team]=Team", "dist[born]=2",
        "unicode[x]=naïve", "ctx_l1[team]=für",
    ]
    dim = 509  # prime, forces non-trivial mod behavior
    df = spark.createDataFrame(
        [("d", "p", n, 1.0) for n in names],
        ["doc_key", "pair_id", "feature", "value"],
    )
    got = {
        r["feature_in"]: (r["feature"], r["value"])
        for r in hash_feature_names(df.withColumn("feature_in", F.col("feature")), dim)
        .select("feature_in", "feature", "value").collect()
    }
    for n in names:
        bucket, sign = _py_bucket(n, dim)
        assert got[n] == (bucket, sign), (n, got[n], bucket, sign)


@pytest.fixture(scope="module")
def trained_hashed(spark):
    c = generate_corpus("soccer", n_docs=60, seed=42)
    source = spark.createDataFrame(c["source"])
    gold_triples = spark.createDataFrame(c["gold_triples"])
    splits = spark.createDataFrame(c["splits"])
    pipe = OBIEPipeline(spark, c["ontology"], trainer="hashed")
    inst = pipe.prepare(source).cache()
    pipe.fit(inst, gold_triples, splits)
    test_keys = splits.filter(F.col("split") == "test").select("doc_key")
    test_inst = inst.join(test_keys, "doc_key", "left_semi").cache()
    test_gold = gold_triples.join(test_keys, "doc_key", "left_semi").cache()
    out = pipe.predict(test_inst)
    return {"pipe": pipe, "out": out, "test_inst": test_inst,
            "test_gold": test_gold, "ontology": c["ontology"]}


def test_hashed_parity_gate(trained_hashed):
    m = triple_prf(trained_hashed["out"]["triples"], trained_hashed["test_gold"])
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m


def test_hashed_model_shape(trained_hashed):
    w = trained_hashed["pipe"].weights
    dim = hashed_dim(w)
    assert dim and dim > 0
    real = w[
        ~w.feature.str.startswith(THRESHOLD_PREFIX) & (w.feature != HASHED_DIM_FEATURE)
    ]
    assert real.feature.str.startswith(HASHED_PREFIX).all()
    assert len(real) <= dim


def test_hashed_fused_matches_relational(trained_hashed):
    rel = {
        (r["subj"], r["pred"], r["obj"])
        for r in trained_hashed["out"]["triples"].select("subj", "pred", "obj").collect()
    }
    fused = {
        (r["subj"], r["pred"], r["obj"])
        for r in trained_hashed["pipe"].predict_fused(trained_hashed["test_inst"])
        .select("subj", "pred", "obj").collect()
    }
    assert rel == fused


def test_hashed_roundtrip(trained_hashed, tmp_path):
    pipe = trained_hashed["pipe"]
    p = str(tmp_path / "weights.jsonl")
    pipe.save_weights(p)
    pipe2 = OBIEPipeline(
        trained_hashed["out"]["triples"].sparkSession, trained_hashed["ontology"]
    ).load_weights(p)
    assert hashed_dim(pipe2.weights) == hashed_dim(pipe.weights)
    assert pipe2.thresholds == pytest.approx(pipe.thresholds)


def test_large_vocabulary_no_driver_vocab(spark):
    """>10^5 distinct features, n_buckets far below the vocabulary: the
    trainer must fit in the collision regime and the model stays hard-
    bounded by n_buckets (the named path would have pulled 120k strings
    through the driver)."""
    rng = np.random.RandomState(3)
    n_pairs, vocab = 3000, 120_000
    rows, labels = [], []
    for p in range(n_pairs):
        y = p % 2
        labels.append((f"d{p % 97}", f"p{p}", "s", float(y)))
        # one strongly predictive feature + unique noise features per pair
        rows.append((f"d{p % 97}", f"p{p}", f"signal={y}", 1.0))
        for j in range(3):
            rows.append(
                (f"d{p % 97}", f"p{p}", f"noise={rng.randint(vocab)}", 1.0)
            )
    # force >10^5 distinct names into the table (spread across pairs)
    extra = [(f"d{i % 97}", f"p{i % n_pairs}", f"noise={i}", 0.0) for i in range(vocab)]
    feats = spark.createDataFrame(
        pd.DataFrame(rows + extra, columns=["doc_key", "pair_id", "feature", "value"])
    )
    labs = spark.createDataFrame(
        pd.DataFrame(labels, columns=["doc_key", "pair_id", "slot_name", "label"])
    )
    assert feats.select("feature").distinct().count() > 100_000
    w = train_weights_hashed(feats, labs, n_buckets=4096)
    real = w[
        ~w.feature.str.startswith(THRESHOLD_PREFIX) & (w.feature != HASHED_DIM_FEATURE)
    ]
    assert len(real) <= 4096
    assert hashed_dim(w) == 4096
    # the signal feature must dominate: its signed bucket weight separates
    # the classes
    def margin_of(name):
        bucket, sign = _py_bucket(name, 4096)
        row = real[real.feature == bucket]
        return sign * float(row.weight.iloc[0]) if len(row) else 0.0

    assert margin_of("signal=1") > margin_of("signal=0")
