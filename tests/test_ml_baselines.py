"""Spark-ML baseline scorers (operators/ml_baselines.py): the WEKA
RandomForest baseline (tools/baseline/WEKABaseline.java:30-55) and the
regression-scorer path (scorer/LibSVMRegressionScorer.java /
tools/baseline/SVRSampleBaseline.java) re-expressed on Spark ML.

Gate: on the soccer fixture, the RF baseline trained on the train split
must land between the random baseline (below) and the trained linear
pipeline's parity gate (it need not reach 0.95) on held-out docs; the
regression scorer must produce centered scores that fill at least the
easy slots."""

import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.evaluator import triple_prf
from obiemachinelearningframework_spark.operators.features import build_pairs, compute_features
from obiemachinelearningframework_spark.operators.ml_baselines import (
    MLBaselineScorer,
    ml_baseline_fill,
)
from obiemachinelearningframework_spark.operators.trainer import label_pairs
from obiemachinelearningframework_spark.operators.triples import materialize_triples
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


@pytest.fixture(scope="module")
def setup(spark):
    c = generate_corpus("soccer", n_docs=50, seed=11)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    splits = spark.createDataFrame(c["splits"])
    gold = spark.createDataFrame(c["gold_triples"])

    def split_pairs(name):
        keys = splits.filter(F.col("split") == name).select("doc_key")
        si = inst.join(keys, "doc_key", "left_semi")
        mentions = pipe.mentions(si)
        roots, cands = pipe.roots_and_candidates(mentions)
        pairs = build_pairs(roots, cands, si).cache()
        feats = compute_features(pairs, c["ontology"])
        return si, pairs, feats

    _, tr_pairs, tr_feats = split_pairs("train")
    tr_labels = label_pairs(tr_pairs, gold)
    _, te_pairs, te_feats = split_pairs("test")
    te_gold = gold.join(
        splits.filter(F.col("split") == "test").select("doc_key"), "doc_key", "left_semi"
    ).cache()
    return {
        "c": c, "tr_feats": tr_feats, "tr_labels": tr_labels,
        "te_pairs": te_pairs, "te_feats": te_feats, "te_gold": te_gold,
    }


def test_rf_baseline_beats_chance(setup):
    scorer = MLBaselineScorer("rf", num_trees=30, max_depth=8).fit(
        setup["tr_feats"], setup["tr_labels"]
    )
    asg = ml_baseline_fill(setup["te_pairs"], scorer, setup["te_feats"], setup["c"]["ontology"])
    m = triple_prf(materialize_triples(asg), setup["te_gold"])
    # the RF is a baseline, not the parity pipeline: it must clearly beat
    # chance on held-out docs (fixture slots are highly learnable)
    assert m["f1"] >= 0.6, m


def test_regression_scorer_fills_slots(setup):
    scorer = MLBaselineScorer("reg").fit(setup["tr_feats"], setup["tr_labels"])
    asg = ml_baseline_fill(setup["te_pairs"], scorer, setup["te_feats"], setup["c"]["ontology"])
    m = triple_prf(materialize_triples(asg), setup["te_gold"])
    assert m["f1"] >= 0.5, m


def test_train_only_admission_at_transform(setup):
    """Features unseen in training must be dropped at score time (the
    InstanceCollection.java:44-50 admission): scoring the TEST features
    uses the TRAIN vocabulary, so every assembled vector has the train
    dimensionality."""
    scorer = MLBaselineScorer("reg").fit(setup["tr_feats"], setup["tr_labels"])
    scores = scorer.score(setup["te_feats"])
    assert scores.count() > 0
    assert set(scores.columns) == {"pair_id", "score"}
