"""Distributed trainer path: no corpus-sized driver collect, same gate.

``train_weights_distributed`` (Spark ML L-BFGS over executor-assembled
sparse vectors + window-based threshold calibration) must reach the same
P/R >= 0.95 triple-parity gate as the numpy path on the soccer fixture,
and its threshold table must cover the same slots.
"""

import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.evaluator import triple_prf
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


@pytest.fixture(scope="module")
def trained_dist(spark):
    c = generate_corpus("soccer", n_docs=60, seed=42)
    source = spark.createDataFrame(c["source"])
    gold_triples = spark.createDataFrame(c["gold_triples"])
    splits = spark.createDataFrame(c["splits"])
    pipe = OBIEPipeline(spark, c["ontology"], trainer="distributed")
    inst = pipe.prepare(source).cache()
    pipe.fit(inst, gold_triples, splits)
    test_keys = splits.filter(F.col("split") == "test").select("doc_key")
    test_inst = inst.join(test_keys, "doc_key", "left_semi").cache()
    test_gold = gold_triples.join(test_keys, "doc_key", "left_semi").cache()
    out = pipe.predict(test_inst)
    return {"pipe": pipe, "out": out, "test_gold": test_gold, "ontology": c["ontology"]}


def test_distributed_parity_gate(trained_dist):
    m = triple_prf(trained_dist["out"]["triples"], trained_dist["test_gold"])
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m


def test_distributed_thresholds_cover_slots(trained_dist):
    ont = trained_dist["ontology"]
    slots = set(ont.slots[ont.slots.owner_class_id == ont.root_class_id].slot_name)
    assert slots.issubset(set(trained_dist["pipe"].thresholds))
