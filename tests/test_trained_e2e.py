"""The BASELINE gate: trained pipeline must reach micro P >= 0.95 AND
R >= 0.95 on held-out test documents of both fixture domains."""

import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.evaluator import micro_prf, tree_prf, triple_prf
from obiemachinelearningframework_spark.operators.states import assignments_to_nodes
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


@pytest.fixture(scope="module", params=["soccer", "disease"])
def trained(request, spark):
    domain = request.param
    c = generate_corpus(domain, n_docs=80, seed=42)
    source = spark.createDataFrame(c["source"])
    gold_triples = spark.createDataFrame(c["gold_triples"])
    splits = spark.createDataFrame(c["splits"])
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(source).cache()
    pipe.fit(inst, gold_triples, splits)

    test_keys = splits.filter(F.col("split") == "test").select("doc_key")
    test_inst = inst.join(test_keys, "doc_key", "left_semi").cache()
    test_gold = gold_triples.join(test_keys, "doc_key", "left_semi").cache()
    out = pipe.predict(test_inst)
    out["assignments"] = out["assignments"].cache()
    out["triples"] = out["triples"].cache()
    return {"domain": domain, "corpus": c, "pipe": pipe, "instances": inst,
            "test_inst": test_inst, "test_gold": test_gold, "out": out, "spark": spark}


def test_triple_parity_gate(trained):
    m = triple_prf(trained["out"]["triples"], trained["test_gold"])
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m


def test_tree_evaluator_on_trained(trained):
    pred_nodes = assignments_to_nodes(trained["out"]["assignments"], trained["corpus"]["ontology"])
    gold_nodes = trained["spark"].createDataFrame(trained["corpus"]["gold_nodes"]).join(
        trained["test_inst"].select("doc_key"), "doc_key", "left_semi"
    )
    tm = micro_prf(tree_prf(pred_nodes, gold_nodes, trained["corpus"]["ontology"]))
    assert tm["f1"] >= 0.9, tm


def test_weights_roundtrip(trained, tmp_path):
    pipe = trained["pipe"]
    p = str(tmp_path / "weights.jsonl")
    pipe.save_weights(p)
    pipe2 = OBIEPipeline(trained["spark"], trained["corpus"]["ontology"]).load_weights(p)
    assert set(pipe2.thresholds) == set(pipe.thresholds)
    for k, v in pipe.thresholds.items():
        assert pipe2.thresholds[k] == pytest.approx(v, abs=1e-12)
    w1 = pipe.weights.sort_values("feature").reset_index(drop=True)
    w2 = pipe2.weights.sort_values("feature").reset_index(drop=True)
    assert (w1.feature == w2.feature).all()
    assert ((w1.weight - w2.weight).abs() < 1e-9).all()
