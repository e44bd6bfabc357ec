"""Domain C — code-entity extraction (the north rule's native payload):
the engine must be ontology-generic, so a THIRD fixture domain built from
source-code vocabulary (Module root; imports/calls individual lists;
paradigm class slot with siblings; loc datatype; auxiliary Release with
version + release_year) must clear the same P/R >= 0.95 triple gate as
the two reference domains, and the fused kernel must stay bit-equal to
the relational plan on it."""

import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.evaluator import triple_prf
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


@pytest.fixture(scope="module")
def trained_code(spark):
    c = generate_corpus("code", n_docs=80, seed=42)
    gold = spark.createDataFrame(c["gold_triples"])
    splits = spark.createDataFrame(c["splits"])
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    pipe.fit(inst, gold, splits)
    test_keys = splits.filter(F.col("split") == "test").select("doc_key")
    test_inst = inst.join(test_keys, "doc_key", "left_semi").cache()
    test_gold = gold.join(test_keys, "doc_key", "left_semi").cache()
    out = pipe.predict(test_inst)
    out["triples"] = out["triples"].cache()
    return {"pipe": pipe, "test_inst": test_inst, "test_gold": test_gold, "out": out}


def test_code_triple_parity_gate(trained_code):
    m = triple_prf(trained_code["out"]["triples"], trained_code["test_gold"])
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m


def test_code_fused_parity(trained_code):
    fused = trained_code["pipe"].predict_fused(trained_code["test_inst"])
    keys = ["doc_key", "subj", "pred", "obj"]
    rel = trained_code["out"]["triples"].select(*keys)
    diff = rel.exceptAll(fused.select(*keys)).count() + fused.select(*keys).exceptAll(rel).count()
    assert diff == 0, f"fused kernel diverges from relational plan by {diff} triples"


def test_code_aux_release_emitted(trained_code):
    """The auxiliary Release family (skolem roots + two datatype slots)
    must survive end to end — the slot-name-ordered skolem convention is
    what round-3 debugging pinned."""
    preds = {r.pred for r in trained_code["out"]["triples"].select("pred").distinct().collect()}
    assert {"releases", "version", "release_year"} <= preds
