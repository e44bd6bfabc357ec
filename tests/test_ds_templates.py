"""Distant-supervision template modes (round-2 verdict, Missing #3):

* TokenContext DS mode (templates/TokenContextTemplate.java:157-232):
  context features fire at the positions of ALL NERL mentions of the
  assigned class/individual — relational join family (ctxds[...]) and the
  fused kernel's per-doc maps must agree feature-for-feature, and the
  trained ds_mode pipeline must hold the P/R gate with rel == fused;
* DSSlotFillerClusterDistanceTemplate (java:104-186): per-root minimal
  covering span over one mention position per assigned individual, with
  the heap sweep asserted equal to the reference's cartesian min on a
  hand-checked example.
"""

from collections import defaultdict

import pandas as pd
import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.evaluator import triple_prf
from obiemachinelearningframework_spark.operators.features import ds_token_context
from obiemachinelearningframework_spark.operators.fused import _ds_context_maps
from obiemachinelearningframework_spark.operators.w2v_cluster import (
    _smallest_range,
    ds_cluster_distance_features,
)
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


def test_ds_context_relational_matches_fused(spark):
    c = generate_corpus("soccer", n_docs=12, seed=5)
    pipe = OBIEPipeline(spark, c["ontology"], ds_mode=True)
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    mentions = pipe.mentions(inst).cache()

    rel = defaultdict(set)
    for r in ds_token_context(mentions, inst).collect():
        for f in r["ds_feats"]:
            rel[(r["doc_key"], r["ds_key"])].add(f)

    fused = defaultdict(set)
    rows = mentions.collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_key"]].append(r.asDict())
    for r in inst.select("doc_key", "content").collect():
        cls_map, ind_map = _ds_context_maps(by_doc[r["doc_key"]], r["content"])
        for cid, shapes in cls_map.items():
            for s in shapes:
                fused[(r["doc_key"], f"cls:{cid}")].add(f"ctxds[cls:{cid}]={s}")
        for iid, shapes in ind_map.items():
            for s in shapes:
                fused[(r["doc_key"], f"ind:{iid}")].add(f"ctxds[ind:{iid}]={s}")

    assert rel and dict(rel) == dict(fused)


@pytest.fixture(scope="module")
def trained_ds(spark):
    c = generate_corpus("soccer", n_docs=60, seed=42)
    splits = spark.createDataFrame(c["splits"])
    pipe = OBIEPipeline(spark, c["ontology"], ds_mode=True)
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    pipe.fit(inst, spark.createDataFrame(c["gold_triples"]), splits)
    test_keys = splits.filter(F.col("split") == "test").select("doc_key")
    test_inst = inst.join(test_keys, "doc_key", "left_semi").cache()
    test_gold = (
        spark.createDataFrame(c["gold_triples"]).join(test_keys, "doc_key", "left_semi").cache()
    )
    return {"pipe": pipe, "test_inst": test_inst, "test_gold": test_gold}


def test_ds_mode_parity_gate_and_fused(trained_ds):
    pipe = trained_ds["pipe"]
    # the trained model must actually contain DS features
    assert pipe.weights.feature.str.startswith("ctxds[").any()
    out = pipe.predict(trained_ds["test_inst"])
    m = triple_prf(out["triples"], trained_ds["test_gold"])
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m
    rel = {
        (r["subj"], r["pred"], r["obj"])
        for r in out["triples"].select("subj", "pred", "obj").collect()
    }
    fused = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.predict_fused(trained_ds["test_inst"])
        .select("subj", "pred", "obj").collect()
    }
    assert rel == fused


def test_smallest_range_matches_cartesian_min():
    from itertools import product

    lists = [[5, 120, 400], [80, 300], [90, 1000, 1100]]
    dist, avg = _smallest_range([sorted(x) for x in lists])
    brute = min(max(p) - min(p) for p in product(*lists))
    assert dist == brute == 40  # (80, 90, 120)
    assert avg == brute // 3


def test_ds_cluster_distance_features(spark):
    assignments = spark.createDataFrame(
        pd.DataFrame(
            [
                ("d1", "r1", "ind_a"), ("d1", "r1", "ind_b"),
                ("d1", "r2", "ind_a"),              # single filler -> no rows
                ("d2", "r3", "ind_a"), ("d2", "r3", "ind_c"),  # ind_c unseen
            ],
            columns=["doc_key", "root_id", "individual_id"],
        )
    )
    mentions = spark.createDataFrame(
        pd.DataFrame(
            [
                ("d1", "ind_a", 0), ("d1", "ind_a", 500), ("d1", "ind_b", 460),
                ("d2", "ind_a", 10),
            ],
            columns=["doc_key", "individual_id", "onset"],
        )
    )
    rows = ds_cluster_distance_features(assignments, mentions).collect()
    got = {(r["doc_key"], r["root_id"], r["feature"]) for r in rows}
    # d1/r1: best pick (500, 460) -> dist 40, avg 20
    expect = {
        ("d1", "r1", "ds_mindist>0"),
        ("d1", "r1", "ds_minavgdist>0"),
        ("d1", "r1", "ds_minavgdist>10"),
    }
    assert got == expect
    assert all(r["value"] == 1.0 for r in rows)
