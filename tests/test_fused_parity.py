"""Fused kernel == relational plan, exactly.

The fused extraction kernel (operators/fused.py) re-implements the
per-document inference imperatively; this test pins it to the relational
path triple-for-triple on BOTH fixture domains, so any drift between the
two implementations fails CI rather than silently forking semantics."""

import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


@pytest.mark.parametrize("domain", ["soccer", "disease"])
def test_fused_matches_relational(spark, domain):
    # disease @ (60, 42) is the corpus test_linking proves to contain
    # unseen typos — it forces the fuzzy-linking path through both kernels
    n_docs, seed = (60, 42) if domain == "disease" else (40, 11)
    c = generate_corpus(domain, n_docs=n_docs, seed=seed)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"])).repartition(8, "doc_key").cache()
    gold = spark.createDataFrame(c["gold_triples"])
    pipe.fit(inst, gold)

    relational = (
        pipe.predict(inst)["triples"].select("doc_key", "subj", "pred", "obj").collect()
    )
    fused = pipe.predict_fused(inst).collect()

    r_set = {tuple(r) for r in relational}
    f_set = {tuple(r) for r in fused}
    only_r = sorted(r_set - f_set)[:10]
    only_f = sorted(f_set - r_set)[:10]
    assert r_set == f_set, (
        f"{domain}: relational-only={only_r} fused-only={only_f} "
        f"(|rel|={len(r_set)} |fused|={len(f_set)})"
    )
    assert len(r_set) > 0

    if domain == "disease":
        # the disease fixture contains unseen typos — make sure the parity
        # above actually exercised the fuzzy-linking code path (the python
        # link map must agree with linking.build_link_map, not be empty)
        from obiemachinelearningframework_spark.operators.fused import (
            py_link_map,
            unknown_vocabulary_df,
        )

        vocab = [r["text"] for r in unknown_vocabulary_df(inst, c["ontology"]).collect()]
        assert py_link_map(vocab, c["ontology"]), "fuzzy linking not exercised"


def test_fused_matches_relational_with_kb(spark):
    """KB feature family parity: with a prior-KB triples table attached
    (membership flag + datatype median/dev stats), both paths must still
    emit identical triples."""
    c = generate_corpus("soccer", n_docs=30, seed=13)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"])).repartition(8, "doc_key").cache()
    gold = spark.createDataFrame(c["gold_triples"])
    pipe.fit(inst, gold)
    kb = gold.limit(200)  # a prior KB: an earlier run's (partial) output

    relational = (
        pipe.predict(inst, kb_triples=kb)["triples"]
        .select("doc_key", "subj", "pred", "obj").collect()
    )
    fused = pipe.predict_fused(inst, kb_triples=kb).collect()
    r_set = {tuple(r) for r in relational}
    f_set = {tuple(r) for r in fused}
    assert r_set == f_set and len(r_set) > 0, (
        f"kb-parity broke: rel-only={sorted(r_set - f_set)[:5]} "
        f"fused-only={sorted(f_set - r_set)[:5]}"
    )


def test_fused_distributed_link_map_parity(spark, monkeypatch):
    """Force the fused kernel's DISTRIBUTED link-map branch (the large-
    vocabulary path) and pin parity with the relational plan on the
    disease domain (which contains unseen typos)."""
    from obiemachinelearningframework_spark.operators import fused as Fz

    monkeypatch.setattr(Fz, "LINK_MAP_DRIVER_MAX", 0)
    c = generate_corpus("disease", n_docs=40, seed=42)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"])).repartition(8, "doc_key").cache()
    pipe.fit(inst, spark.createDataFrame(c["gold_triples"]))
    relational = pipe.predict(inst)["triples"].select("doc_key", "subj", "pred", "obj").collect()
    fused = pipe.predict_fused(inst).collect()
    r_set, f_set = {tuple(r) for r in relational}, {tuple(r) for r in fused}
    assert r_set == f_set and len(r_set) > 0
