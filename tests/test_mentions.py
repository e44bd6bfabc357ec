import pandas as pd

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.mentions import detect_mentions, prepare_instances


def _mentions(spark, domain, n_docs=15):
    c = generate_corpus(domain, n_docs=n_docs, seed=42)
    src = spark.createDataFrame(c["source"])
    inst = prepare_instances(src)
    return c, inst, detect_mentions(inst, c["ontology"]).toPandas()


def test_sha256_invariant(spark):
    c = generate_corpus("soccer", n_docs=15, seed=42)
    inst = prepare_instances(spark.createDataFrame(c["source"])).select("doc_key", "sha256").toPandas()
    merged = inst.merge(c["source_sha"], on="doc_key", suffixes=("_spark", "_gold"))
    assert len(merged) == 15
    assert (merged.sha256_spark == merged.sha256_gold).all()


def test_gold_mention_recall_soccer(spark):
    """Every gold mention (with text) must be found by the NER layer at the
    exact onset with the right type — the corpus-builder consistency check
    of the reference (BigramCorpusProvider.java:216-261) as a test."""
    c, inst, men = _mentions(spark, "soccer")
    gold = c["gold_nodes"]
    gold = gold[gold.text.notna()]
    found = set(zip(men.doc_key, men.class_id, men.onset.astype(int)))
    missing = [
        (r.doc_key, r.class_id, r.onset)
        for r in gold.itertuples()
        if (r.doc_key, r.class_id, int(r.onset)) not in found
    ]
    assert not missing, f"{len(missing)} gold mentions not detected, e.g. {missing[:5]}"


def test_gold_mention_recall_disease(spark):
    c, inst, men = _mentions(spark, "disease")
    gold = c["gold_nodes"]
    gold = gold[gold.text.notna()]
    found = set(zip(men.doc_key, men.class_id, men.onset.astype(int)))
    # unseen-typo compound mentions are intentionally NOT dictionary-findable;
    # they go through the fuzzy-linking path instead. Everything else must hit.
    missing = [
        r for r in gold.itertuples()
        if (r.doc_key, r.class_id, int(r.onset)) not in found and not str(r.text).endswith("um")
    ]
    assert not missing, f"{len(missing)} gold mentions not detected"


def test_datatype_interpretation(spark):
    c, inst, men = _mentions(spark, "disease")
    gold = c["gold_nodes"]
    gold_dt = gold[gold.dt_value.notna()][["doc_key", "class_id", "onset", "dt_value"]]
    m = men[["doc_key", "class_id", "onset", "dt_value"]].copy()
    m.onset = m.onset.astype(int)
    gold_dt = gold_dt.copy()
    gold_dt.onset = gold_dt.onset.astype(int)
    j = gold_dt.merge(m, on=["doc_key", "class_id", "onset"], suffixes=("_gold", "_pred"))
    ok = j[j.dt_value_gold == j.dt_value_pred]
    assert len(ok) >= 0.99 * len(gold_dt), (
        f"normalization parity {len(ok)}/{len(gold_dt)}; "
        f"sample diffs:\n{j[j.dt_value_gold != j.dt_value_pred].head()}"
    )


def test_mentions_distributed_plan(spark):
    """The mention stage must not collect to the driver: plan contains a
    MapInPandas over the scan, no driver-side loop."""
    c = generate_corpus("soccer", n_docs=5, seed=42)
    inst = prepare_instances(spark.createDataFrame(c["source"]))
    men = detect_mentions(inst, c["ontology"])
    plan = men._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
