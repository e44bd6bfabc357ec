"""End-to-end vertical slice (SURVEY.md §7 steps 1-6):
source -> mentions -> candidates -> high-frequency baseline -> triples,
evaluated by both the triple gate and the tree evaluator."""

import pytest

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.baseline import high_frequency_fill
from obiemachinelearningframework_spark.operators.candidates import generate_candidates, propose_roots
from obiemachinelearningframework_spark.operators.evaluator import micro_prf, tree_prf, triple_prf
from obiemachinelearningframework_spark.operators.mentions import detect_mentions, prepare_instances
from obiemachinelearningframework_spark.operators.states import assignments_to_nodes
from obiemachinelearningframework_spark.operators.triples import materialize_triples


@pytest.fixture(scope="module", params=["soccer", "disease"])
def slice_ctx(request, spark):
    domain = request.param
    c = generate_corpus(domain, n_docs=30, seed=42)
    inst = prepare_instances(spark.createDataFrame(c["source"]))
    mentions = detect_mentions(inst, c["ontology"]).cache()
    roots = propose_roots(mentions, c["ontology"]).cache()
    cands = generate_candidates(mentions, c["ontology"]).cache()
    return {"domain": domain, "corpus": c, "spark": spark,
            "instances": inst, "mentions": mentions, "roots": roots, "candidates": cands}


def test_roots_match_gold(slice_ctx):
    """Every gold root annotation must be proposed (recall 1.0 on roots,
    modulo the intentionally-unlinkable typo mentions in the disease domain)."""
    c = slice_ctx["corpus"]
    gold = c["gold_nodes"]
    gold_roots = gold[(gold.parent_node_id.isna()) & (gold.slot_name.isna())]
    n_gold = len(gold_roots)
    proposed = slice_ctx["roots"].count()
    assert proposed >= 0.9 * n_gold, f"{proposed} roots vs {n_gold} gold"


def test_candidate_recall(slice_ctx):
    """Evidence pruning must never prune a gold filler: for every gold slot
    node there must exist a candidate with the same (slot, obj)."""
    c = slice_ctx["corpus"]
    gold_t = c["gold_triples"]
    preds = set(c["ontology"].slots[c["ontology"].slots.owner_class_id == c["ontology"].root_class_id].slot_name)
    gold_slot_triples = gold_t[gold_t.pred.isin(preds)]
    cand = slice_ctx["candidates"].select("doc_key", "slot_name", "obj_id").toPandas()
    have = set(zip(cand.doc_key, cand.slot_name, cand.obj_id))
    missing = [
        t for t in gold_slot_triples.itertuples()
        if (t.doc_key, t.pred, t.obj) not in have
    ]
    # disease unseen-typo compounds are only reachable via fuzzy linking (later stage)
    tol = 0.1 if slice_ctx["domain"] == "disease" else 0.02
    assert len(missing) <= tol * len(gold_slot_triples), (
        f"{len(missing)}/{len(gold_slot_triples)} gold fillers have no candidate; e.g. {missing[:5]}"
    )


def test_baseline_sandwich(slice_ctx):
    """HighFrequencyBaseline must produce sane triples: recall above a floor
    (it picks the top candidate, which is often right on 1-root docs) and
    the evaluator must run end-to-end on its output."""
    c = slice_ctx["corpus"]
    spark = slice_ctx["spark"]
    assignments = high_frequency_fill(slice_ctx["roots"], slice_ctx["candidates"], slice_ctx["mentions"])
    triples = materialize_triples(assignments)
    gold = spark.createDataFrame(c["gold_triples"])
    m = triple_prf(triples, gold)
    # naive lower bound: no locality/association — same top filler for every
    # root — so precision is weak by design; the trained filler must beat it.
    assert m["recall"] > 0.25, m
    assert m["precision"] > 0.15, m

    pred_nodes = assignments_to_nodes(assignments, c["ontology"])
    gold_nodes = spark.createDataFrame(c["gold_nodes"])
    per_doc = tree_prf(pred_nodes, gold_nodes, c["ontology"])
    tm = micro_prf(per_doc)
    assert 0 < tm["f1"] <= 1.0, tm


def test_evaluator_gold_vs_gold(slice_ctx):
    """Identity: gold compared with itself must score F1 = 1.0 on both the
    triple gate and the tree evaluator."""
    c = slice_ctx["corpus"]
    spark = slice_ctx["spark"]
    gold_t = spark.createDataFrame(c["gold_triples"])
    assert triple_prf(gold_t, gold_t)["f1"] == 1.0
    gold_nodes = spark.createDataFrame(c["gold_nodes"])
    per_doc = tree_prf(gold_nodes, gold_nodes, c["ontology"])
    tm = micro_prf(per_doc)
    assert tm["f1"] == 1.0, tm
