"""Evaluator variants (purity / strict NEL / per-slot), baselines, and
active-learning rankers."""

import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.baseline import high_frequency_fill, random_fill
from obiemachinelearningframework_spark.operators.evaluator import (
    per_slot_prf,
    purity,
    strict_nel_prf,
    triple_prf,
)
from obiemachinelearningframework_spark.operators.rankers import (
    RANKERS,
    pick_batch,
    rank_length,
    rank_random,
)
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


@pytest.fixture(scope="module")
def soccer(spark):
    c = generate_corpus("soccer", n_docs=24, seed=11)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    gold = spark.createDataFrame(c["gold_triples"]).cache()
    pipe.fit(inst, gold)
    out = pipe.predict(inst)
    mentions = out["mentions"].cache()
    roots, candidates = out["roots"].cache(), out["candidates"].cache()
    return {"c": c, "pipe": pipe, "inst": inst, "gold": gold, "out": out,
            "mentions": mentions, "roots": roots, "candidates": candidates,
            "spark": spark}


def test_purity_known_clustering(spark):
    # two clusters; cluster 1 pure, cluster 2 half-and-half
    clusters = spark.createDataFrame(
        [(1, "c1"), (2, "c1"), (3, "c2"), (4, "c2")], ["item_id", "cluster_id"])
    cats = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B")], ["item_id", "category_id"])
    m = purity(clusters, cats)
    # purity = (max(2)+max(1))/4 = 0.75 ; inverse = (max A=2, max B=1)/4 = 0.75
    assert m["purity"] == pytest.approx(0.75)
    assert m["inverse_purity"] == pytest.approx(0.75)
    assert m["f_purity"] == pytest.approx(0.75)


def test_strict_nel_identity(soccer):
    m = strict_nel_prf(soccer["mentions"], soccer["mentions"])
    assert m["precision"] == 1.0 and m["recall"] == 1.0


def test_strict_nel_half(spark):
    gold = spark.createDataFrame(
        [("d1", "class", "T", 0, 4), ("d1", "class", "T", 10, 14)],
        ["doc_key", "kind", "type_id", "onset", "offset"])
    pred = spark.createDataFrame(
        [("d1", "class", "T", 0, 4), ("d1", "class", "U", 10, 14)],
        ["doc_key", "kind", "type_id", "onset", "offset"])
    m = strict_nel_prf(pred, gold)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1


def test_per_slot_breakdown_sums_to_micro(soccer):
    triples = soccer["out"]["triples"]
    gold = soccer["gold"]
    micro = triple_prf(triples, gold)
    rows = per_slot_prf(triples, gold).collect()
    assert sum(r.tp for r in rows) == micro["tp"]
    assert sum(r.fp for r in rows) == micro["fp"]
    assert sum(r.fn for r in rows) == micro["fn"]
    for r in rows:
        assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0


def test_random_baseline_deterministic_and_below_trained(soccer):
    r1 = random_fill(soccer["roots"], soccer["candidates"], seed=100)
    r2 = random_fill(soccer["roots"], soccer["candidates"], seed=100)
    key = ["doc_key", "root_id", "slot_name", "obj_id"]
    assert r1.select(*key).exceptAll(r2.select(*key)).count() == 0
    # sandwich: trained F1 >= random-baseline F1 on the training corpus
    from obiemachinelearningframework_spark.operators.triples import materialize_triples

    rnd_triples = materialize_triples(r1.withColumn("score", F.lit(0.0)))
    f_rand = triple_prf(rnd_triples, soccer["gold"])["f1"]
    f_trained = triple_prf(soccer["out"]["triples"], soccer["gold"])["f1"]
    assert f_trained >= f_rand


def test_high_frequency_fill_runs(soccer):
    hf = high_frequency_fill(soccer["roots"], soccer["candidates"], soccer["mentions"])
    per_slot = hf.groupBy("doc_key", "root_id", "slot_name").count().collect()
    assert per_slot and all(r["count"] == 1 for r in per_slot)


def test_rankers_cover_pool(soccer):
    scored = soccer["out"]["assignments"]
    n_docs = scored.select("doc_key").distinct().count()
    for name, fn in RANKERS.items():
        r = fn(scored)
        assert r.columns == ["doc_key", "rank_score"], name
        assert r.count() <= n_docs and r.count() > 0, name
    picked = pick_batch(RANKERS["entropy"](scored), 3)
    assert picked.count() == 3


def test_rank_length_and_random(soccer):
    rl = rank_length(soccer["inst"])
    assert rl.count() == soccer["inst"].count()
    ra = rank_random(soccer["inst"], seed=1)
    rb = rank_random(soccer["inst"], seed=1)
    assert ra.exceptAll(rb).count() == 0


def test_kb_feature_family(soccer):
    from obiemachinelearningframework_spark.operators.features import build_pairs, compute_features

    pairs = build_pairs(soccer["roots"], soccer["candidates"], soccer["inst"])
    feats = compute_features(pairs, soccer["c"]["ontology"], kb_triples=soccer["gold"])
    kb = feats.filter(F.col("feature").startswith("kb[")).count()
    assert kb > 0
    # datatype median/dev stats family (KnowledgeBaseTemplate.java:600-669)
    kbstat = feats.filter(F.col("feature").startswith("kbstat_")).count()
    assert kbstat > 0
    assert feats.filter(F.col("feature").startswith("kbstat_within[")).count() > 0
    # without a KB both families are absent and the rest is identical
    base = compute_features(pairs, soccer["c"]["ontology"])
    assert base.filter(F.col("feature").startswith("kb")).count() == 0
    assert base.count() == feats.count() - kb - kbstat


def test_active_learning_loop(spark):
    from obiemachinelearningframework_spark.operators.rankers import active_learning_rounds

    c = generate_corpus("soccer", n_docs=12, seed=5)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    gold = spark.createDataFrame(c["gold_triples"])
    hist = active_learning_rounds(pipe, inst, gold, seed_frac=0.25, rounds=2, batch=3)
    assert len(hist) == 2
    assert hist[1]["labeled"] > hist[0]["labeled"] - 3  # grows by <= batch per round
    assert hist[0]["labeled"] >= 3


def test_rank_rand_filler(soccer):
    """FullDocumentRandFillerRanker: n random fills scored against gold,
    ascending mean F1 — deterministic for a fixed seed."""
    from obiemachinelearningframework_spark.operators.rankers import rank_rand_filler

    r1 = rank_rand_filler(
        soccer["inst"], soccer["gold"], soccer["roots"], soccer["candidates"],
        n_trials=3, seed=7,
    )
    assert r1.columns == ["doc_key", "rank_score"]
    rows = {r.doc_key: r.rank_score for r in r1.collect()}
    assert rows and all(0.0 <= v <= 1.0 for v in rows.values())
    r2 = rank_rand_filler(
        soccer["inst"], soccer["gold"], soccer["roots"], soccer["candidates"],
        n_trials=3, seed=7,
    )
    assert rows == {r.doc_key: r.rank_score for r in r2.collect()}
