"""Active-learning rankers + sequential AL distributor.

Re-creates the reference's ``activelearning/*.java`` ranker family and
``corpus/distributor/ActiveLearningDistributor.java:15-40`` (Lewis-style
sequential AL: each round, label the ``b`` least-certain unlabeled
documents). Every ranker is one aggregation over the scored candidate
pairs of the unlabeled pool — no per-doc loops:

* FullDocumentEntropyRanker (:20-60) — entropy of the softmax over the
  best-N state scores per document; here states = per-slot candidate
  rankings, so the per-doc entropy aggregates the per-slot candidate
  score distributions (N capped as in the reference).
* DocumentModelScoreRanker      — ascending best model score.
* DocumentVarianceRanker        — variance of candidate scores.
* DocumentMarginRanker          — best minus second-best score (small
                                  margin = uncertain).
* DocumentLengthRanker          — ascending content length.
* DocumentRandomRanker          — seeded hash order.

The objective-score ranker (needs gold on the unlabeled pool) is only
meaningful in simulation; ``rank_objective`` takes gold triples for that
use. Each ranker returns (doc_key, rank_score) where SMALLER = labeled
first, matching the reference's ascending-uncertainty pick.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W, functions as F

BEST_N = 20  # FullDocumentEntropyRanker best-N states cap


def rank_entropy(pairs_with_scores: DataFrame, best_n: int = BEST_N) -> DataFrame:
    """Negative softmax entropy over the best-N candidate scores per doc
    (most-uncertain-first => rank_score = -entropy)."""
    w = W.partitionBy("doc_key").orderBy(F.desc("score"))
    top = pairs_with_scores.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= best_n
    )
    mx = top.groupBy("doc_key").agg(F.max("score").alias("mx"))
    e = (
        top.join(mx, "doc_key")
        .withColumn("_e", F.exp(F.col("score") - F.col("mx")))
        .groupBy("doc_key")
        .agg(F.sum("_e").alias("z"), F.sum(F.col("_e") * (F.col("score") - F.col("mx"))).alias("es"))
    )
    # H = log Z - (1/Z) * sum p_i * logit_i  (logits shifted by max)
    ent = F.log("z") - F.col("es") / F.col("z")
    return e.select("doc_key", (-ent).alias("rank_score"))


def rank_model_score(pairs_with_scores: DataFrame) -> DataFrame:
    """Ascending best model score: weakest best-guess docs first."""
    return pairs_with_scores.groupBy("doc_key").agg(F.max("score").alias("rank_score"))


def rank_variance(pairs_with_scores: DataFrame) -> DataFrame:
    """Descending score variance => rank_score = -variance."""
    return pairs_with_scores.groupBy("doc_key").agg(
        (-F.coalesce(F.var_pop("score"), F.lit(0.0))).alias("rank_score")
    )


def rank_margin(pairs_with_scores: DataFrame) -> DataFrame:
    """Best minus second-best per (doc, root, slot), min over doc. A slot
    with a single candidate uses |top1| (distance from the 0 decision
    boundary) so single-candidate docs still rank instead of silently
    dropping out of the AL pool."""
    w = W.partitionBy("doc_key", "root_id", "slot_name").orderBy(F.desc("score"))
    ranked = pairs_with_scores.withColumn("_rn", F.row_number().over(w)).filter("_rn <= 2")
    margins = ranked.groupBy("doc_key", "root_id", "slot_name").agg(
        (F.max("score") - F.min("score")).alias("margin"),
        F.abs(F.max("score")).alias("abs_top1"),
        F.count("*").alias("n"),
    )
    per_slot = F.when(F.col("n") >= 2, F.col("margin")).otherwise(F.col("abs_top1"))
    return margins.groupBy("doc_key").agg(F.min(per_slot).alias("rank_score"))


def rank_length(instances: DataFrame) -> DataFrame:
    return instances.select("doc_key", F.length("content").cast("double").alias("rank_score"))


def rank_random(instances: DataFrame, seed: int = 100) -> DataFrame:
    return instances.select(
        "doc_key", F.xxhash64("doc_key", F.lit(seed)).cast("double").alias("rank_score")
    )


def rank_objective(per_doc_prf: DataFrame) -> DataFrame:
    """Simulation-only: ascending objective F1 (needs gold); input is the
    evaluator's per-doc (tp, fp, fn)."""
    f1 = (2.0 * F.col("tp")) / F.greatest(2.0 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1.0))
    return per_doc_prf.select("doc_key", f1.alias("rank_score"))


def rank_single_slot(pairs_with_scores: DataFrame) -> DataFrame:
    """SingleSlotModelScoreRanker (activelearning/SingleSlotModelScoreRanker
    .java): explore each slot under a single-slot InvestigationRestriction
    and rank by the WEAKEST slot's best model score — batched as max score
    per (doc, slot), then min over slots per doc (ascending = the doc whose
    hardest single slot is least confidently fillable is labeled first)."""
    per_slot = pairs_with_scores.groupBy("doc_key", "slot_name").agg(
        F.max("score").alias("best")
    )
    return per_slot.groupBy("doc_key").agg(F.min("best").alias("rank_score"))


def rank_rand_filler(instances: DataFrame, gold_triples: DataFrame,
                     roots: DataFrame, candidates: DataFrame,
                     n_trials: int = 10, seed: int = 100) -> DataFrame:
    """FullDocumentRandFillerRanker (activelearning/FullDocumentRandFiller
    Ranker.java:40-52): fill each document randomly n_trials times,
    evaluate against gold, rank by ascending mean F1 — documents where
    random guessing does WORST (hardest structure) are labeled first.
    Simulation-only (needs gold), like rank_objective."""
    from .baseline import random_fill
    from .triples import materialize_triples

    keys = ["doc_key", "subj", "pred", "obj"]
    g = gold_triples.select(*keys).dropDuplicates()
    n_gold = g.groupBy("doc_key").agg(F.count("*").alias("n_gold"))
    acc = None
    for t in range(n_trials):
        pred = materialize_triples(random_fill(roots, candidates, seed=seed + t))
        p = pred.select(*keys).dropDuplicates()
        tp = p.join(g, keys, "inner").groupBy("doc_key").agg(F.count("*").alias("tp"))
        np_ = p.groupBy("doc_key").agg(F.count("*").alias("n_pred"))
        f1 = (
            instances.select("doc_key")
            .join(np_, "doc_key", "left")
            .join(n_gold, "doc_key", "left")
            .join(tp, "doc_key", "left")
            .fillna({"tp": 0, "n_pred": 0, "n_gold": 0})
            .select(
                "doc_key",
                (2.0 * F.col("tp") / F.greatest(
                    F.col("n_pred") + F.col("n_gold"), F.lit(1)
                )).alias(f"f1_{t}"),
            )
        )
        acc = f1 if acc is None else acc.join(f1, "doc_key")
    mean = sum(F.col(f"f1_{t}") for t in range(n_trials)) / float(n_trials)
    return acc.select("doc_key", mean.alias("rank_score"))


RANKERS = {
    "entropy": rank_entropy,
    "model_score": rank_model_score,
    "variance": rank_variance,
    "margin": rank_margin,
    "single_slot": rank_single_slot,
}


def pick_batch(ranked: DataFrame, b: int) -> DataFrame:
    """The AL acquisition step: b smallest rank_scores (ties by doc_key).
    orderBy + limit, not a global window — sort-limit pushdown keeps the
    selection parallel (an un-partitioned row_number funnels the whole
    pool through one task)."""
    return ranked.orderBy(F.asc("rank_score"), F.asc("doc_key")).limit(b).select("doc_key")


def active_learning_rounds(
    pipeline,
    instances: DataFrame,
    gold_triples: DataFrame,
    seed_frac: float = 0.2,
    rounds: int = 2,
    batch: int = 4,
    ranker: str = "entropy",
    seed: int = 100,
) -> list[dict]:
    """Sequential AL simulation (ActiveLearningDistributor semantics):
    start from a seeded fraction, each round retrain on the labeled set,
    rank the unlabeled pool, move the b least-certain docs to labeled.
    Returns per-round bookkeeping (labeled count, pool count)."""
    spark = instances.sparkSession
    # seed selection stays distributed: rank every doc by a seeded hash and
    # keep the first ceil(frac*n) — no corpus-sized doc_key collect (the
    # driver only ever holds the per-round picked batch, which is b-sized)
    n_docs = instances.count()
    n_seed = max(1, int(math.ceil(n_docs * seed_frac)))
    # orderBy + limit, NOT a global row_number window: an un-partitioned
    # window funnels every doc_key through one task; sort-limit pushdown
    # keeps the top-n selection parallel (each partition keeps its local
    # top n_seed, the driver merges n_seed-sized heads)
    labeled_df = (
        instances.select("doc_key")
        .orderBy(F.xxhash64("doc_key", F.lit(seed)), F.asc("doc_key"))
        .limit(n_seed)
        .cache()
    )
    n_labeled = labeled_df.count()  # pins the cache
    history = []
    for rnd in range(rounds):
        train_inst = instances.join(labeled_df, "doc_key", "left_semi")
        pipeline.fit(train_inst, gold_triples)
        pool = instances.join(labeled_df, "doc_key", "left_anti")
        if pool.isEmpty():
            history.append({"round": rnd, "labeled": n_labeled, "pool": 0})
            break
        out = pipeline.predict(pool)
        # rank over the FULL scored candidate-pair table, not the accepted
        # assignments: a doc whose every candidate falls below threshold is
        # exactly the least-confident doc AL must label first, and it has
        # no assignment rows at all
        scored = out.get("scored_pairs", out["assignments"])
        ranked = (
            RANKERS[ranker](scored) if "score" in scored.columns else rank_random(pool, seed)
        )
        picked = {r.doc_key for r in pick_batch(ranked, batch).collect()}
        if not picked:  # ranker had no signal for any pool doc
            picked = set(r.doc_key for r in pool.select("doc_key").limit(batch).collect())
        picked_df = spark.createDataFrame([(k,) for k in sorted(picked)], ["doc_key"])
        new_labeled = labeled_df.unionByName(picked_df).distinct().cache()
        n_labeled = new_labeled.count()
        labeled_df.unpersist()
        labeled_df = new_labeled
        history.append({"round": rnd, "labeled": n_labeled,
                        "pool": int(pool.count()), "picked": sorted(picked)})
        # the picks are collected — free the mentions/pairs caches this
        # round's predict() pinned before the next round re-predicts
        pipeline.release_caches()
    labeled_df.unpersist()
    return history
