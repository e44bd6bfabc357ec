"""Greedy slot filling (test-time inference, one-shot path).

The reference's test-time sampler is greedy-model sampling with strict
accept (``run/AbstractOBIERunner.java:455-462``; strategies
``run/param/RunParameter.java:79-81``): per step the explorer proposes all
fillers for a slot (plus the null filler), the scorer ranks them, the best
is kept iff it improves the state. With a linear scorer the slots
decompose, so the fixed point of that loop is computable in one shot:
per (doc, root, slot) keep the top-scoring candidate(s) above the
calibrated null threshold — a window rank, no iteration. ``beam.py``
implements the literal iterative loop (checkpointed/resumable) and the
two are asserted equivalent in tests.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window as W, functions as F

from .features import build_pairs, compute_features, score_pairs

ASSIGNMENT_COLS = [
    "doc_key", "root_id", "root_class_id", "anchor_individual_id",
    "slot_name", "slot_kind", "class_id", "individual_id", "dt_value",
    "obj_id", "aux_values", "score", "text", "onset",
]


def scored_pairs(roots: DataFrame, candidates: DataFrame, instances: DataFrame,
                 weights_df: DataFrame, ontology=None, kb_triples: DataFrame | None = None,
                 cache_registry: list | None = None,
                 hashed_dim: int | None = None,
                 ds_context=None) -> DataFrame:
    # pairs feeds both the feature pass and the final join-back: cache so
    # the window-heavy build_pairs subtree is evaluated once. The handle is
    # recorded in cache_registry (when given) so the CALLER can unpersist
    # once its outputs are materialized — otherwise every invocation pins a
    # pairs-sized cache for the session lifetime.
    pairs = build_pairs(roots, candidates, instances).cache()
    if cache_registry is not None:
        cache_registry.append(pairs)
    feats = compute_features(pairs, ontology, kb_triples=kb_triples, ds_context=ds_context)
    if hashed_dim:
        # feature-hashed model: map names into the bucket space the model
        # was trained in (same one-line transform as at fit time), then the
        # identical broadcast-join scorer
        from .trainer import hash_feature_names

        feats = hash_feature_names(feats, hashed_dim)
    scores = score_pairs(feats, weights_df)
    # join back on (doc_key, pair_id): both sides carry the doc_key
    # clustering, so this is a co-partitioned join — no exchange
    return pairs.join(scores, ["doc_key", "pair_id"], "left").fillna({"score": 0.0})


def greedy_fill(pairs_with_scores: DataFrame, ontology, thresholds: dict) -> DataFrame:
    """Top-k per (doc, root, slot) above the slot threshold; k = 1 for
    single-valued slots, max_cardinality for list slots (the reference's
    cardinality caps, RunParameter.java:251-272)."""
    root_cls = ontology.root_class_id
    srows = ontology.slots[ontology.slots.owner_class_id == root_cls]
    card = {r.slot_name: (int(r.max_cardinality) if r.is_list else 1) for r in srows.itertuples()}
    card_map = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in card.items()))
    th_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(float(thresholds.get(k, 0.0)))) for k in card)
    )

    p = pairs_with_scores.withColumn("_card", card_map[F.col("slot_name")]).withColumn(
        "_th", F.coalesce(th_map[F.col("slot_name")], F.lit(0.0))
    )
    # best occurrence per distinct filler object first …
    w_obj = W.partitionBy("doc_key", "root_id", "slot_name", "obj_id").orderBy(
        F.desc("score"), F.asc("onset")
    )
    p = p.withColumn("_ro", F.row_number().over(w_obj)).filter("_ro = 1")
    # … then rank distinct fillers within the slot
    w_slot = W.partitionBy("doc_key", "root_id", "slot_name").orderBy(
        F.desc("score"), F.asc("onset"), F.asc("obj_id")
    )
    p = p.withColumn("_rn", F.row_number().over(w_slot))
    accepted = p.filter((F.col("_rn") <= F.col("_card")) & (F.col("score") > F.col("_th")))
    return accepted.select(*ASSIGNMENT_COLS)
