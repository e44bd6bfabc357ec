"""State <-> node-table conversion.

A search state in the reference is a set of root template annotations with
filled slots (``variables/OBIEState.java:48-58``). Our relational encoding
is an adjacency-list node table, the same shape as the gold fixtures:

    nodes(doc_key, ann_id, node_id, parent_node_id, slot_name,
          class_id, individual_id, dt_value, text)

Pure column operations — no UDF.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window as W, functions as F

from .filler import ASSIGNMENT_COLS


# ------------------------------------------------------ state initializers
#
# The reference seeds the sampler with EMPTY / RANDOM / WRONG /
# FULL_CORRECT states (``variables/OBIEState.java:263-308``,
# ``run/utils/SlotTemplateInstantiationUtils.java:44-76``). Relationally a
# seed is an assignment-row DataFrame handed to ``beam.beam_fill`` as
# ``initial_state``; all seeds draw from the candidate universe (the pair
# table), as the reference's explorers only ever assign candidate fillers.


def init_state_empty(spark, pairs_with_scores: DataFrame) -> DataFrame:
    """EMPTY: no annotations (the prediction default)."""
    return spark.createDataFrame([], pairs_with_scores.select(*ASSIGNMENT_COLS).schema)


def _pick_per_slot(pairs_with_scores: DataFrame, order_cols) -> DataFrame:
    w = W.partitionBy("doc_key", "root_id", "slot_name").orderBy(*order_cols)
    return (
        pairs_with_scores.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(*ASSIGNMENT_COLS)
    )


def init_state_random(pairs_with_scores: DataFrame, seed: int = 100) -> DataFrame:
    """RANDOM: one uniformly-chosen candidate per (doc, root, slot) —
    seeded hash order, deterministic (the reference's rndForSampling is
    unseeded; we pin, per SURVEY §4#8)."""
    h = F.xxhash64(F.lit(seed), "doc_key", "root_id", "slot_name", "obj_id", "onset")
    return _pick_per_slot(pairs_with_scores, [h.asc()])


def init_state_wrong(pairs_with_scores: DataFrame) -> DataFrame:
    """WRONG: the LOWEST-scoring candidate per (doc, root, slot) — the
    adversarial seed; beam_fill's removal/replace accepts must recover the
    greedy fixed point from it (tests/test_beam_checkpoint.py)."""
    return _pick_per_slot(
        pairs_with_scores, [F.asc("score"), F.desc("onset"), F.desc("obj_id")]
    )


def init_state_full_correct(pairs_with_scores: DataFrame, gold_triples: DataFrame) -> DataFrame:
    """FULL_CORRECT: candidate rows whose (root, slot, obj) is a gold
    triple — one row per gold assignment (earliest occurrence)."""
    g = gold_triples.select(
        "doc_key",
        F.col("subj").alias("root_id"),
        F.col("pred").alias("slot_name"),
        F.col("obj").alias("obj_id"),
    ).dropDuplicates()
    hit = pairs_with_scores.join(
        F.broadcast(g), ["doc_key", "root_id", "slot_name", "obj_id"], "left_semi"
    )
    w = W.partitionBy("doc_key", "root_id", "slot_name", "obj_id").orderBy("onset", "offset")
    return (
        hit.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").select(*ASSIGNMENT_COLS)
    )


_NODE_STRIDE = 4096  # id spacing between filler nodes: aux children get
                     # parent*stride + pos + 1, so an aux class may carry up
                     # to stride-1 child slots before ids collide (10 was too
                     # tight: a 10-child aux node overwrote the next filler)


def assignments_to_nodes(assignments: DataFrame, ontology) -> DataFrame:
    """Flattened slot assignments -> prediction node trees (evaluator input)."""
    wr = W.partitionBy("doc_key").orderBy("root_id")
    roots = (
        assignments.select("doc_key", "root_id", "root_class_id", "anchor_individual_id")
        .distinct()
        .withColumn("ann_id", F.dense_rank().over(wr) - 1)
    )
    grounded = F.col("root_id") == F.col("anchor_individual_id")
    root_nodes = roots.select(
        "doc_key",
        "ann_id",
        F.lit(0).alias("node_id"),
        F.lit(None).cast("int").alias("parent_node_id"),
        F.lit(None).cast("string").alias("slot_name"),
        F.col("root_class_id").alias("class_id"),
        F.when(grounded, F.col("anchor_individual_id")).otherwise(F.lit(None)).alias("individual_id"),
        F.lit(None).cast("string").alias("dt_value"),
        F.lit(None).cast("string").alias("text"),
    )

    wa = W.partitionBy("doc_key", "root_id").orderBy("slot_name", "obj_id")
    a = (
        assignments.join(roots.select("doc_key", "root_id", "ann_id"), ["doc_key", "root_id"])
        .withColumn("_rn", F.row_number().over(wa))
    )
    filler_nodes = a.select(
        "doc_key",
        "ann_id",
        (F.col("_rn") * _NODE_STRIDE).alias("node_id"),
        F.lit(0).alias("parent_node_id"),
        "slot_name",
        "class_id",
        "individual_id",
        "dt_value",
        "text",
    )

    # auxiliary fillers: child datatype nodes under the aux node
    child_range = {
        r.slot_name: r.range_class_id
        for r in ontology.slots.itertuples()
        if r.owner_class_id in set(ontology.classes[ontology.classes.is_auxiliary].class_id)
    }
    if child_range:
        range_map = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in child_range.items()))
        aux_children = (
            a.filter(F.col("slot_kind") == "aux")
            .select("doc_key", "ann_id", "_rn", F.posexplode("aux_values").alias("pos", "child_slot", "child_value"))
            .select(
                "doc_key",
                "ann_id",
                (F.col("_rn") * _NODE_STRIDE + F.col("pos") + 1).alias("node_id"),
                (F.col("_rn") * _NODE_STRIDE).alias("parent_node_id"),
                F.col("child_slot").alias("slot_name"),
                range_map[F.col("child_slot")].alias("class_id"),
                F.lit(None).cast("string").alias("individual_id"),
                F.col("child_value").alias("dt_value"),
                F.lit(None).cast("string").alias("text"),
            )
        )
        filler_nodes = filler_nodes.unionByName(aux_children)

    return root_nodes.unionByName(filler_nodes)
