"""Iterative beam-search slot filling — the reference sampler loop, batched.

Re-creates the DefaultSampler explorer loop (wired at
``run/AbstractOBIERunner.java:267-310``; test-time strategies = greedy
model sampling + strict model accept, ``run/param/RunParameter.java:79-81``)
as a driver-orchestrated sequence of DataFrame iterations over ALL
documents at once:

    for each sweep:                      # sampling steps
      for each slot in exploration order:     # explorer per step
        propose  = top-k candidates per (doc, root, slot)   # explorer
        accept   = keep proposal iff slot score-sum improves # strict accept
        state    = (state - slot) ∪ accepted                 # next state
      stop when a full sweep changes nothing   # StopAtRepeatedModelScore
                                               # (stopcrit/sampling/...:20-39)

Each iteration optionally checkpoints through the stage catalog, so an
interrupted run resumes from the last committed iteration with identical
results (idempotence = deterministic proposals + manifest-gated commits).

With a linear scorer the slots decompose and this loop converges to the
same fixed point as ``filler.greedy_fill`` (asserted in tests); the loop
form exists because it is the faithful execution shape — a non-linear
scorer or cross-slot features drop in without changing the driver logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .filler import ASSIGNMENT_COLS


def _propose_slot(pairs_with_scores: DataFrame, slot: str, card: int, threshold: float) -> DataFrame:
    p = pairs_with_scores.filter(F.col("slot_name") == slot)
    w_obj = W.partitionBy("doc_key", "root_id", "obj_id").orderBy(F.desc("score"), F.asc("onset"))
    p = p.withColumn("_ro", F.row_number().over(w_obj)).filter("_ro = 1")
    w_slot = W.partitionBy("doc_key", "root_id").orderBy(F.desc("score"), F.asc("onset"), F.asc("obj_id"))
    p = p.withColumn("_rn", F.row_number().over(w_slot))
    return p.filter((F.col("_rn") <= card) & (F.col("score") > threshold)).select(*ASSIGNMENT_COLS)


def beam_fill(
    pairs_with_scores: DataFrame,
    ontology,
    thresholds: dict,
    checkpointer=None,
    max_sweeps: int = 4,
) -> DataFrame:
    """Iterative strict-accept slot sweep; returns the converged assignment
    state (same schema as greedy_fill)."""
    spark = pairs_with_scores.sparkSession
    root_cls = ontology.root_class_id
    srows = ontology.slots[ontology.slots.owner_class_id == root_cls]
    card = {r.slot_name: (int(r.max_cardinality) if r.is_list else 1) for r in srows.itertuples()}

    state = spark.createDataFrame([], pairs_with_scores.select(*ASSIGNMENT_COLS).schema)
    pairs_with_scores = pairs_with_scores.cache()

    for sweep in range(max_sweeps):
        sweep_changed = 0
        for slot in ontology.slot_order:
            stage = f"beam_s{sweep}_{slot}"
            if checkpointer is not None and checkpointer.exists(stage):
                state = checkpointer.read(stage)
                continue

            proposal = _propose_slot(
                pairs_with_scores, slot, card[slot], float(thresholds.get(slot, 0.0))
            )
            old_slot = state.filter(F.col("slot_name") == slot)

            # strict accept per (doc, root): keep the proposal only if its
            # slot score-sum beats the current state's
            new_sum = proposal.groupBy("doc_key", "root_id").agg(F.sum("score").alias("new_sum"))
            old_sum = old_slot.groupBy("doc_key", "root_id").agg(F.sum("score").alias("old_sum"))
            verdict = new_sum.join(old_sum, ["doc_key", "root_id"], "full_outer").select(
                "doc_key", "root_id",
                (F.coalesce("new_sum", F.lit(float("-inf"))) > F.coalesce("old_sum", F.lit(float("-inf"))))
                .alias("take_new"),
            )
            accepted = proposal.join(
                verdict.filter("take_new").select("doc_key", "root_id"),
                ["doc_key", "root_id"], "left_semi",
            )
            kept_old = old_slot.join(
                verdict.filter("take_new").select("doc_key", "root_id"),
                ["doc_key", "root_id"], "left_anti",
            )
            new_state = (
                state.filter(F.col("slot_name") != slot)
                .unionByName(accepted)
                .unionByName(kept_old)
            )

            # cut lineage FIRST: the state appears three times per iteration
            # (carry-over filter + accepted + kept-old), so an untruncated
            # plan tree grows 3^(sweeps*slots) and strangles the driver;
            # the convergence count below then runs on the truncated plan
            if checkpointer is not None:
                new_state = checkpointer.write(stage, new_state, meta={"sweep": sweep, "slot": slot})
            else:
                new_state = new_state.localCheckpoint()

            # convergence bookkeeping: did the slot's assignment set change?
            key = ["doc_key", "root_id", "slot_name", "obj_id"]
            changed = (
                new_state.filter(F.col("slot_name") == slot).select(*key)
                .exceptAll(old_slot.select(*key))
                .union(old_slot.select(*key).exceptAll(new_state.filter(F.col("slot_name") == slot).select(*key)))
                .count()
            )
            sweep_changed += changed
            if checkpointer is not None:
                checkpointer.log_metrics(stage, {"changed": changed})
            state = new_state

        if sweep_changed == 0:  # a full sweep with zero accepted changes
            break

    pairs_with_scores.unpersist()
    return state
