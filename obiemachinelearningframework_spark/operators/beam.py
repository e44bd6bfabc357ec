"""Iterative beam-search slot filling — the reference sampler loop, batched.

Re-creates the DefaultSampler explorer loop (wired at
``run/AbstractOBIERunner.java:267-310``; test-time strategies = greedy
model sampling + strict model accept, ``run/param/RunParameter.java:79-81``)
as a driver-orchestrated sequence of DataFrame iterations over ALL
documents at once:

    for each sweep:                              # sampling steps
      propose, for EVERY (doc, root, slot) at once:
        the top-k candidate set above the calibrated null threshold
      strict accept per (doc, root, slot) on the state VALUE
      stop when a full sweep changes nothing        # StopAtRepeatedModelScore
                                                    # (stopcrit/sampling/...:20-39)

**Proposal families.** The reference runs separate explorers —
SlotFillerExplorer (set/replace a filler, explicit null filler,
``:173-294``), SlotCardinalityExplorer (append / REMOVE one list element,
``:228-443``), TemplateCardinalityExplorer (add / REMOVE a root,
``:69-120``), and MergedCardinalityExplorer (their composition,
``explorer/MergedCardinalityExplorer.java:30-40`` — subsumed here because
one batched sweep already applies every family to every slot) — and the
greedy sampler accepts any proposal that improves the model score. With a linear scorer all of those proposals are totally
ordered by the slot-set VALUE

    value(S) = Σ_{e in S} (score(e) - threshold_slot)

where the per-slot calibrated threshold plays the null filler's score (an
empty slot is worth 0). The top-k-above-threshold set maximizes this
value, so ONE proposal per (doc, root, slot) dominates every
add/remove/replace/null variant the explorers would enumerate — including
element REMOVAL (an emptier set wins whenever a current element scores
below the threshold) and root removal (a root whose every slot empties
has no assignment rows and therefore no triples). Strict accept compares
value(proposal) > value(current); a seeded state (RANDOM / WRONG
initializers, ``variables/OBIEState.java:263-308``) with spurious
assignments is cleaned in the first sweep by exactly these removal
accepts — see tests/test_beam_checkpoint.py.

**Action diet.** One materialization per sweep (localCheckpoint or
checkpointed stage) plus one convergence count on the materialized
assignment-sized state — not per slot. The per-slot loop of the reference
collapses because slot proposals are independent given the pair scores.

Each sweep optionally checkpoints through the stage catalog, so an
interrupted run resumes from the last committed sweep with identical
results (idempotence = deterministic proposals + manifest-gated commits).

The fixed point equals ``filler.greedy_fill`` (asserted in tests); the
loop form exists because it is the faithful execution shape — a
non-linear scorer or cross-slot features drop in without changing the
driver logic.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window as W, functions as F

from .filler import ASSIGNMENT_COLS

_SLOT_KEY = ["doc_key", "root_id", "slot_name"]


def _logged_changed(checkpointer, stage: str):
    """Last logged 'changed' metric for a committed sweep (None if absent —
    the caller then conservatively keeps sweeping, which is idempotent)."""
    import json
    import os

    path = f"{checkpointer.base}/_metrics.jsonl"
    if not os.path.exists(path):
        return None
    last = None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("stage") == stage and "changed" in rec:
                last = rec["changed"]
    return last


def _slot_maps(ontology, thresholds):
    root_cls = ontology.root_class_id
    srows = ontology.slots[ontology.slots.owner_class_id == root_cls]
    card = {r.slot_name: (int(r.max_cardinality) if r.is_list else 1) for r in srows.itertuples()}
    card_map = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in card.items()))
    th_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(float(thresholds.get(k, 0.0)))) for k in card)
    )
    return card_map, th_map


def _propose_all(pairs_with_scores: DataFrame, card_map, th_map) -> DataFrame:
    """Dominant proposal per (doc, root, slot): best occurrence per distinct
    obj, rank distinct objs, keep top-card above the slot threshold —
    every slot in ONE plan (two windows on the same partitioning key)."""
    p = pairs_with_scores.withColumn("_card", card_map[F.col("slot_name")]).withColumn(
        "_th", F.coalesce(th_map[F.col("slot_name")], F.lit(0.0))
    )
    w_obj = W.partitionBy("doc_key", "root_id", "slot_name", "obj_id").orderBy(
        F.desc("score"), F.asc("onset")
    )
    p = p.withColumn("_ro", F.row_number().over(w_obj)).filter("_ro = 1")
    w_slot = W.partitionBy(*_SLOT_KEY).orderBy(F.desc("score"), F.asc("onset"), F.asc("obj_id"))
    p = p.withColumn("_rn", F.row_number().over(w_slot))
    return p.filter((F.col("_rn") <= F.col("_card")) & (F.col("score") > F.col("_th"))).select(
        *ASSIGNMENT_COLS
    )


def beam_fill(
    pairs_with_scores: DataFrame,
    ontology,
    thresholds: dict,
    checkpointer=None,
    max_sweeps: int = 4,
    initial_state: DataFrame | None = None,
) -> DataFrame:
    """Iterative strict-accept sweep; returns the converged assignment
    state (same schema as greedy_fill). ``initial_state`` seeds the loop
    with an existing assignment set (EMPTY when None; see
    ``states.init_state_*`` for RANDOM / WRONG / FULL_CORRECT seeds)."""
    spark = pairs_with_scores.sparkSession
    card_map, th_map = _slot_maps(ontology, thresholds)

    empty = spark.createDataFrame([], pairs_with_scores.select(*ASSIGNMENT_COLS).schema)
    state = initial_state.select(*ASSIGNMENT_COLS) if initial_state is not None else empty
    pairs_with_scores = pairs_with_scores.cache()
    proposal = _propose_all(pairs_with_scores, card_map, th_map)

    def slot_value(df):
        th = F.coalesce(th_map[F.col("slot_name")], F.lit(0.0))
        return df.groupBy(*_SLOT_KEY).agg(F.sum(F.col("score") - th).alias("val"))

    for sweep in range(max_sweeps):
        stage = f"beam_s{sweep}"
        if checkpointer is not None and checkpointer.exists(stage):
            state = checkpointer.read(stage)
            if _logged_changed(checkpointer, stage) == 0:
                break  # the committed run converged here — resume is a no-op
            continue

        # strict accept on the slot-set value; absent side = empty set = 0
        # (the null-filler / removal competitor)
        verdict = (
            slot_value(proposal).withColumnRenamed("val", "nv")
            .join(slot_value(state).withColumnRenamed("val", "ov"), _SLOT_KEY, "full_outer")
            .select(
                *_SLOT_KEY,
                (F.coalesce("nv", F.lit(0.0)) > F.coalesce("ov", F.lit(0.0))).alias("take_new"),
            )
        )
        take = verdict.filter("take_new").select(*_SLOT_KEY)
        accepted = proposal.join(take, _SLOT_KEY, "left_semi")
        kept_old = state.join(take, _SLOT_KEY, "left_anti")
        new_state = accepted.unionByName(kept_old)

        # ONE materialization per sweep: cut lineage (the state appears on
        # both sides of the accept join; an untruncated plan tree doubles
        # per sweep) and commit the stage if a checkpointer is attached
        if checkpointer is not None:
            new_state = checkpointer.write(stage, new_state, meta={"sweep": sweep})
        else:
            new_state = new_state.localCheckpoint()

        # ONE convergence action on the materialized assignment-sized
        # state: symmetric key-set difference via full-outer join
        key = ["doc_key", "root_id", "slot_name", "obj_id"]
        changed = (
            new_state.select(*key).withColumn("_n", F.lit(1))
            .join(state.select(*key).withColumn("_o", F.lit(1)), key, "full_outer")
            .filter(F.col("_n").isNull() | F.col("_o").isNull())
            .count()
        )
        if checkpointer is not None:
            checkpointer.log_metrics(stage, {"changed": changed})
        state = new_state
        if changed == 0:  # a full sweep with zero accepted changes
            break

    pairs_with_scores.unpersist()
    return state
