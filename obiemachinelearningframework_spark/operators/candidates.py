"""Root-annotation + slot-candidate generation.

Re-creates the reference's candidate oracle
(``explorer/utils/ExplorationUtils.getCandidates``,
``explorer/utils/ExplorationUtils.java:382-566``) as a *data product*: the
callback that the explorers invoke per state becomes two DataFrames built
once per corpus from ``mentions`` x broadcast ontology tables, then reused
by every beam expansion:

  roots(doc_key, root_id, root_class_id, anchor_individual_id,
        onset, sent_idx, next_root_onset)
  candidates(doc_key, slot_name, slot_kind, class_id, individual_id,
             dt_value, obj_id, text, onset, offset, sent_idx, aux_values)

Semantics preserved:
* evidence pruning — a candidate exists ONLY where a text mention exists
  (inner joins; reference :487-489, :520-522 early pruning / retainAll);
* datatype candidates: one per DISTINCT semantic value per class
  (ontology mode, :476-505) — we keep the earliest-onset occurrence so
  locality features still have a position;
* individual candidates: one per grounded mention (:535-566);
* class candidates: subclass-closure of the slot range (:375-380),
  excluding the abstract parent;
* auxiliary classes (isAuxiliary, :62-110): instances are proposed by
  pairing their datatype-slot mentions within one sentence — the
  recursive SlotFillerExplorer descent collapsed one level (our
  ontologies bound auxiliary depth at 1, like the reference's examples).

Root proposal mirrors TemplateCardinalityExplorer (:69-120): one root per
distinct evidence individual of the root class; for root classes without
individuals, one root per distinct individual of a designated anchor slot
(the reference reaches the same set through EntityRecognitionExplorer
evidence filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

AUX_SEP = "::"


def _descendants(ontology, class_id: str) -> list[str]:
    return ontology.subclasses_of(class_id)


def is_differentiable_to_all_siblings(ontology, class_id: str, slot_supertype: str) -> bool:
    """``ExplorationUtils.isDifferentiableToAllSiblingClasses``
    (``explorer/utils/ExplorationUtils.java:709-761``): a class is
    differentiable iff it is not a datatype, its slot supertype is not
    auxiliary, it HAS direct siblings, and against EVERY sibling it owns at
    least one non-datatype slot the sibling lacks. Differentiable classes
    may be proposed without textual evidence — their slot structure alone
    identifies them."""
    cls = ontology.classes.set_index("class_id")
    if class_id not in cls.index:
        return False
    row = cls.loc[class_id]
    if bool(row.is_datatype):
        return False
    if slot_supertype in cls.index and bool(cls.loc[slot_supertype].is_auxiliary):
        return False
    parent = row.parent_class_id
    siblings = [
        c for c in cls[cls.parent_class_id == parent].index
        if c != class_id and parent is not None
    ]
    if not siblings:
        return False
    slots = ontology.slots
    my = set(slots[(slots.owner_class_id == class_id) & (~slots.is_datatype)].slot_name)
    for sib in siblings:
        sib_slots = set(slots[(slots.owner_class_id == sib) & (~slots.is_datatype)].slot_name)
        if not (my - sib_slots):
            return False
    return True


def propose_roots(mentions: DataFrame, ontology) -> DataFrame:
    """One root annotation per distinct grounding individual per document,
    anchored at its earliest mention; ``next_root_onset`` (the onset of the
    next root mention in discourse order) implements the discourse
    progression of SlotFillerExplorer.java:203-218 as a window column."""
    root_cls = ontology.root_class_id
    has_individuals = (ontology.individuals.class_id == root_cls).any()
    if has_individuals:
        anchor_classes = _descendants(ontology, root_cls)
        root_id_col = F.col("individual_id")
    else:
        anchor_slot = ontology.slot_order[0]
        srow = ontology.slots[ontology.slots.slot_name == anchor_slot].iloc[0]
        anchor_classes = _descendants(ontology, srow.range_class_id)
        root_id_col = F.concat_ws(
            AUX_SEP, F.lit(root_cls.lower()), F.col("doc_key"), F.col("individual_id")
        )

    m = mentions.filter(
        (F.col("kind") == "individual") & F.col("class_id").isin(anchor_classes)
    )
    # longest-match-wins: the auto-generated fuzzy patterns make name tails
    # optional ("Jonas(.?Varga)?"), so a shared first name matches several
    # individuals. A root mention strictly contained in a longer root
    # mention is a partial match of the wrong entity — suppress it (the
    # overlap filter of EntityRecognitionExplorer.java:169-187).
    #
    # Exact interval-containment via running-max windows, NOT a per-doc
    # O(m^2) self-join: span a is strictly contained iff some span b has
    # (b.onset < a.onset AND b.offset >= a.offset) — automatically longer —
    # or (b.onset == a.onset AND b.offset > a.offset). The first term is a
    # RANGE-frame max over earlier onsets; the second a per-onset max.
    w_prev = (
        W.partitionBy("doc_key")
        .orderBy("onset")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_same = W.partitionBy("doc_key", "onset")
    m = (
        m.withColumn("_max_off_prev", F.max("offset").over(w_prev))
        .withColumn("_max_off_same", F.max("offset").over(w_same))
        .filter(
            ~(
                (F.col("_max_off_prev").isNotNull() & (F.col("_max_off_prev") >= F.col("offset")))
                | (F.col("_max_off_same") > F.col("offset"))
            )
        )
        .drop("_max_off_prev", "_max_off_same")
    )
    first = (
        m.groupBy("doc_key", "individual_id")
        .agg(F.min("onset").alias("onset"))
        .join(m.select("doc_key", "individual_id", "onset", "offset", "sent_idx"),
              ["doc_key", "individual_id", "onset"])
        .dropDuplicates(["doc_key", "individual_id"])
    )
    roots = first.select(
        "doc_key",
        root_id_col.alias("root_id"),
        F.lit(root_cls).alias("root_class_id"),
        F.col("individual_id").alias("anchor_individual_id"),
        "onset", "offset", "sent_idx",
    )
    # root_id tie-break: two individuals anchored at the SAME onset (kept
    # ambiguous spans) would otherwise get nondeterministic lead() values —
    # and fused._doc_roots sorts by (onset, root_id)
    w = W.partitionBy("doc_key").orderBy("onset", "root_id")
    return roots.withColumn("next_root_onset", F.lead("onset").over(w))


def generate_candidates(mentions: DataFrame, ontology,
                        no_evidence_classes: frozenset = frozenset(),
                        restrict_slots: frozenset | None = None) -> DataFrame:
    """Per-document slot-filler candidates for every slot of the root class.

    ``no_evidence_classes`` — the reference's
    ``exploreClassesWithoutTextualEvidence`` whitelist: those classes (and
    classes differentiable to all their siblings,
    ``ExplorationUtils.java:405-416``) get ONE evidence-free candidate per
    document (onset = -1, no textual anchor) instead of per-mention
    candidates. ``restrict_slots`` — InvestigationRestriction
    (``variables/OBIEState.java:232-261``): only the listed slots are
    explored; None explores all."""
    root_cls = ontology.root_class_id
    slots = ontology.slots[ontology.slots.owner_class_id == root_cls]
    if restrict_slots is not None:
        slots = slots[slots.slot_name.isin(restrict_slots)]
    classes = ontology.classes.set_index("class_id")
    parts: list[DataFrame] = []
    empty_aux = F.create_map().cast("map<string,string>")
    doc_keys = mentions.select("doc_key").distinct()

    for s in slots.itertuples():
        rng = s.range_class_id
        desc = _descendants(ontology, rng)
        base = mentions.filter(F.col("doc_key").isNotNull())
        if bool(classes.loc[rng].is_datatype):
            # one candidate per distinct interpreted value, earliest onset
            m = base.filter(F.col("class_id").isin(desc) & F.col("dt_value").isNotNull())
            w = W.partitionBy("doc_key", "class_id", "dt_value").orderBy("onset", "offset")
            m = m.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
            parts.append(
                m.select(
                    "doc_key",
                    F.lit(s.slot_name).alias("slot_name"),
                    F.lit("dt").alias("slot_kind"),
                    "class_id",
                    F.lit(None).cast("string").alias("individual_id"),
                    "dt_value",
                    F.col("dt_value").alias("obj_id"),
                    "text", "onset", "offset", "sent_idx",
                    "src",
                    empty_aux.alias("aux_values"),
                )
            )
        elif bool(classes.loc[rng].is_auxiliary):
            parts.append(_aux_candidates(mentions, ontology, s))
        elif (ontology.individuals.class_id.isin(desc)).any():
            m = base.filter((F.col("kind") == "individual") & F.col("class_id").isin(desc))
            # deterministic representative per (doc, individual, onset):
            # shortest span first (dropDuplicates picks an arbitrary row,
            # which the fused kernel could not reproduce)
            w = W.partitionBy("doc_key", "individual_id", "onset").orderBy("offset")
            m = m.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
            parts.append(
                m.select(
                    "doc_key",
                    F.lit(s.slot_name).alias("slot_name"),
                    F.lit("ind").alias("slot_kind"),
                    "class_id",
                    "individual_id",
                    F.lit(None).cast("string").alias("dt_value"),
                    F.col("individual_id").alias("obj_id"),
                    "text", "onset", "offset", "sent_idx",
                    "src",
                    empty_aux.alias("aux_values"),
                )
            )
        else:
            proper = [d for d in desc if d != rng]
            # evidence-free classes (whitelisted or sibling-differentiable,
            # ExplorationUtils.java:405-416): one candidate per document
            # anchored at onset -1; the rest stay evidence-gated
            free = [
                c for c in proper
                if c in no_evidence_classes
                or is_differentiable_to_all_siblings(ontology, c, rng)
            ]
            for c in free:
                parts.append(
                    doc_keys.select(
                        "doc_key",
                        F.lit(s.slot_name).alias("slot_name"),
                        F.lit("cls").alias("slot_kind"),
                        F.lit(c).alias("class_id"),
                        F.lit(None).cast("string").alias("individual_id"),
                        F.lit(None).cast("string").alias("dt_value"),
                        F.lit(c).alias("obj_id"),
                        F.lit(c).alias("text"),
                        F.lit(-1).alias("onset"),
                        F.lit(-1).alias("offset"),
                        F.lit(0).alias("sent_idx"),
                        F.lit("schema").alias("src"),
                        empty_aux.alias("aux_values"),
                    )
                )
            gated = [c for c in proper if c not in free]
            m = base.filter((F.col("kind") == "class") & F.col("class_id").isin(gated))
            w = W.partitionBy("doc_key", "class_id", "onset").orderBy("offset")
            m = m.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
            parts.append(
                m.select(
                    "doc_key",
                    F.lit(s.slot_name).alias("slot_name"),
                    F.lit("cls").alias("slot_kind"),
                    "class_id",
                    F.lit(None).cast("string").alias("individual_id"),
                    F.lit(None).cast("string").alias("dt_value"),
                    F.col("class_id").alias("obj_id"),
                    "text", "onset", "offset", "sent_idx",
                    "src",
                    empty_aux.alias("aux_values"),
                )
            )

    if not parts:  # InvestigationRestriction excluded every slot
        schema = (
            "doc_key string, slot_name string, slot_kind string, class_id string, "
            "individual_id string, dt_value string, obj_id string, text string, "
            "onset int, offset int, sent_idx int, src string, aux_values map<string,string>"
        )
        return mentions.sparkSession.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def aux_skolem_cols(aux_class_id: str, child_cols: list) -> F.Column:
    """Deterministic blank-node id for an auxiliary instance, derived purely
    from its (sorted-by-slot) child values — gold and prediction agree with
    no coordination. E.g. honour::champions trophy::2007."""
    return F.concat_ws(AUX_SEP, F.lit(aux_class_id.lower()), *child_cols)


def _aux_candidates(mentions: DataFrame, ontology, slot_row) -> DataFrame:
    """Auxiliary-class candidates: same-sentence pairing of the aux class's
    datatype-slot mentions (SlotFillerExplorer's recursive descent collapsed
    to a per-sentence join; auxiliary classes carry no text evidence of
    their own — reference ExplorationUtils.java:62-110)."""
    aux_cls = slot_row.range_class_id
    child_slots = ontology.slots[ontology.slots.owner_class_id == aux_cls].sort_values("slot_name")
    joined = None
    child_names: list[str] = []
    for cs in child_slots.itertuples():
        desc = _descendants(ontology, cs.range_class_id)
        m = (
            mentions.filter(F.col("class_id").isin(desc) & F.col("dt_value").isNotNull())
            .select(
                "doc_key", "sent_idx",
                F.col("dt_value").alias(f"v_{cs.slot_name}"),
                F.col("onset").alias(f"on_{cs.slot_name}"),
                F.col("offset").alias(f"off_{cs.slot_name}"),
                F.col("text").alias(f"t_{cs.slot_name}"),
            )
        )
        # deterministic earliest occurrence per (doc, sentence, value)
        w = W.partitionBy("doc_key", "sent_idx", f"v_{cs.slot_name}").orderBy(
            f"on_{cs.slot_name}", f"off_{cs.slot_name}"
        )
        m = m.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
        joined = m if joined is None else joined.join(m, ["doc_key", "sent_idx"])
        child_names.append(cs.slot_name)

    first = child_names[0]
    onset_col = F.least(*[F.col(f"on_{c}") for c in child_names])
    offset_col = F.greatest(*[F.col(f"off_{c}") for c in child_names])
    skolem = aux_skolem_cols(aux_cls, [F.col(f"v_{c}") for c in child_names])
    aux_map = F.create_map(
        *[x for c in child_names for x in (F.lit(c), F.col(f"v_{c}"))]
    )
    return joined.select(
        "doc_key",
        F.lit(slot_row.slot_name).alias("slot_name"),
        F.lit("aux").alias("slot_kind"),
        F.lit(aux_cls).alias("class_id"),
        F.lit(None).cast("string").alias("individual_id"),
        F.lit(None).cast("string").alias("dt_value"),
        skolem.alias("obj_id"),
        F.col(f"t_{first}").alias("text"),
        onset_col.alias("onset"),
        offset_col.alias("offset"),
        "sent_idx",
        F.lit("ner").alias("src"),
        aux_map.alias("aux_values"),
    ).dropDuplicates(["doc_key", "obj_id", "sent_idx"])
