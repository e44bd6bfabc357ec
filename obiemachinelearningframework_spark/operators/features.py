"""Feature templates over (root x candidate) assignment pairs.

The reference's 31 feature-template classes walk each state's annotation
trees and emit named sparse features (``templates/*.java``); factors are
memoized by scope so unchanged sub-trees are not re-scored. Here the same
features are *columns*: one long-format DataFrame

    features(pair_id, feature, value)

computed entirely with built-in ``pyspark.sql.functions`` (whole-stage
codegen; zero Python in the hot path). The "factor scope" becomes
``pair_id`` — a deterministic hash of (doc, root, slot, candidate) — so a
feature row is computed once per distinct scope regardless of how many
beam states share it (the FactorPool memoization of the reference,
``templates/TokenContextTemplate.java:97-117``, for free via dedup).

Feature families re-created (reference file -> family):
* TokenContextTemplate (:260-337)    -> ctx_l1/l2, ctx_r1/r2 tokens
* InBetweenContextTemplate (:29-133) -> ib tokens between root and filler
  (<= 10 tokens, tokens >= 2 chars, as in the reference :50,:57)
* LocalityTemplate family (:191-208) -> signed sentence-distance bins +
  signed char-distance bins (cdist, the GlobalLocality char variant)
* SlotFillerExplorer discourse progression (:203-218) -> after_root /
  before_next_root block features
* FrequencyTemplate (:28-120)        -> has-max-evidence flag
* StringSimilarityTemplate (:146)    -> binned Levenshtein similarity
* GenericMainTemplatePriorTemplate   -> filler-class prior feature
* SlotIsFilledTemplate (:142-176)    -> per-slot bias (the filled/empty
  decision is the score-vs-zero accept threshold)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

IB_MAX_CHARS = 240       # char cap on the in-between slice (>=10 tokens)
IB_MAX_TOKENS = 10
CTX_CHARS = 40


def build_pairs(roots: DataFrame, candidates: DataFrame, instances: DataFrame) -> DataFrame:
    """(root x candidate) join within document + context slices for text
    features. This is the beam-expansion join of SlotFillerExplorer
    re-expressed as one relational join; all keys are doc_key-prefixed, so
    inputs clustered by doc_key flow through with no exchange.

    ``content`` is consumed HERE and immediately replaced by the three
    bounded context slices the feature templates need (left/right ±40
    chars, in-between <= 240 chars). The pair table multiplies rows by
    (roots x candidates) per doc — carrying the full document text through
    that multiplication, the downstream window sorts, and the feature
    explode would multiply corpus bytes ~50x; the slices cap the per-row
    payload at ~320 bytes regardless of document size."""
    r = roots.select(
        "doc_key",
        "root_id",
        "root_class_id",
        "anchor_individual_id",
        F.col("onset").alias("root_onset"),
        F.col("offset").alias("root_offset"),
        F.col("sent_idx").alias("root_sent"),
        "next_root_onset",
    )
    pairs = r.join(candidates, "doc_key").join(
        instances.select("doc_key", "content"), "doc_key"
    )
    gap = F.col("onset") - F.col("root_offset")
    ib_cond = (F.col("onset") > F.col("root_onset")) & (gap > 0) & (gap <= IB_MAX_CHARS)
    pairs = pairs.withColumn(
        "_l_raw",
        # the CTX_CHARS chars IMMEDIATELY preceding the mention (1-based
        # positions onset-CTX+1 .. onset): the earlier onset-CTX..onset-1
        # form always dropped the adjacent character, corrupting ctx_l1
        # whenever a mention does not start at a \\b boundary
        F.expr(f"substring(content, greatest(1, onset - {CTX_CHARS} + 1), least(onset, {CTX_CHARS}))"),
    ).withColumn(
        "_r_raw", F.expr(f"substring(content, offset + 1, {CTX_CHARS})")
    ).withColumn(
        "_ib_raw",
        F.when(ib_cond, F.expr("substring(content, root_offset + 1, onset - root_offset)")),
    ).drop("content")
    # discourse association: is this root the nearest one (by char distance)
    # to the candidate mention? The batched form of the reference's
    # discourse-progression pruning (SlotFillerExplorer.java:203-218).
    w_near = W.partitionBy("doc_key", "slot_name", "onset", "obj_id").orderBy(
        F.abs(F.col("onset") - F.col("root_onset")).asc(), F.col("root_id").asc()
    )
    pairs = pairs.withColumn("is_nearest_root", (F.row_number().over(w_near) == 1).cast("int"))
    return pairs.withColumn(
        "pair_id",
        # class_id MUST be part of the scope identity: two datatype
        # candidates of different classes can share (slot, obj_id, onset)
        # (e.g. sibling datatype classes matching the same literal), and a
        # collision would sum both candidates' features under one pair —
        # diverging from the fused kernel, which scores candidates
        # individually
        F.sha2(
            F.concat_ws(
                "\x01", "doc_key", "root_id", "slot_name",
                F.coalesce("obj_id", F.lit("")), F.coalesce("class_id", F.lit("")),
                F.col("onset").cast("string"),
            ),
            256,
        ),
    )


def ds_token_context(mentions: DataFrame, instances: DataFrame) -> DataFrame:
    """TokenContextTemplate distant-supervision mode (templates/
    TokenContextTemplate.java:157-232): context features are emitted at the
    positions of ALL NERL mentions of the assigned class (keyed by the
    class) and of the assigned individual (keyed by the individual), not
    just at the candidate's own span — every mention of "FC Nodrix"
    elsewhere in the document votes for candidates assigned team_nodrix.

    Returns the per-(doc, key) DISTINCT feature-name arrays
    ``(doc_key, ds_key, ds_feats)`` with ds_key in
    {``cls:<class_id>``, ``ind:<individual_id>``}; ``compute_features``
    joins them onto pairs by (doc_key, key) — mention-sized aggregation,
    doc_key-prefixed grouping keys, no corpus-sized shuffle. Mirrored
    per-document in the fused kernel (``fused._ds_context_maps``), parity
    pinned by tests/test_feature_parity_full.py."""
    m = mentions.join(instances.select("doc_key", "content"), "doc_key")
    m = (
        m.withColumn(
            "_l_raw",
            F.expr(f"substring(content, greatest(1, onset - {CTX_CHARS} + 1), least(onset, {CTX_CHARS}))"),
        )
        .withColumn("_r_raw", F.expr(f"substring(content, offset + 1, {CTX_CHARS})"))
        .drop("content")
    )
    lt = F.reverse(F.filter(F.split(F.lower("_l_raw"), r"\W+"), lambda t: F.length(t) >= 1))
    rt = F.filter(F.split(F.lower("_r_raw"), r"\W+"), lambda t: F.length(t) >= 1)
    m = m.withColumn("_lt", lt).withColumn("_rt", rt)

    def tok(arr, i):
        return F.try_element_at(F.col(arr), F.lit(i))

    def ok(arr, i):
        return tok(arr, i).isNotNull() & (tok(arr, i) != "")

    shapes = F.array_compact(F.array(
        *[F.when(ok(a, i), F.concat(F.lit(f"{nm}:"), tok(a, i)))
          for nm, a, i in (("l1", "_lt", 1), ("l2", "_lt", 2), ("l3", "_lt", 3),
                           ("r1", "_rt", 1), ("r2", "_rt", 2), ("r3", "_rt", 3))],
        *[F.when(ok(a1, i1) & ok(a2, i2),
                 F.concat(F.lit(f"{nm}:"), tok(a1, i1), F.lit(" "), tok(a2, i2)))
          for nm, a1, i1, a2, i2 in (("l2l1", "_lt", 2, "_lt", 1),
                                     ("r1r2", "_rt", 1, "_rt", 2),
                                     ("l1r1", "_lt", 1, "_rt", 1))],
    ))
    base = m.select(
        "doc_key", "class_id", "individual_id", F.explode(shapes).alias("_shape")
    )
    # class key: every mention of the class (the reference adds individual-
    # annotation positions under the class key too, :169-187); individual
    # key: mentions of that individual only
    rows = base.filter(F.col("class_id").isNotNull()).select(
        "doc_key", F.concat(F.lit("cls:"), "class_id").alias("ds_key"), "_shape"
    ).unionByName(
        base.filter(F.col("individual_id").isNotNull()).select(
            "doc_key", F.concat(F.lit("ind:"), "individual_id").alias("ds_key"), "_shape"
        )
    )
    return rows.groupBy("doc_key", "ds_key").agg(
        F.collect_set(
            F.concat(F.lit("ctxds["), F.col("ds_key"), F.lit("]="), F.col("_shape"))
        ).alias("ds_feats")
    )


def kb_datatype_stats(kb_triples) -> dict:
    """Per-predicate (median, dev) over the KB's numeric object values —
    ``KnowledgeBaseTemplate.getMeanDevPair`` (templates/KnowledgeBase
    Template.java:655-706): median = upper-middle sorted value, dev =
    sqrt(SUM((median - v)^2)) (the reference keeps the raw sum, no /n).
    Computed once on the driver (the KB side is broadcast-sized) and
    shared verbatim by the relational projection and the fused kernel so
    both emit bit-identical features."""
    import math

    per: dict[str, list] = {}
    for r in kb_triples.select("pred", "obj").collect():
        try:
            v = float(r["obj"])
        except (TypeError, ValueError):
            continue
        per.setdefault(r["pred"], []).append(v)
    stats = {}
    for pred, vals in per.items():
        vals.sort()
        med = vals[len(vals) // 2]
        dev = math.sqrt(sum((med - x) ** 2 for x in vals))
        stats[pred] = (med, dev)
    return stats


def _fs(feature_col, value_col=None):
    """One feature as struct<feature:string, value:double>."""
    v = value_col if value_col is not None else F.lit(1.0)
    return F.struct(feature_col.alias("feature"), v.cast("double").alias("value"))


def _fs_if(cond, feature_col, value_col=None):
    """Conditional feature: null when cond is false (dropped by
    array_compact before the explode)."""
    return F.when(cond, _fs(feature_col, value_col))


def compute_features(pairs: DataFrame, ontology=None, kb_triples: DataFrame | None = None,
                     ds_context: DataFrame | None = None) -> DataFrame:
    """pairs -> long-format (pair_id, feature, value). ``ontology`` adds the
    hierarchy-depth family (broadcast class->depth map); ``kb_triples`` adds
    the KnowledgeBaseTemplate family (does (root, slot, filler) exist in a
    prior KB — ``templates/KnowledgeBaseTemplate.java:243-330`` with the
    SPARQL store replaced by a broadcast join against a triples table,
    e.g. our own previous output). Omitted, the remaining families are
    unchanged (train and predict must agree).

    Fused single-pass plan: the per-(doc,slot,obj) / per-(doc,slot) /
    per-doc statistics come from window functions (shuffles on progressively
    coarser prefixes of the same key — AQE coalesces them), then EVERY
    feature family is emitted from ONE projection as an array of
    (feature, value) structs that is flattened by a single explode. One
    wide codegen stage instead of a union of ~20 subtrees — at 10^12 pairs
    the union form scans the pair table 20x and multiplies the shuffle
    count; this form scans it once."""
    slot = F.col("slot_name")
    sent_dist = F.col("sent_idx") - F.col("root_sent")
    dist_bin = (
        F.when(sent_dist < 0, F.lit("neg"))
        .when(sent_dist <= 3, sent_dist.cast("string"))
        .otherwise(F.lit("ge4"))
    )
    # GlobalLocalityTemplate char-distance variant (templates/Locality
    # Template.java:191-208 family, "[A_B] dist <= d"): signed
    # root->candidate char distance in exponential <=d bins. Together with
    # the sentence bins above this covers the Locality/GlobalLocality/
    # LocalLocality/GlobalSentenceLocality family's distance signal.
    cgap = F.col("onset") - F.col("root_onset")
    cmag = F.abs(cgap)
    cdist_bin = (
        F.when(cmag <= 16, F.lit("le16"))
        .when(cmag <= 64, F.lit("le64"))
        .when(cmag <= 256, F.lit("le256"))
        .when(cmag <= 1024, F.lit("le1024"))
        .otherwise(F.lit("gt1024"))
    )
    cdist_sign = F.when(cgap < 0, F.lit("-")).otherwise(F.lit("+"))
    # LocalityTemplate token-distance variant: tokens between root and
    # candidate, counted on the bounded in-between slice (<= IB_MAX_CHARS);
    # "neg" = candidate before the root, "far" = beyond the slice. Together
    # with the sentence bins and cdist this completes the Locality family's
    # three distance units (sentence / char / token).
    _ib_ntok = F.size(F.filter(F.split(F.lower("_ib_raw"), r"\W+"), lambda t: F.length(t) >= 1))
    tokdist_bin = (
        F.when(F.col("onset") <= F.col("root_onset"), F.lit("neg"))
        .when(F.col("_ib_raw").isNull(), F.lit("far"))
        .when(_ib_ntok <= 1, F.lit("le1"))
        .when(_ib_ntok <= 3, F.lit("le3"))
        .when(_ib_ntok <= 10, F.lit("le10"))
        .otherwise(F.lit("gt10"))
    )
    after_root = F.col("onset") > F.col("root_onset")
    before_next = F.col("next_root_onset").isNull() | (F.col("onset") < F.col("next_root_onset"))
    nearest = F.col("is_nearest_root") == 1

    # per-(doc,slot,obj) evidence count & root-pairing count, per-(doc,slot)
    # max evidence + filler variety, per-doc root count + slot-evidence
    # breadth — window functions over prefixes of one key family
    # (FrequencyTemplate, HeterogeneousSlotTemplate,
    # RootClassCardinalityTemplate, MainSlotVarietyTemplate,
    # PropertyEvidenceForClassTemplate statistics). All partitions are
    # doc_key-prefixed: no exchange under the doc_key clustering.
    w_obj = W.partitionBy("doc_key", "slot_name", "obj_id")
    w_slot = W.partitionBy("doc_key", "slot_name")
    w_doc = W.partitionBy("doc_key")
    p = (
        pairs.withColumn("_n_ev", F.count("*").over(w_obj))
        .withColumn("_n_pairing", F.size(F.collect_set("root_id").over(w_obj)))
        .withColumn("_mx_ev", F.max("_n_ev").over(w_slot))
        .withColumn("_variety", F.size(F.collect_set("obj_id").over(w_slot)))
        .withColumn("_n_roots", F.size(F.collect_set("root_id").over(w_doc)))
        .withColumn("_n_ev_slots", F.size(F.collect_set("slot_name").over(w_doc)))
    )

    # token-array families (from the bounded context slices build_pairs
    # projected out of content — _l_raw/_r_raw/_ib_raw)
    ib_toks = F.slice(
        F.filter(F.split(F.lower("_ib_raw"), r"\W+"), lambda t: F.length(t) >= 2),
        1,
        IB_MAX_TOKENS,
    )
    ltoks = F.reverse(F.filter(F.split(F.lower("_l_raw"), r"\W+"), lambda t: F.length(t) >= 1))
    rtoks = F.filter(F.split(F.lower("_r_raw"), r"\W+"), lambda t: F.length(t) >= 1)
    bow_toks = F.filter(F.split(F.lower("text"), r"\W+"), lambda t: F.length(t) >= 1)
    mt = F.concat(F.lit("#"), F.lower("text"), F.lit("#"))
    c3_grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(mt) - 2, F.lit(1))),
        lambda i: mt.substr(i, F.lit(3)),
    )
    p = (
        p.withColumn("_ib", F.when(F.col("_ib_raw").isNotNull(), ib_toks))
        .withColumn("_lt", ltoks)
        .withColumn("_rt", rtoks)
        .withColumn("_bow", bow_toks)
        .withColumn("_c3", c3_grams)
    )

    sim = 1.0 - F.levenshtein(F.lower("text"), F.lower("class_id")) / F.greatest(
        F.length("text"), F.length("class_id")
    )
    is_cls = F.col("slot_kind") == "cls"
    # StringSimilarityTemplate's SECOND factor: similarity vs the assigned
    # INDIVIDUAL's name, feature keyed by the individual
    # (templates/StringSimilarityTemplate.java:109-111 adds a scope per
    # scioClass.getIndividual().name). Same-span fuzzy link alternatives
    # share every context feature — this (with frequency/KB) is the
    # scorer's disambiguation signal between them.
    ind_labels = (
        dict(zip(ontology.individuals.individual_id,
                 ontology.individuals.label.str.lower()))
        if ontology is not None and len(ontology.individuals) else {}
    )
    if ind_labels:
        label_map = F.create_map(*[F.lit(x) for kv in ind_labels.items() for x in kv])
        ind_label = F.element_at(label_map, F.col("individual_id"))
        sim_ind = 1.0 - F.levenshtein(F.lower("text"), ind_label) / F.greatest(
            F.length("text"), F.length(ind_label)
        )
        has_ind = F.col("individual_id").isNotNull() & ind_label.isNotNull()

    scalar = [
        _fs(F.concat(F.lit("bias["), slot, F.lit("]"))),
        _fs(F.concat(F.lit("dist["), slot, F.lit("]="), dist_bin)),
        _fs(F.concat(F.lit("cdist["), slot, F.lit("]="), cdist_sign, cdist_bin)),
        _fs(F.concat(F.lit("tokdist["), slot, F.lit("]="), tokdist_bin)),
        _fs_if(after_root, F.concat(F.lit("after_root["), slot, F.lit("]"))),
        _fs_if(before_next, F.concat(F.lit("before_next["), slot, F.lit("]"))),
        _fs_if(after_root & before_next, F.concat(F.lit("in_block["), slot, F.lit("]"))),
        _fs_if(nearest, F.concat(F.lit("nearest_root["), slot, F.lit("]"))),
        _fs_if(after_root & before_next & nearest,
               F.concat(F.lit("in_block_nearest["), slot, F.lit("]"))),
        _fs(F.concat(F.lit("filler["), slot, F.lit("]="), F.coalesce("class_id", F.lit("null")))),
        # TokenContextTemplate ±3 window (templates/TokenContextTemplate
        # .java:260-337 emits single tokens at relative positions -3..+3)
        *[
            _fs_if(
                F.try_element_at(F.col(arr), F.lit(idx)).isNotNull()
                & (F.try_element_at(F.col(arr), F.lit(idx)) != ""),
                F.concat(F.lit(f"{name}["), slot, F.lit("]="), F.try_element_at(F.col(arr), F.lit(idx))),
            )
            for name, arr, idx in (
                ("ctx_l1", "_lt", 1), ("ctx_l2", "_lt", 2), ("ctx_l3", "_lt", 3),
                ("ctx_r1", "_rt", 1), ("ctx_r2", "_rt", 2), ("ctx_r3", "_rt", 3),
            )
        ],
        # TokenContextTemplate token combinations ("l2 l1 <C>", "<C> r1 r2",
        # "l1 <C> r1") — the conjunction features of the same template
        *[
            _fs_if(
                F.try_element_at(F.col(a1), F.lit(i1)).isNotNull()
                & (F.try_element_at(F.col(a1), F.lit(i1)) != "")
                & F.try_element_at(F.col(a2), F.lit(i2)).isNotNull()
                & (F.try_element_at(F.col(a2), F.lit(i2)) != ""),
                F.concat(
                    F.lit(f"{name}["), slot, F.lit("]="),
                    F.try_element_at(F.col(a1), F.lit(i1)), F.lit(" "),
                    F.try_element_at(F.col(a2), F.lit(i2)),
                ),
            )
            for name, a1, i1, a2, i2 in (
                ("ctx_l2l1", "_lt", 2, "_lt", 1),
                ("ctx_r1r2", "_rt", 1, "_rt", 2),
                ("ctx_l1r1", "_lt", 1, "_rt", 1),
            )
        ],
        # FrequencyTemplate has-max-evidence
        _fs_if(F.col("_n_ev") == F.col("_mx_ev"), F.concat(F.lit("max_evidence["), slot, F.lit("]"))),
        # StringSimilarityTemplate bins
        *[
            _fs_if(is_cls & (sim >= b), F.concat(F.lit(f"strsim>={b}["), slot, F.lit("]")))
            for b in (0.5, 0.7, 0.9)
        ],
        # ... and the individual-name factor (keyed by the individual, as
        # the reference keys the feature by the name)
        *[
            _fs_if(has_ind & (sim_ind >= b),
                   F.concat(F.lit(f"simind>={b}["), slot, F.lit("]="), F.col("individual_id")))
            for b in ((0.5, 0.7, 0.9) if ind_labels else ())
        ],
        # CooccurrenceTemplate value1+property+value2
        _fs(F.concat(F.lit("cooc["), F.col("root_class_id"), F.lit("+"), slot, F.lit("]="),
                     F.coalesce("class_id", F.lit("null")))),
        # RootClassCardinalityTemplate bucket
        _fs(F.concat(F.lit("n_roots["), slot, F.lit("]="),
                     F.least(F.col("_n_roots"), F.lit(6)).cast("string"))),
        # HeterogeneousSlotTemplate ==1 / !=1
        _fs(F.concat(F.lit("het["), slot, F.lit("]="),
                     F.when(F.col("_n_pairing") == 1, F.lit("eq1")).otherwise(F.lit("ne1")))),
        # MainSlotVarietyTemplate: distinct-filler count of the slot
        _fs(F.concat(F.lit("variety["), slot, F.lit("]="),
                     F.least(F.col("_variety"), F.lit(5)).cast("string"))),
        # PropertyEvidenceForClassTemplate: how many of the root's slots
        # have any textual evidence in this document
        _fs(F.concat(F.lit("pe["), slot, F.lit("]="),
                     F.least(F.col("_n_ev_slots"), F.lit(6)).cast("string"))),
        # NERTemplate FoundByNER flag: evidence that reached the candidate
        # via fuzzy linking rather than dictionary/regex NER
        _fs_if(F.col("src") == "fuzzy", F.concat(F.lit("fuzzy_ev["), slot, F.lit("]"))),
        # InterTokenTemplate boundary tokens: first/last token between the
        # root and the filler (position-marked, unlike the ib bag)
        _fs_if(
            F.col("_ib").isNotNull() & (F.size("_ib") >= 1),
            F.concat(F.lit("ib_first["), slot, F.lit("]="), F.try_element_at(F.col("_ib"), F.lit(1))),
        ),
        _fs_if(
            F.col("_ib").isNotNull() & (F.size("_ib") >= 2),
            F.concat(F.lit("ib_last["), slot, F.lit("]="),
                     F.try_element_at(F.col("_ib"), F.size("_ib"))),
        ),
    ]

    # HierarchyTemplate: ontology-depth of the assigned class
    if ontology is not None and getattr(ontology, "class_depth", None) is not None:
        from itertools import chain

        depth_map = F.create_map(
            *chain.from_iterable(
                (F.lit(c), F.lit(int(d))) for c, d in ontology.class_depth.items()
            )
        )
        d = depth_map[F.col("class_id")]
        scalar.append(
            _fs_if(d.isNotNull(), F.concat(F.lit("hier["), slot, F.lit("]="), d.cast("string")))
        )

    # token families carry unit total mass per pair (1/n per token): a pair
    # with many tokens must not outscore one with few by feature count
    def _tok_feats(arr_col, prefix):
        n = F.greatest(F.size(arr_col), F.lit(1))
        return F.transform(
            arr_col,
            lambda t: _fs(F.concat(F.lit(prefix + "["), slot, F.lit("]="), t), F.lit(1.0) / n),
        )

    # KnowledgeBaseTemplate: membership of the proposed assignment in a
    # prior KB — broadcast left-semi-style flag join (the KB side is the
    # distilled triple table, small relative to the pair table).
    # TrainAsKnowledgeBaseTemplate (templates/TrainAsKnowledgeBase
    # Template.java docs :1-12): when the KB view carries a doc_key column
    # (the fit-time view of the TRAINING GOLD), membership is masked
    # leave-one-doc-out — a (pred, obj) seen ONLY in this document's own
    # gold does not fire, so a document cannot see its own answer key.
    if kb_triples is not None:
        if "doc_key" in kb_triples.columns:
            kb = (
                kb_triples.select(
                    F.col("doc_key").alias("_kb_doc"),
                    F.col("pred").alias("slot_name"),
                    F.col("obj").alias("obj_id"),
                )
                .dropDuplicates()
                .groupBy("slot_name", "obj_id")
                .agg(
                    F.countDistinct("_kb_doc").alias("_kb_n"),
                    F.min("_kb_doc").alias("_kb_only"),
                )
            )
            p = p.join(F.broadcast(kb), ["slot_name", "obj_id"], "left")
            in_kb = F.col("_kb_n").isNotNull() & (
                (F.col("_kb_n") > 1) | (F.col("_kb_only") != F.col("doc_key"))
            )
        else:
            kb = (
                kb_triples.select(
                    F.col("pred").alias("slot_name"),
                    F.col("obj").alias("obj_id"),
                    F.lit(1).alias("_in_kb"),
                ).dropDuplicates()
            )
            p = p.join(F.broadcast(kb), ["slot_name", "obj_id"], "left")
            in_kb = F.col("_in_kb").isNotNull()
        scalar.append(
            _fs_if(in_kb, F.concat(F.lit("kb["), slot, F.lit("]")))
        )
        # datatype mean/stddev stats (KnowledgeBaseTemplate.java:600-669):
        # decade-binned distance to the KB median, plus the nearest
        # within-k and farthest beyond-k dev bands (k in 1..10, band width
        # 0.001 * dev, exactly as the reference loops)
        stats = kb_datatype_stats(kb_triples)
        if stats:
            from itertools import chain as _chain

            med_map = F.create_map(
                *_chain.from_iterable((F.lit(k), F.lit(m)) for k, (m, _) in stats.items())
            )
            dev_map = F.create_map(
                *_chain.from_iterable((F.lit(k), F.lit(d)) for k, (_, d) in stats.items())
            )
            # try_cast: non-numeric interpreted values ("182 cm") yield no
            # stats features, same as the kernel's float() failure path
            v = F.col("dt_value").try_cast("double")
            med, dev = med_map[slot], dev_map[slot]
            delta = F.abs(v - med)
            band = 0.001 * dev
            has = v.isNotNull() & med.isNotNull()
            within_k = F.greatest(F.ceil(delta / band), F.lit(1))
            beyond_k = F.least(F.ceil(delta / band) - 1, F.lit(10))
            scalar.extend([
                _fs_if(
                    has & (delta < 1000),
                    F.concat(F.lit("kbstat_dist["), slot, F.lit("]="),
                             (F.floor(delta / 10) * 10).cast("long").cast("string")),
                ),
                _fs_if(
                    has & (dev > 0) & (within_k <= 10),
                    F.concat(F.lit("kbstat_within["), slot, F.lit("]="),
                             within_k.cast("long").cast("string")),
                ),
                _fs_if(
                    has & (dev > 0) & (beyond_k >= 1),
                    F.concat(F.lit("kbstat_beyond["), slot, F.lit("]="),
                             beyond_k.cast("long").cast("string")),
                ),
            ])

    # BOWnGramsTemplate: word bigrams over the mention surface
    bow2 = F.when(
        F.size("_bow") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_bow") - 1),
            lambda i: F.concat(
                F.element_at(F.col("_bow"), i), F.lit(" "), F.element_at(F.col("_bow"), i + 1)
            ),
        ),
    )
    p = p.withColumn("_bow2", bow2)

    empty = F.array().cast("array<struct<feature:string,value:double>>")
    all_feats = F.concat(
        F.array_compact(F.array(*scalar)),
        F.coalesce(_tok_feats(F.col("_ib"), "ib"), empty),
        _tok_feats(F.col("_bow"), "bow"),
        F.coalesce(_tok_feats(F.col("_bow2"), "bow2"), empty),
        _tok_feats(F.col("_c3"), "c3g"),
    )
    out = (
        p.select("doc_key", "pair_id", F.explode(all_feats).alias("f"))
        .select(
            "doc_key", "pair_id",
            F.col("f.feature").alias("feature"), F.col("f.value").alias("value"),
        )
    )
    if ds_context is not None:
        # distant-supervision TokenContext rows: join the per-(doc, key)
        # distinct context-feature arrays onto the pairs by class and by
        # individual key. Both joins are doc_key-prefixed (co-partitioned
        # under the doc_key clustering) and the ds side is mention-sized.
        keyed = pairs.select("doc_key", "pair_id", "class_id", "individual_id")
        for kind_col, prefix in (("class_id", "cls:"), ("individual_id", "ind:")):
            side = keyed.filter(F.col(kind_col).isNotNull()).withColumn(
                "ds_key", F.concat(F.lit(prefix), F.col(kind_col))
            )
            out = out.unionByName(
                side.join(ds_context, ["doc_key", "ds_key"])
                .select(
                    "doc_key", "pair_id",
                    F.explode("ds_feats").alias("feature"),
                    F.lit(1.0).alias("value"),
                )
            )
    return out


def score_pairs(features: DataFrame, weights: DataFrame) -> DataFrame:
    """Linear model score per pair: broadcast-join the (feature, weight)
    table, partial-aggregate the dot product (OBIEScorer.java:94-108 —
    our link is the raw margin; exp() is monotone so argmax is identical).
    Grouping on (doc_key, pair_id) rather than pair_id alone keeps the
    aggregation inside the doc_key clustering — map-side only, no exchange
    of the exploded feature table."""
    return (
        features.join(F.broadcast(weights), "feature", "inner")
        .groupBy("doc_key", "pair_id")
        .agg(F.sum(F.col("value") * F.col("weight")).alias("score"))
    )
