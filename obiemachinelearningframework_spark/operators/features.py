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
* LocalityTemplate family (:191-208) -> signed sentence-distance bins
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
    """(root x candidate) join within document + content for text features.
    This is the beam-expansion join of SlotFillerExplorer re-expressed as
    one relational join; shuffle key = doc_key on both sides."""
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
    # discourse association: is this root the nearest one (by char distance)
    # to the candidate mention? The batched form of the reference's
    # discourse-progression pruning (SlotFillerExplorer.java:203-218).
    w_near = W.partitionBy("doc_key", "slot_name", "onset", "obj_id").orderBy(
        F.abs(F.col("onset") - F.col("root_onset")).asc(), F.col("root_id").asc()
    )
    pairs = pairs.withColumn("is_nearest_root", (F.row_number().over(w_near) == 1).cast("int"))
    return pairs.withColumn(
        "pair_id",
        F.sha2(
            F.concat_ws(
                "\x01", "doc_key", "root_id", "slot_name",
                F.coalesce("obj_id", F.lit("")), F.col("onset").cast("string"),
            ),
            256,
        ),
    )


def _emit(df: DataFrame, feature_col, value_col=None) -> DataFrame:
    v = value_col if value_col is not None else F.lit(1.0)
    return df.select("pair_id", feature_col.alias("feature"), v.cast("double").alias("value"))


def compute_features(pairs: DataFrame) -> DataFrame:
    """pairs -> long-format (pair_id, feature, value)."""
    slot = F.col("slot_name")
    sent_dist = F.col("sent_idx") - F.col("root_sent")
    dist_bin = (
        F.when(sent_dist < 0, F.lit("neg"))
        .when(sent_dist <= 3, sent_dist.cast("string"))
        .otherwise(F.lit("ge4"))
    )
    after_root = F.col("onset") > F.col("root_onset")
    before_next = F.col("next_root_onset").isNull() | (F.col("onset") < F.col("next_root_onset"))

    parts: list[DataFrame] = []
    parts.append(_emit(pairs, F.concat(F.lit("bias["), slot, F.lit("]"))))
    parts.append(_emit(pairs, F.concat(F.lit("dist["), slot, F.lit("]="), dist_bin)))
    parts.append(_emit(pairs.filter(after_root), F.concat(F.lit("after_root["), slot, F.lit("]"))))
    parts.append(_emit(pairs.filter(before_next), F.concat(F.lit("before_next["), slot, F.lit("]"))))
    parts.append(_emit(pairs.filter(after_root & before_next), F.concat(F.lit("in_block["), slot, F.lit("]"))))
    parts.append(
        _emit(pairs.filter(F.col("is_nearest_root") == 1), F.concat(F.lit("nearest_root["), slot, F.lit("]")))
    )
    parts.append(
        _emit(
            pairs.filter(after_root & before_next & (F.col("is_nearest_root") == 1)),
            F.concat(F.lit("in_block_nearest["), slot, F.lit("]")),
        )
    )
    parts.append(
        _emit(pairs, F.concat(F.lit("filler["), slot, F.lit("]="), F.coalesce("class_id", F.lit("null"))))
    )

    # in-between tokens (root mention -> candidate, discourse order)
    gap = F.col("onset") - F.col("root_offset")
    ib = (
        pairs.filter(after_root & (gap > 0) & (gap <= IB_MAX_CHARS))
        .withColumn(
            "ib_toks",
            F.slice(
                F.filter(
                    F.split(F.lower(F.expr("substring(content, root_offset + 1, onset - root_offset)")), r"\W+"),
                    lambda t: F.length(t) >= 2,
                ),
                1,
                IB_MAX_TOKENS,
            ),
        )
        .select("pair_id", "slot_name", F.size("ib_toks").alias("n_ib"), F.explode("ib_toks").alias("tok"))
    )
    # unit total mass per pair: a pair with many in-between tokens must not
    # outscore one with few just by having more lexical features
    parts.append(
        _emit(ib, F.concat(F.lit("ib["), F.col("slot_name"), F.lit("]="), F.col("tok")),
              F.lit(1.0) / F.col("n_ib"))
    )

    # token context +-2 around the candidate mention
    left_raw = F.expr(f"substring(content, greatest(1, onset - {CTX_CHARS}), least(onset - 1, {CTX_CHARS}))")
    right_raw = F.expr(f"substring(content, offset + 1, {CTX_CHARS})")
    ltoks = F.reverse(F.filter(F.split(F.lower(left_raw), r"\W+"), lambda t: F.length(t) >= 1))
    rtoks = F.filter(F.split(F.lower(right_raw), r"\W+"), lambda t: F.length(t) >= 1)
    ctx = pairs.select("pair_id", "slot_name", ltoks.alias("lt"), rtoks.alias("rt"))
    for name, arr, idx in (("ctx_l1", "lt", 1), ("ctx_l2", "lt", 2), ("ctx_r1", "rt", 1), ("ctx_r2", "rt", 2)):
        tok = F.try_element_at(F.col(arr), F.lit(idx))
        parts.append(
            _emit(
                ctx.filter(tok.isNotNull() & (tok != "")),
                F.concat(F.lit(f"{name}["), F.col("slot_name"), F.lit("]="), tok),
            )
        )

    # has-max-evidence within (doc, slot): frequency of this candidate's
    # surface among candidates of the slot
    wfreq = W.partitionBy("doc_key", "slot_name")
    freq = pairs.groupBy("doc_key", "slot_name", "obj_id").agg(F.count("*").alias("n"))
    freq = freq.withColumn("mx", F.max("n").over(wfreq)).filter(F.col("n") == F.col("mx"))
    maxev = pairs.join(freq.select("doc_key", "slot_name", "obj_id"), ["doc_key", "slot_name", "obj_id"], "left_semi")
    parts.append(_emit(maxev, F.concat(F.lit("max_evidence["), slot, F.lit("]"))))

    # binned Levenshtein similarity text<->class name (class-valued slots)
    cls_pairs = pairs.filter(F.col("slot_kind") == "cls")
    sim = 1.0 - F.levenshtein(F.lower("text"), F.lower("class_id")) / F.greatest(
        F.length("text"), F.length("class_id")
    )
    for b in (0.5, 0.7, 0.9):
        parts.append(
            _emit(cls_pairs.filter(sim >= b), F.concat(F.lit(f"strsim>={b}["), slot, F.lit("]")))
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def score_pairs(features: DataFrame, weights: DataFrame) -> DataFrame:
    """Linear model score per pair: broadcast-join the (feature, weight)
    table, partial-aggregate the dot product (OBIEScorer.java:94-108 —
    our link is the raw margin; exp() is monotone so argmax is identical)."""
    return (
        features.join(F.broadcast(weights), "feature", "inner")
        .groupBy("pair_id")
        .agg(F.sum(F.col("value") * F.col("weight")).alias("score"))
    )
