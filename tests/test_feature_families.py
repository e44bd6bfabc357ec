"""Every feature-template family must appear in the long feature table.

Guards the SURVEY §2 template coverage: a refactor that silently drops a
family (the fused projection makes that easy to miss) fails here."""

import re

from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.candidates import (
    generate_candidates,
    propose_roots,
)
from obiemachinelearningframework_spark.operators.features import (
    build_pairs,
    compute_features,
)
from obiemachinelearningframework_spark.operators.mentions import (
    detect_mentions,
    prepare_instances,
)

# family prefix -> reference template it re-creates
FAMILIES = [
    "bias", "dist", "after_root", "before_next", "in_block", "nearest_root",
    "cdist",             # GlobalLocalityTemplate (char-distance bins)
    "tokdist",           # LocalityTemplate (token-distance bins)
    "filler",            # GenericMainTemplatePrior
    "ctx_l1", "ctx_l2", "ctx_l3", "ctx_r1", "ctx_r2", "ctx_r3",  # TokenContext ±3
    "ctx_l2l1", "ctx_r1r2", "ctx_l1r1",  # TokenContext combinations
    "max_evidence",      # FrequencyTemplate
    "cooc",              # CooccurrenceTemplate
    "n_roots",           # RootClassCardinalityTemplate
    "het",               # HeterogeneousSlotTemplate
    "variety",           # MainSlotVarietyTemplate
    "pe",                # PropertyEvidenceForClassTemplate
    "hier",              # HierarchyTemplate
    "ib", "ib_first", "ib_last",  # InBetweenContext + InterToken
    "bow", "bow2",       # BOWPlain + BOWnGrams
    "c3g",               # BOCharNGrams
]


def test_all_template_families_emitted(spark):
    c = generate_corpus("soccer", n_docs=30, seed=3)
    inst = prepare_instances(spark.createDataFrame(c["source"]))
    mentions = detect_mentions(inst, c["ontology"]).cache()
    roots = propose_roots(mentions, c["ontology"])
    cands = generate_candidates(mentions, c["ontology"])
    pairs = build_pairs(roots, cands, inst)
    feats = compute_features(pairs, c["ontology"])

    prefixes = set(
        r["p"]
        for r in feats.select(
            F.regexp_extract("feature", r"^([a-z0-9_>=.]+)\[", 1).alias("p")
        ).distinct().collect()
    )
    missing = [f for f in FAMILIES if f not in prefixes]
    assert not missing, f"missing feature families: {missing} (got {sorted(prefixes)})"

    # token families must carry unit total mass per pair
    bow_mass = (
        feats.filter(F.col("feature").startswith("bow["))
        .groupBy("pair_id").agg(F.sum("value").alias("m"))
        .select(F.min("m").alias("lo"), F.max("m").alias("hi")).first()
    )
    assert abs(bow_mass["lo"] - 1.0) < 1e-9 and abs(bow_mass["hi"] - 1.0) < 1e-9
