"""FEATURE-level parity between the relational projection and the fused
kernel on both fixture domains: compares the aggregated (root, slot, obj,
onset, feature) -> value maps, not just the final triples — a feature fork
that happens to survive scoring/thresholding (or only fires on rare
inputs) shows up here immediately. Complements tests/test_fused_parity.py
(triples) and tests/test_fused_parity_evidence_free.py (evidence-free
branch)."""

from collections import defaultdict

import pytest

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.functions.patterns import compile_pattern_table
from obiemachinelearningframework_spark.operators.candidates import (
    generate_candidates,
    propose_roots,
)
from obiemachinelearningframework_spark.operators.features import (
    build_pairs,
    compute_features,
)
from obiemachinelearningframework_spark.operators.fused import (
    _doc_candidates,
    _doc_mentions,
    _doc_roots,
    _doc_stats,
    _pair_features,
    ontology_spec,
    py_link_map,
    unknown_vocabulary_df,
)
from obiemachinelearningframework_spark.operators.mentions import (
    compile_patterns,
    detect_mentions,
    prepare_instances,
)


@pytest.mark.parametrize("domain", ["soccer", "disease"])
def test_full_feature_parity(spark, domain):
    c = generate_corpus(domain, n_docs=25, seed=33)
    ont = c["ontology"]
    inst = prepare_instances(spark.createDataFrame(c["source"])).cache()

    # ---- relational: fuzzy-linked mentions -> pairs -> long features
    from obiemachinelearningframework_spark.operators.linking import (
        apply_link_map,
        build_link_map,
    )
    from obiemachinelearningframework_spark.operators.mentions import UNKNOWN_KIND
    from pyspark.sql import functions as F

    raw = detect_mentions(inst, ont, emit_unknown=True).cache()
    unknown = raw.filter(F.col("kind") == UNKNOWN_KIND).select(
        "doc_key", "text", "onset", "offset", "sent_idx"
    )
    links = build_link_map(unknown, ont, spark)
    linked = apply_link_map(unknown, links)
    mentions = (
        raw.filter(F.col("kind") != UNKNOWN_KIND)
        .unionByName(linked)
        .dropDuplicates(["doc_key", "kind", "type_id", "onset", "offset"])
    )
    roots = propose_roots(mentions, ont)
    cands = generate_candidates(mentions, ont)
    pairs = build_pairs(roots, cands, inst)
    feats = compute_features(pairs, ont)
    rel = defaultdict(float)
    for r in (
        feats.join(
            pairs.select("pair_id", "root_id", "slot_name", "obj_id", "onset"), "pair_id"
        )
        .select("root_id", "slot_name", "obj_id", "onset", "feature", "value")
        .collect()
    ):
        rel[(r.root_id, r.slot_name, r.obj_id, r.onset, r.feature)] += r.value
    assert rel

    # ---- fused: same link map (py mirror), per-doc chain
    spec = ontology_spec(ont)
    compiled = compile_patterns(compile_pattern_table(ont))
    vocab = [r["text"] for r in unknown_vocabulary_df(inst, ont).collect()]
    link_map = py_link_map(vocab, ont)
    fused = defaultdict(float)
    for row in inst.select("doc_key", "content").collect():
        m = _doc_mentions(row["content"], compiled, 2, link_map,
                          dict_tokens=spec["dict_tokens"])
        roots_f = _doc_roots(m, spec, row["doc_key"])
        if not roots_f:
            continue
        cands_f = _doc_candidates(m, spec)
        if not cands_f:
            continue
        stats = _doc_stats(roots_f, cands_f)
        for r in roots_f:
            for cd in cands_f:
                for feat, val in _pair_features(r, cd, row["content"], stats, spec, None):
                    fused[(r["root_id"], cd["slot_name"], cd["obj_id"], cd["onset"], feat)] += val

    rel_r = {k: round(v, 9) for k, v in rel.items()}
    fus_r = {k: round(v, 9) for k, v in fused.items()}
    only_rel = {k: v for k, v in rel_r.items() if fus_r.get(k) != v}
    only_fus = {k: v for k, v in fus_r.items() if rel_r.get(k) != v}
    assert not only_rel and not only_fus, (
        f"{domain}: feature fork — relational-only/mismatched "
        f"{len(only_rel)} (e.g. {sorted(only_rel)[:5]}), fused-only/mismatched "
        f"{len(only_fus)} (e.g. {sorted(only_fus)[:5]})"
    )
