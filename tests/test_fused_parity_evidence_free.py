"""Feature parity between the relational projection and the fused kernel on
the EVIDENCE-FREE candidate branch (onset = offset = -1, produced for
sibling-differentiable / whitelisted classes): the fixture domains carry no
evidence-free classes, so tests/test_fused_parity.py never exercises this
path — a Python negative-index slice once forked the right-context features
here while both suites stayed green (caught in review, pinned by this
test). Compares the FULL per-pair feature dicts, not just triples."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.functions.patterns import compile_pattern_table
from obiemachinelearningframework_spark.operators.mentions import compile_patterns
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
)
from obiemachinelearningframework_spark.operators.mentions import (
    detect_mentions,
    prepare_instances,
)

from tests.test_exploration_gating import diff_ontology  # noqa: F401  (fixture)

CONTENT = "Case One underwent surgery last week and recovered fully."


def test_evidence_free_pair_features_match(spark, diff_ontology):  # noqa: F811
    ont = diff_ontology
    src = spark.createDataFrame(
        pd.DataFrame(
            [("org0/p", "a.txt", "c" * 40, "text", CONTENT)],
            columns=["repo", "path", "commit", "lang", "content"],
        )
    )
    inst = prepare_instances(src)

    # ---- relational features keyed by (slot, obj, onset, feature)
    mentions = detect_mentions(inst, ont)
    roots = propose_roots(mentions, ont)
    cands = generate_candidates(mentions, ont)
    pairs = build_pairs(roots, cands, inst)
    feats = compute_features(pairs, ont)
    keyed = (
        feats.join(
            pairs.select("pair_id", "slot_name", "obj_id", "onset"), "pair_id"
        )
        .select("slot_name", "obj_id", "onset", "feature", "value")
        .collect()
    )
    rel = {(r.slot_name, r.obj_id, r.onset, r.feature): round(r.value, 9) for r in keyed}
    assert rel, "relational side produced no features"
    # the evidence-free Medication candidate must be present on both sides
    assert any(k[1] == "Medication" and k[2] == -1 for k in rel)

    # ---- fused features for the same document
    spec = ontology_spec(ont)
    compiled = compile_patterns(compile_pattern_table(ont))
    doc_key = inst.select("doc_key").first()["doc_key"]
    m = _doc_mentions(CONTENT, compiled, 2, {})
    roots_f = _doc_roots(m, spec, doc_key)
    cands_f = _doc_candidates(m, spec)
    stats = _doc_stats(roots_f, cands_f)
    fused = {}
    for r in roots_f:
        for c in cands_f:
            for feat, val in _pair_features(r, c, CONTENT, stats, spec, None):
                key = (c["slot_name"], c["obj_id"], c["onset"], feat)
                fused[key] = round(fused.get(key, 0.0) + val, 9)

    missing = {k: v for k, v in rel.items() if fused.get(k) != v}
    extra = {k: v for k, v in fused.items() if rel.get(k) != v}
    assert not missing and not extra, (
        f"feature fork between plans:\nrelational-only/mismatched: {sorted(missing)[:10]}\n"
        f"fused-only/mismatched: {sorted(extra)[:10]}"
    )
