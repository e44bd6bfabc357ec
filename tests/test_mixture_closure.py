"""Semantics of the training-mixture planner and the ontology type
closure, pinned against pure-Python recomputation."""

import hashlib

import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import (
    DICT,
    KG_TYPE_PARENT,
    MIXTURE_WEIGHTS,
    q_kg_type_closure,
    q_sample_mixture,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sample_mixture_matches_python(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n = docs.lang.value_counts().to_dict()
    t = min(n[l] / w for l, w in MIXTURE_WEIGHTS.items())
    rate = {l: min(1.0, t * w / n[l]) for l, w in MIXTURE_WEIGHTS.items()}

    kept = {l: 0 for l in MIXTURE_WEIGHTS}
    for _, row in docs.iterrows():
        h = hashlib.md5(f"m{row.doc_id}".encode()).hexdigest()
        u = round(int(h[:4], 16) / 65536.0, 6)
        if u < rate[row.lang]:
            kept[row.lang] += 1
    tot = sum(kept.values())

    got = {r.lang: r for r in q_sample_mixture(spark, SF_DIR).collect()}
    assert set(got) == set(MIXTURE_WEIGHTS)
    binding = [l for l in rate if rate[l] == 1.0]
    assert binding  # waterfilling: at least one language is kept in full
    for l, r in got.items():
        assert r.n_avail == n[l]
        assert r.rate == pytest.approx(round(rate[l], 6), abs=1e-9)
        assert r.n_kept == kept[l]
        assert r.achieved_frac == pytest.approx(round(kept[l] / tot, 6), abs=1e-9)
    # the achieved mixture lands near the target (hash sampling is
    # binomial around the planned rate)
    for l, w in MIXTURE_WEIGHTS.items():
        assert abs(got[l].achieved_frac - w) < 0.06


def test_kg_type_closure_matches_python(spark):
    parents = {}
    for c, p in KG_TYPE_PARENT:
        parents.setdefault(c, []).append(p)

    def ancestors(t):
        out, frontier, d = {}, [t], 0
        while frontier:
            d += 1
            nxt = []
            for node in frontier:
                for p in parents.get(node, ()):
                    if p not in out:
                        out[p] = d
                        nxt.append(p)
            frontier = nxt
        return out

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    surfaces = {s: t for s, t in DICT}
    asserted = set()
    for _, row in docs.iterrows():
        for tok in row.text.split(" "):
            if tok in surfaces:
                asserted.add((tok, surfaces[tok]))
    # DICT maps some surfaces to one type only; recover all pairs
    asserted = {(tok, t) for tok, t0 in asserted for s, t in DICT if s == tok}

    want = {(tok, t, anc, d)
            for tok, t in asserted for anc, d in ancestors(t).items()}
    got = {(r.obj, r.type_id, r.ancestor, r.depth)
           for r in q_kg_type_closure(spark, SF_DIR).collect()}
    assert got == want and len(got) > 0
    # every asserted type reaches the root at depth 2
    assert all(("Concept" in {a for (_, tt, a, _) in got if tt == t})
               for t in {t for (_, t) in asserted})


def test_mixture_waterfilling_properties():
    """Property check of the planner math itself (pure logic, no Spark):
    for arbitrary counts/weights — no upsampling, the binding language is
    kept in full, and planned kept-counts realize the target proportions
    exactly."""
    from hypothesis import given, strategies as st

    langs = ["a", "b", "c", "d"]

    @given(
        ns=st.lists(st.integers(min_value=1, max_value=10**9),
                    min_size=4, max_size=4),
        ws=st.lists(st.floats(min_value=0.01, max_value=1.0,
                              allow_nan=False), min_size=4, max_size=4),
    )
    def prop(ns, ws):
        tot_w = sum(ws)
        w = {l: x / tot_w for l, x in zip(langs, ws)}
        n = dict(zip(langs, ns))
        t = min(n[l] / w[l] for l in langs)
        rate = {l: min(1.0, t * w[l] / n[l]) for l in langs}
        assert all(0.0 < rate[l] <= 1.0 for l in langs)          # no upsampling
        assert any(abs(rate[l] - 1.0) < 1e-9 for l in langs)     # binding lang full
        planned = {l: t * w[l] for l in langs}                   # expected keeps
        tot = sum(planned.values())
        for l in langs:
            assert planned[l] <= n[l] * (1 + 1e-9)
            assert abs(planned[l] / tot - w[l]) < 1e-6           # exact mixture

    prop()
