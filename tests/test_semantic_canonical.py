"""SemDeDup (queries.dedup_semantic) and quality-aware canonicalization
(queries.canonicalize_quality) pinned against pure-Python recomputation
on the sf0.001 tables — the house convention for registry operators
(DuckDB parity runs separately via tools/check_oracles.py)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from obiemachinelearningframework_spark.queries import (
    QUERIES,
    SEM_EPS,
    SEM_K,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vectors():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    V = np.stack(t.embedding.values).astype(np.float64)
    return t.vec_id.to_numpy(), V / np.linalg.norm(V, axis=1, keepdims=True)


def _py_semdedup(ids, V):
    """Reference recomputation of the documented rule: assign to the
    nearest pinned centroid (round-6 cosine, min cid tie-break), rank each
    cluster by (round-6 centroid cosine ASC, vec_id ASC), remove a member
    iff some earlier-ranked same-cluster member has round-6 cosine >=
    SEM_EPS."""
    cent = V[np.isin(ids, range(SEM_K))]
    cos_c = np.round(V @ cent.T, 6)
    cid = np.argmax(cos_c, axis=1)  # argmax takes the first (min cid) on ties
    own = cos_c[np.arange(len(ids)), cid]
    keep = {}
    for c in np.unique(cid):
        members = [(own[i], ids[i], i) for i in np.where(cid == c)[0]]
        members.sort()
        for pos, (_, vid, i) in enumerate(members):
            removed = any(
                np.round(float(V[i] @ V[j]), 6) >= SEM_EPS
                for _, _, j in members[:pos]
            )
            keep[vid] = (int(c), float(own[i]), 0 if removed else 1)
    return keep


def test_dedup_semantic_matches_pure_python(spark, vectors):
    ids, V = vectors
    want = _py_semdedup(ids, V)
    got = {
        r.vec_id: (r.cid, r.centroid_cos, r.keep)
        for r in QUERIES["dedup_semantic"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for vid, (cid, cc, keep) in want.items():
        gcid, gcc, gkeep = got[vid]
        assert gcid == cid and gkeep == keep, (vid, got[vid], want[vid])
        assert abs(gcc - cc) < 1e-6
    # non-trivial on this data: something is removed, most is kept
    removed = sum(1 for _, _, k in want.values() if k == 0)
    assert 0 < removed < len(want)


def test_canonicalize_quality_picks_best_member(spark):
    rows = QUERIES["canonicalize_quality"](spark, SF_DIR).collect()
    assert rows, "near-dup clusters exist at sf0.001"
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        assert len(members) >= 2, "singletons are not emitted"
        best = sorted(members, key=lambda r: (-r.n_tokens, r.doc_id))[0]
        for r in members:
            assert r.canonical_id == best.doc_id
            assert r.is_canonical == int(r.doc_id == best.doc_id)
        assert sum(r.is_canonical for r in members) == 1
    # the quality rule genuinely differs from min-id somewhere, else the
    # operator collapses into connected_components' existing labeling
    assert any(
        sorted(m, key=lambda r: (-r.n_tokens, r.doc_id))[0].doc_id
        != min(r.doc_id for r in m)
        for m in by_comp.values()
    )
