"""Round-3 additions — KG node similarity, leakage-safe split assignment,
containment dedup, embedding dimension stats, and link-prediction eval —
pinned against pure-Python recomputation (the DuckDB oracle checks engine
parity; this checks the math)."""

import math
from collections import defaultdict

import numpy as np
import pytest

from obiemachinelearningframework_spark.queries import (
    LINKPRED_HIT_K,
    NODE_SIM_HUB_CAP,
    SPLIT_TRAIN_UB,
    SPLIT_VAL_UB,
    q_dedup_containment,
    q_embedding_dim_stats,
    q_kg_link_prediction_eval,
    q_kg_node_similarity,
    q_mentions_dict,
    q_split_leakage_safe,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def adjacency(spark):
    m = q_mentions_dict(spark, SF_DIR).select("doc_id", "token").distinct()
    per_doc = defaultdict(set)
    for r in m.collect():
        per_doc[r.doc_id].add(r.token)
    edges = set()
    for toks in per_doc.values():
        ts = sorted(toks)
        for i, u in enumerate(ts):
            for v in ts[i + 1:]:
                edges.add((u, v))
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    return edges, nbrs


def test_node_similarity_matches_python(spark, adjacency):
    _, nbrs = adjacency
    got = {(r.u, r.v): r for r in q_kg_node_similarity(spark, SF_DIR).collect()}
    # expected: pairs sharing >=1 neighbor of degree <= cap
    expected = defaultdict(set)
    for w, ns in nbrs.items():
        if len(ns) > NODE_SIM_HUB_CAP:
            continue
        ns_sorted = sorted(ns)
        for i, x in enumerate(ns_sorted):
            for y in ns_sorted[i + 1:]:
                expected[(x, y)].add(w)
    assert set(got) == set(expected)
    for (x, y), shared in expected.items():
        r = got[(x, y)]
        assert r.common == len(shared)
        assert r.deg_u == len(nbrs[x]) and r.deg_v == len(nbrs[y])
        want_j = len(shared) / (len(nbrs[x]) + len(nbrs[y]) - len(shared))
        assert r.jaccard == pytest.approx(want_j, abs=1e-6)
        want_aa = sum(round(1.0 / math.log(len(nbrs[w])), 6) for w in shared)
        assert r.adamic_adar == pytest.approx(want_aa, abs=1e-9)
        # capped common never exceeds the true neighborhood intersection
        assert r.common <= len(nbrs[x] & nbrs[y])


def test_split_is_leakage_safe_and_total(spark):
    rows = q_split_leakage_safe(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == docs  # every document is assigned exactly once
    by_group = defaultdict(set)
    for r in rows:
        assert r.split in ("train", "val", "test")
        assert (r.u < SPLIT_TRAIN_UB) == (r.split == "train")
        assert (SPLIT_TRAIN_UB <= r.u < SPLIT_VAL_UB) == (r.split == "val")
        by_group[r.group_key].add(r.split)
    # the leakage guarantee: a near-dup component never straddles splits
    assert all(len(s) == 1 for s in by_group.values())
    frac_train = sum(r.split == "train" for r in rows) / len(rows)
    assert 0.6 < frac_train < 0.95  # hash-uniform at 500 docs, loose bound


def test_containment_bounds_and_symmetry(spark):
    rows = q_dedup_containment(spark, SF_DIR).collect()
    assert rows  # the LSH candidates exist at sf0.001
    for r in rows:
        assert 0 <= r.inter <= min(r.n_a, r.n_b)
        assert 0.0 <= r.containment_a <= 1.0
        assert 0.0 <= r.containment_b <= 1.0
        # containment dominates jaccard in both directions (both at the
        # operator's 6-dp rounding)
        j = round(r.inter / (r.n_a + r.n_b - r.inter), 6)
        assert r.containment_a >= j - 1e-9 and r.containment_b >= j - 1e-9


def test_embedding_dim_stats_matches_numpy(spark):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    mat = np.round(np.stack(emb["embedding"].to_numpy()).astype(np.float64), 6)
    got = {r.dim: r for r in q_embedding_dim_stats(spark, SF_DIR).collect()}
    assert set(got) == set(range(mat.shape[1]))
    for d in range(mat.shape[1]):
        col = mat[:, d]
        r = got[d]
        assert r.n == len(col)
        assert r.mean == pytest.approx(col.mean(), abs=2e-6)
        assert r.variance == pytest.approx(col.var(), abs=2e-6)
        assert r.vmin == pytest.approx(col.min(), abs=1e-9)
        assert r.vmax == pytest.approx(col.max(), abs=1e-9)


def test_link_prediction_eval_invariants(spark, adjacency):
    edges, _ = adjacency
    rows = q_kg_link_prediction_eval(spark, SF_DIR).collect()
    assert rows
    held = {(r.u, r.v) for r in rows}
    assert held <= edges  # held-out positives are real edges
    assert 0.05 < len(held) / len(edges) < 0.6  # ~HOLDOUT_RATE of the graph
    for r in rows:
        if r.rank == 0:  # true edge had no candidate path in the rest graph
            assert r.common == 0 and r.rr == 0.0 and r[f"hit{LINKPRED_HIT_K}"] == 0
        else:
            assert r.rr == pytest.approx(round(1.0 / r.rank, 6), abs=1e-9)
            assert r[f"hit{LINKPRED_HIT_K}"] == int(r.rank <= LINKPRED_HIT_K)
    # the predictor beats random on this graph: some held edges recovered
    assert any(r[f"hit{LINKPRED_HIT_K}"] == 1 for r in rows)
