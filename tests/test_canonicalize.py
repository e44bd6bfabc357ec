"""Connected-components correctness vs a driver-side union-find oracle."""

import numpy as np

from obiemachinelearningframework_spark.operators.canonicalize import (
    canonicalize_triples,
    connected_components,
)


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # path-compress to canonical min representative
    return {x: find(x) for x in parent}


def test_cc_matches_union_find(spark):
    rng = np.random.RandomState(0)
    nodes = [f"e{i:03d}" for i in range(200)]
    edges = [(nodes[int(rng.randint(200))], nodes[int(rng.randint(200))]) for _ in range(180)]
    edges += [(n, n) for n in nodes]  # self edges (singletons must survive)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.component for r in connected_components(df).collect()}
    want = _union_find_oracle(edges)
    # min-representative canonicalization must agree exactly
    assert got == {k: want[k] for k in got}


def test_canonicalize_triples_rewrites_both_sides(spark):
    triples = spark.createDataFrame(
        [("d1", "player_a", "team", "team_x"), ("d2", "player_b", "team", "team_y")],
        ["doc_key", "subj", "pred", "obj"],
    )
    comp = spark.createDataFrame(
        [("player_b", "player_a"), ("team_y", "team_x")], ["id", "component"]
    )
    out = {(r.doc_key, r.subj, r.pred, r.obj) for r in canonicalize_triples(triples, comp).collect()}
    assert out == {("d1", "player_a", "team", "team_x"), ("d2", "player_a", "team", "team_x")}


def test_driver_cc_gate_matches_distributed(spark):
    """The bounded take() driver gate (DRIVER_CC_MAX) must be a pure
    fast path: identical (id, component) output as the distributed
    pointer-jumping loop on the same graph."""
    from obiemachinelearningframework_spark.operators.canonicalize import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 4), (7, 7), (10, 9), (9, 8), (8, 6)],
        "src bigint, dst bigint",
    )
    fast = {(r["id"], r["component"])
            for r in connected_components(edges).collect()}
    slow = {(r["id"], r["component"])
            for r in connected_components(edges, driver_max=0).collect()}
    assert fast == slow
    assert fast == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (7, 7),
                    (6, 6), (8, 6), (9, 6), (10, 6)}
