"""KG-analytics semantics pinned against pure-Python recomputation on the
small materialized graph (the DuckDB oracle checks engine parity; this
checks the math)."""

from collections import defaultdict

import pytest

from obiemachinelearningframework_spark.queries import (
    PAGERANK_D,
    PAGERANK_ITERS,
    q_kg_degree,
    q_kg_pagerank,
    q_triples_kg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def triples(spark):
    return [(r.subj, r.pred, r.obj) for r in q_triples_kg(spark, SF_DIR).collect()]


def test_degree_matches_python(spark, triples):
    out_deg, in_deg = defaultdict(int), defaultdict(int)
    out_preds, in_preds = defaultdict(set), defaultdict(set)
    for s, p, o in triples:
        out_deg[s] += 1
        in_deg[o] += 1
        out_preds[s].add(p)
        in_preds[o].add(p)
    got = {r.node: r for r in q_kg_degree(spark, SF_DIR).collect()}
    assert set(got) == set(out_deg) | set(in_deg)
    for node, r in got.items():
        assert r.out_deg == out_deg.get(node, 0)
        assert r.in_deg == in_deg.get(node, 0)
        assert r.out_preds == len(out_preds.get(node, ()))
        assert r.in_preds == len(in_preds.get(node, ()))


def test_pagerank_matches_python(spark, triples):
    edges = sorted({(s, o) for s, _, o in triples})
    nodes = sorted({s for s, _ in edges} | {o for _, o in edges})
    n = len(nodes)
    outd = defaultdict(int)
    for s, _ in edges:
        outd[s] += 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(PAGERANK_ITERS):
        contrib = defaultdict(float)
        for s, o in edges:
            contrib[o] += pr[s] / outd[s]
        pr = {v: (1 - PAGERANK_D) / n + PAGERANK_D * contrib.get(v, 0.0)
              for v in nodes}
    got = {r.node: r.pagerank for r in q_kg_pagerank(spark, SF_DIR).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(pr[v], abs=2e-6)
    # docs only emit rank (bipartite sources): every doc node holds the floor
    doc_rank = {v: r for v, r in got.items() if v.startswith("doc_")}
    assert doc_rank and all(r == pytest.approx((1 - PAGERANK_D) / n, abs=2e-6)
                            for r in doc_rank.values())
    # entity ranks strictly exceed the floor and total mass stays below 1
    # (dangling leak) but above the undamped floor
    floor = (1 - PAGERANK_D) / n
    assert all(got[v] > floor for v in nodes if not v.startswith("doc_"))
    assert (1 - PAGERANK_D) < sum(got.values()) <= 1.0 + 1e-6


def test_snapshot_apply_roundtrip(spark):
    """apply(base, diff(base, live)) == live, row-for-row — the MERGE
    invariant that makes incremental checkpointed runs resumable."""
    from obiemachinelearningframework_spark.queries import (
        PRED_DICT, q_kg_snapshot_apply, _tokens,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, q_kg_snapshot_apply(spark, sf).collect()))
    pred_dict = spark.createDataFrame(PRED_DICT, ["surface", "type_id"])
    t = _tokens(spark, sf)
    live = (
        t.join(F.broadcast(pred_dict), t.token == pred_dict.surface)
        .select(
            F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("subj"),
            F.concat(F.lit("mentions_"), F.col("type_id")).alias("pred"),
            F.col("token").alias("obj"),
        ).distinct()
    )
    want = sorted(map(tuple, live.collect()))
    assert got == want and len(got) > 0
