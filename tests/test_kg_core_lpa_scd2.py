"""k-core / label-propagation / SCD2 semantics pinned against pure-Python
recomputation on the small materialized graph (the DuckDB oracle checks
engine parity; this checks the math)."""

from collections import Counter, defaultdict

import pytest

from obiemachinelearningframework_spark.queries import (
    KCORE_K,
    KCORE_ROUNDS,
    LPA_ITERS,
    SCD2_SNAPSHOTS,
    q_kg_kcore,
    q_kg_label_propagation,
    q_kg_scd2,
    q_mentions_dict,
    q_triples_kg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sym_edges(spark):
    und = {(r.subj, r.obj) for r in q_triples_kg(spark, SF_DIR).collect()}
    return sorted(und | {(b, a) for a, b in und})


def test_kcore_matches_python(spark, sym_edges):
    edges = set(sym_edges)
    for _ in range(KCORE_ROUNDS):
        deg = Counter(a for a, _ in edges)
        alive = {n for n, d in deg.items() if d >= KCORE_K}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
    want = Counter(a for a, _ in edges)
    got = {r.node: r.deg for r in q_kg_kcore(spark, SF_DIR).collect()}
    assert got == dict(want)
    # the fixture graph must actually exercise pruning: some node of the
    # full graph is gone from the core
    full_nodes = {a for a, _ in sym_edges}
    assert set(got) < full_nodes


def test_lpa_matches_python(spark, sym_edges):
    nbrs = defaultdict(list)
    for a, b in sym_edges:
        nbrs[a].append(b)
    labels = {n: n for n in nbrs}
    for _ in range(LPA_ITERS):
        nxt = {}
        for n, ns in nbrs.items():
            cnt = Counter(labels[m] for m in ns)
            top = max(cnt.values())
            nxt[n] = min(l for l, c in cnt.items() if c == top)
        labels = nxt
    got = {r.node: r.community for r in q_kg_label_propagation(spark, SF_DIR).collect()}
    assert got == labels
    # propagation must have merged communities (fewer labels than nodes)
    assert len(set(got.values())) < len(got)


def test_scd2_matches_python(spark):
    rows = q_mentions_dict(spark, SF_DIR).collect()
    trip = {(r.doc_id, f"doc_{r.doc_id}", f"mentions_{r.type_id}", r.token)
            for r in rows}
    want = {}
    for doc_id, subj, pred, obj in trip:
        snaps = [k for k in range(1, SCD2_SNAPSHOTS + 1) if (doc_id + k) % 4 != 0]
        version, prev = 0, None
        for s in snaps:
            if prev is None or s - prev > 1:
                version += 1
                want[(subj, pred, obj, version)] = [s, s]
            else:
                want[(subj, pred, obj, version)][1] = s
            prev = s
    got = q_kg_scd2(spark, SF_DIR).collect()
    assert len(got) == len(want)
    n_current = 0
    for r in got:
        lo, hi = want[(r.subj, r.pred, r.obj, r.version)]
        assert (r.valid_from, r.valid_to) == (lo, hi)
        assert r.is_current == int(hi == SCD2_SNAPSHOTS)
        n_current += r.is_current
    # the rotation must produce both closed (historical) and current
    # versions, and some triple must have 2 versions (a real gap)
    assert 0 < n_current < len(got)
    assert any(k[3] == 2 for k in want)


def test_time_travel_reconstructs_every_snapshot(spark):
    """The history-reconstruction invariant behind kg_time_travel, for
    ALL snapshots (the registry row pins T=TIME_TRAVEL_T against the
    direct extraction; this closes the loop for the rest): filtering the
    SCD2 intervals at T yields exactly the triples present at T."""
    from obiemachinelearningframework_spark.queries import q_kg_scd2

    rows = q_mentions_dict(spark, SF_DIR).collect()
    trip = {(r.doc_id, f"doc_{r.doc_id}", f"mentions_{r.type_id}", r.token)
            for r in rows}
    iv = q_kg_scd2(spark, SF_DIR).collect()
    for t in range(1, SCD2_SNAPSHOTS + 1):
        got = {(r.subj, r.pred, r.obj)
               for r in iv if r.valid_from <= t <= r.valid_to}
        want = {(subj, pred, obj)
                for doc_id, subj, pred, obj in trip if (doc_id + t) % 4 != 0}
        assert got == want, f"snapshot {t}"


def test_neighbor_sample_matches_python(spark, sym_edges):
    import hashlib

    from obiemachinelearningframework_spark.queries import NS_K, q_kg_neighbor_sample

    nbrs = defaultdict(list)
    for a, b in sym_edges:
        nbrs[a].append(b)
    want = {}
    for n, ns in nbrs.items():
        ranked = sorted(ns, key=lambda b: hashlib.md5(f"{n}|{b}".encode()).hexdigest())
        for i, b in enumerate(ranked[:NS_K], 1):
            want[(n, b)] = i
    got = {(r.node, r.nbr): r.rk for r in q_kg_neighbor_sample(spark, SF_DIR).collect()}
    assert got == want
    # the cap must bite: some node has more neighbours than NS_K
    assert max(len(v) for v in nbrs.values()) > NS_K


def test_dedup_incremental_matches_python(spark):
    import hashlib

    from obiemachinelearningframework_spark.queries import (
        INCR_EST_MIN,
        MAX_BUCKET_DOCS,
        N_MINHASH,
        q_dedup_incremental,
        q_minhash_signature,
    )

    sig = {r.doc_id: [r[f"h{i}"] for i in range(N_MINHASH)]
           for r in q_minhash_signature(spark, SF_DIR).collect()}
    buckets = defaultdict(list)
    for d, hs in sig.items():
        for b in range(N_MINHASH // 2):
            key = hashlib.md5(f"{hs[2 * b]}|{hs[2 * b + 1]}".encode()).hexdigest()
            buckets[(b, key)].append(d)
    pairs = set()
    for members in buckets.values():
        if len(members) > MAX_BUCKET_DOCS:
            continue
        for n in members:
            if n % 5 != 0:
                continue
            for o in members:
                if o % 5 != 0:
                    pairs.add((n, o))
    want = {}
    for n, o in sorted(pairs):
        est = round(sum(a == b for a, b in zip(sig[n], sig[o])) / N_MINHASH, 6)
        if est < INCR_EST_MIN:
            continue
        cur = want.get(n)
        if cur is None or (-est, o) < (-cur[1], cur[0]):
            want[n] = (o, est)
    got = {r.doc_id: (r.dup_of, r.est_jaccard)
           for r in q_dedup_incremental(spark, SF_DIR).collect()}
    assert got == want
    assert got, "fixture must contain at least one new-vs-old near-dup"
    assert all(n % 5 == 0 and o % 5 != 0 for n, (o, _) in got.items())
