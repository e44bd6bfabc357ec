"""curation_funnel composition pinned against pure-Python recomputation on
a synthetic corpus where every gate removes something: planted exact
duplicates, near-duplicates, and a benchmark-contaminated document (the
fixture corpus has no exact dups, so the DuckDB oracle alone never
exercises stage 1's removal path)."""

import hashlib
from collections import defaultdict

import pytest

from obiemachinelearningframework_spark.queries import (
    DECON_SNIPPETS,
    INCR_EST_MIN,
    MAX_BUCKET_DOCS,
    N_MINHASH,
    SHINGLE_K,
    _snippet_shingles,
    q_curation_funnel,
)


def _texts():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota MU"
    contaminated = "filler words then " + DECON_SNIPPETS[0][1] + " trailing text"
    return [
        (0, base),
        (1, base),                                     # exact dup of 0
        (2, near),                                     # near dup of 0
        (3, "one two three four five six seven eight"),
        (4, contaminated),                             # benchmark leak
        (5, "completely unrelated tokens in this doc"),
    ]


def _python_funnel(rows):
    def shingles(text):
        toks = [t for t in text.split(" ") if t]
        return {" ".join(toks[i:i + SHINGLE_K])
                for i in range(len(toks) - SHINGLE_K + 1)}

    # stage 1: exact
    by_sha = defaultdict(list)
    for d, t in rows:
        by_sha[hashlib.sha256(t.encode()).hexdigest()].append(d)
    s1 = {min(ds) for ds in by_sha.values()}
    n0, r1 = len(rows), len(rows) - len(s1)
    # stage 2: near dup among s1
    text = dict(rows)
    sig = {}
    for d in s1:
        sh = shingles(text[d])
        if sh:
            sig[d] = [min(hashlib.md5(f"{i}:{s}".encode()).hexdigest()
                          for s in sh) for i in range(N_MINHASH)]
    buckets = defaultdict(list)
    for d, hs in sig.items():
        for b in range(N_MINHASH // 2):
            key = hashlib.md5(f"{hs[2 * b]}|{hs[2 * b + 1]}".encode()).hexdigest()
            buckets[(b, key)].append(d)
    rm2 = set()
    for members in buckets.values():
        if len(members) > MAX_BUCKET_DOCS:
            continue
        for a in members:
            for b in members:
                if a < b and sum(
                    x == y for x, y in zip(sig[a], sig[b])
                ) / N_MINHASH >= INCR_EST_MIN:
                    rm2.add(b)
    s2 = s1 - rm2
    # stage 3: decontaminate among s2
    snip_sh = {sh for _, sh in _snippet_shingles()}
    rm3 = {d for d in s2 if shingles(text[d]) & snip_sh}
    return [
        ("1_exact", n0, r1, n0 - r1),
        ("2_near_dup", n0 - r1, len(rm2), n0 - r1 - len(rm2)),
        ("3_decontaminate", n0 - r1 - len(rm2), len(rm3),
         n0 - r1 - len(rm2) - len(rm3)),
    ]


def test_funnel_matches_python_and_every_gate_bites(spark, tmp_path):
    rows = _texts()
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(f"{sf_dir}/documents.parquet")
    want = _python_funnel(rows)
    got = [(r.stage, r.docs_in, r.removed, r.docs_out)
           for r in q_curation_funnel(spark, sf_dir).orderBy("stage").collect()]
    assert got == want
    # every gate removes at least one document on this corpus
    assert all(rem >= 1 for _, _, rem, _ in got)
    # and the funnel telescopes
    assert all(got[i][3] == got[i + 1][1] for i in range(2))


def test_funnel_on_fixture_matches_components(spark):
    """On the real fixture the funnel's stage counts must telescope and
    stage 1 must equal the corpus minus distinct-sha count."""
    sf_dir = "/root/testdata/sf0.001"
    got = {r.stage: r for r in q_curation_funnel(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import pyspark.sql.functions as F

    n0 = docs.count()
    n_sha = docs.select(F.sha2("text", 256)).distinct().count()
    assert got["1_exact"].docs_in == n0
    assert got["1_exact"].removed == n0 - n_sha
    assert got["1_exact"].docs_out == got["2_near_dup"].docs_in
    assert got["2_near_dup"].docs_out == got["3_decontaminate"].docs_in
