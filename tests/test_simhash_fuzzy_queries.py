"""Semantics pins for the round-3 registry additions.

* ``dedup_simhash_band`` — LSH banding over a 32-bit SimHash must be
  LOSSLESS for the hamming <= 3 radius (pigeonhole over 4 disjoint 8-bit
  bands) whenever no bucket trips the hot-key cap: the banded pair set is
  asserted EQUAL to the brute-force all-pairs hamming scan.
* ``fuzzy_topk_links`` — the production ``build_link_map`` retrieval
  (LuceneRetrieval.java:39-40 semantics: top-5 alternatives, lev-sim >=
  0.7) must admit clean one-edit surfaces, reject transpositions below the
  gate, and emit a contiguous rank column.
"""

import numpy as np
import pytest

from obiemachinelearningframework_spark.queries import (
    FUZZY_TOKENS,
    SIMHASH_BUCKET_CAP,
    SIMHASH_MAX_HAMMING,
    _simhash32,
    q_dedup_simhash_band,
    q_fuzzy_topk_links,
)

SF_DIR = "/root/testdata/sf0.001"


def test_simhash_banding_lossless_vs_bruteforce(spark):
    sig = {r.doc_id: r.simhash32 for r in _simhash32(spark, SF_DIR).collect()}
    ids = sorted(sig)
    vals = np.array([sig[i] for i in ids], dtype=np.uint64)
    # brute-force hamming over all pairs
    x = vals[:, None] ^ vals[None, :]
    ham = np.zeros_like(x, dtype=np.int64)
    for b in range(32):
        ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
    ii, jj = np.where(np.triu(ham <= SIMHASH_MAX_HAMMING, k=1))
    expected = {(min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in zip(ii, jj)}

    rows = q_dedup_simhash_band(spark, SF_DIR).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    # precondition for losslessness: no (band, value) bucket above the cap
    from collections import Counter

    buckets = Counter()
    for v in vals:
        for band in range(4):
            buckets[(band, int(v >> np.uint64(band * 8)) & 0xFF)] += 1
    assert max(buckets.values()) <= SIMHASH_BUCKET_CAP, "fixture outgrew the cap"
    assert got == expected
    for r in rows:
        assert r.hamming <= SIMHASH_MAX_HAMMING
        assert r.doc_a < r.doc_b


def test_fuzzy_topk_links_gate_and_ranks(spark):
    rows = q_fuzzy_topk_links(spark, SF_DIR).collect()
    by_token = {}
    for r in rows:
        by_token.setdefault(r.token, []).append(r)
    # clean one-edit surfaces link to their dictionary entry
    for token, surface, cls in [
        ("windoww", "window", "Operator"),
        ("tablee", "table", "Dataset"),
        ("custmor", "customer", "Entity"),
        ("sparkk", "spark", "System"),
    ]:
        top = min(by_token[token], key=lambda r: r.rank)
        assert (top.type_id, top.class_id) == (surface, cls)
    # transpositions sit below the 0.7 levenshtein gate in BOTH engines
    for rejected in ["tabel", "fliter", "mrege", "colunm", "vektor", "queyr"]:
        assert rejected not in by_token
    # ambiguous surfaces retrieve BOTH gated candidates, ordered by the
    # jaccard tie-break (equal lev-sim): window before windows, spark
    # before sparky — the exploration layer sees both alternatives
    for token, first, second in [("windoww", "window", "windows"),
                                 ("sparkk", "spark", "sparky")]:
        rs = sorted(by_token[token], key=lambda r: r.rank)
        assert [r.type_id for r in rs[:2]] == [first, second]
        assert rs[0].lev_sim == rs[1].lev_sim
    # ranks are contiguous from 1 and capped at top-5
    for token, rs in by_token.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert ranks[-1] <= 5
        for r in rs:
            assert r.lev_sim >= 0.7
    assert set(FUZZY_TOKENS) >= set(by_token)
