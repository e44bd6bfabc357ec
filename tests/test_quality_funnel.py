"""Semantics of the quality-gate funnel report and the MinHash
sketch-accuracy report, pinned against pure-Python recomputation (the
DuckDB oracle checks engine parity; these check the math)."""

import hashlib

import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import (
    N_MINHASH,
    QF_MAX_AVG_NLL,
    QF_MAX_DUP_TOKEN,
    QF_MAX_TOP_TOKEN,
    QF_MIN_TOKENS,
    q_dedup_minhash_lsh,
    q_minhash_est_error,
    q_quality_funnel,
    q_quality_perplexity,
    q_quality_repetition,
    q_quality_score,
)

SF_DIR = "/root/testdata/sf0.001"


def _toks(text):
    return [t for t in text.split(" ") if t]


def _shingle_set(text):
    toks = _toks(text)
    return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}


def test_quality_funnel_matches_python(spark):
    scores = {r.doc_id: r.n_tokens
              for r in q_quality_score(spark, SF_DIR).collect()}
    rep = {r.doc_id: r for r in q_quality_repetition(spark, SF_DIR).collect()}
    ppl = {r.doc_id: r.avg_nll
           for r in q_quality_perplexity(spark, SF_DIR).collect()}

    s = [len(scores), 0, 0, 0, 0]
    for d, n_tok in scores.items():
        g = [n_tok >= QF_MIN_TOKENS,
             rep[d].dup_token_frac <= QF_MAX_DUP_TOKEN,
             rep[d].top_token_frac <= QF_MAX_TOP_TOKEN,
             ppl[d] <= QF_MAX_AVG_NLL]
        for i in range(4):
            if not all(g[:i + 1]):
                break
            s[i + 1] += 1

    got = {r.stage: r for r in q_quality_funnel(spark, SF_DIR).collect()}
    assert sorted(got) == [1, 2, 3, 4]
    for stage in range(1, 5):
        r = got[stage]
        assert r.n_in == s[stage - 1]
        assert r.n_pass == s[stage]
        assert r.n_drop == r.n_in - r.n_pass
    # a sequential funnel: every stage's intake is the previous survivors,
    # and on this corpus every gate actually rejects something
    assert got[1].n_in == len(scores)
    for stage in range(2, 5):
        assert got[stage].n_in == got[stage - 1].n_pass
    assert all(got[s_].n_drop > 0 for s_ in range(1, 5))
    assert got[4].n_pass > 0


def test_minhash_est_error_matches_python(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    text = dict(zip(docs.doc_id, docs.text))

    pairs = {(r.doc_a, r.doc_b)
             for r in q_dedup_minhash_lsh(spark, SF_DIR).collect()}
    got = {(r.doc_a, r.doc_b): r
           for r in q_minhash_est_error(spark, SF_DIR).collect()}
    # one report row per banded candidate pair, never all-pairs
    assert set(got) == pairs and len(pairs) > 0

    def sig(doc_id):
        sh = _shingle_set(text[doc_id])
        return [min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in sh)
                for i in range(N_MINHASH)]

    for (a, b), r in got.items():
        sa, sb = sig(a), sig(b)
        est = sum(x == y for x, y in zip(sa, sb)) / N_MINHASH
        A, B = _shingle_set(text[a]), _shingle_set(text[b])
        exact = len(A & B) / len(A | B)
        assert r.est_jaccard == pytest.approx(est, abs=1e-6)
        assert r.exact_jaccard == pytest.approx(exact, abs=1e-6)
        assert r.abs_err == pytest.approx(abs(est - exact), abs=1e-6)
