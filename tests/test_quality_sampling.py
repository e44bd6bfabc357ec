"""Semantics of the sampling / quality-gate operators, pinned against an
independent pure-Python recomputation (the DuckDB oracle checks engine
parity; these tests check the *math* without any SQL in the loop)."""

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import (
    SAMPLE_RATES,
    q_quality_perplexity,
    q_quality_repetition,
    q_sample_stratified,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _toks(text):
    return [t for t in text.split(" ") if t]


def test_sample_stratified_matches_python(spark, docs_pd):
    got = {r.doc_id for r in q_sample_stratified(spark, SF_DIR).collect()}
    want = set()
    for _, row in docs_pd.iterrows():
        h = hashlib.md5(f"s{row.doc_id}".encode()).hexdigest()
        u = round(int(h[:4], 16) / 65536.0, 6)
        if u < SAMPLE_RATES[row.lang]:
            want.add(row.doc_id)
    assert got == want
    # the rarest language is kept in full, the dominant one is downsampled
    langs = docs_pd.set_index("doc_id")["lang"]
    kept = Counter(langs[d] for d in got)
    total = Counter(langs)
    assert kept["zh"] == total["zh"]
    assert kept["en"] < total["en"] * 0.4


def test_sample_stratified_deterministic_across_parallelism(spark):
    one = sorted(r.doc_id for r in
                 q_sample_stratified(spark, SF_DIR).coalesce(1).collect())
    eight = sorted(r.doc_id for r in
                   q_sample_stratified(spark, SF_DIR).repartition(8).collect())
    assert one == eight  # unlike df.sample(), the predicate is row-intrinsic


def test_quality_repetition_matches_python(spark, docs_pd):
    got = {r.doc_id: r for r in q_quality_repetition(spark, SF_DIR).collect()}
    assert len(got) == len(docs_pd)
    for _, row in docs_pd.head(25).iterrows():
        toks = _toks(row.text)
        tf = Counter(toks)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = got[row.doc_id]
        assert r.dup_token_frac == pytest.approx(1 - len(tf) / len(toks), abs=1e-6)
        assert r.top_token_frac == pytest.approx(max(tf.values()) / len(toks), abs=1e-6)
        assert r.dup_bigram_frac == pytest.approx(
            1 - len(set(bigrams)) / len(bigrams), abs=1e-6)


def test_quality_perplexity_matches_python(spark, docs_pd):
    # rebuild the corpus bigram LM in pure python and rescore 10 docs
    all_toks = {row.doc_id: _toks(row.text) for _, row in docs_pd.iterrows()}
    c12, c1, vocab = Counter(), Counter(), set()
    for toks in all_toks.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    got = {r.doc_id: r for r in q_quality_perplexity(spark, SF_DIR).collect()}
    for doc_id in list(all_toks)[:10]:
        toks = all_toks[doc_id]
        nll = [-math.log((c12[(a, b)] + 1) / (c1[a] + v))
               for a, b in zip(toks, toks[1:])]
        r = got[doc_id]
        assert r.n_bigrams == len(nll)
        assert r.avg_nll == pytest.approx(sum(nll) / len(nll), abs=1e-5)


def test_perplexity_flags_garbled_docs(spark):
    # a doc made of rare transitions must score worse than the corpus median
    rows = q_quality_perplexity(spark, SF_DIR).collect()
    vals = sorted(r.avg_nll for r in rows)
    assert vals[0] < vals[len(vals) // 2] < vals[-1]  # real spread, not constant
