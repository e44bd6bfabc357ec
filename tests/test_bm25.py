"""BM25 top-k semantics pinned against a pure-Python recomputation
(Robertson idf with Lucene +1 smoothing, k1/b from the query module).

The per-term weight is fixed to integer micros with HALF_UP rounding
before summing (order-independent bigint sum); the Python pin must use
Decimal HALF_UP because builtin round() is half-even.
"""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from obiemachinelearningframework_spark.queries import (
    BM25_B,
    BM25_K1,
    BM25_QUERY_TERMS,
    BM25_TOPK,
    q_bm25_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _micro(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))


def test_bm25_matches_pure_python(spark):
    got = q_bm25_topk(spark, SF_DIR).collect()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in docs.itertuples()
    }
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    tf = {
        d: Counter(t for t in ts if t in BM25_QUERY_TERMS)
        for d, ts in toks.items()
    }
    df = Counter(t for c in tf.values() for t in c)
    scores = {}
    for d, c in tf.items():
        if not c:
            continue
        s = 0
        for t, f in c.items():
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            w = (
                idf * f * (BM25_K1 + 1)
                / (f + BM25_K1 * (1 - BM25_B + BM25_B * dl[d] / avgdl))
            )
            s += _micro(w * 1_000_000)
        scores[d] = (s, len(c))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert len(got) == BM25_TOPK <= len(want)
    for rank, (row, (doc_id, (micro, n_terms))) in enumerate(
        zip(got, want), start=1
    ):
        assert (row.doc_id, row.bm25_micro, row.n_query_terms, row.rank) == (
            doc_id, micro, n_terms, rank,
        )
    # the fixture genuinely exercises multi-term scoring
    assert any(r.n_query_terms > 1 for r in got)
