"""Semantics of the round-3 KG/quality additions pinned against
pure-Python recomputation on the small corpus (the DuckDB oracle checks
engine parity; this checks the math), plus structural properties the
oracle cannot see: the triangle join enumerates each triangle exactly
once, the overlap hub cap actually excludes the unigram hubs, and the
ANN recall report agrees with the definition of recall@k."""

import math
from collections import defaultdict
from itertools import combinations

import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import (
    ANN_RECALL_K,
    ANN_RECALL_MAX_QID,
    ENTITY_DF_CAP,
    STOPWORDS,
    TFIDF_TOPK,
    q_ann_recall_report,
    q_ann_topk_bucketed,
    q_cosine_topk,
    q_doc_tfidf_topk,
    q_kg_entity_overlap,
    q_kg_triangles,
    q_mentions_dict,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mentions(spark):
    return [
        (r.doc_id, r.pos, r.token)
        for r in q_mentions_dict(spark, SF_DIR).collect()
    ]


def _entity_docs(mentions):
    """doc -> set of entity surfaces (unigrams + adjacent-bigram compounds),
    the same definition q_kg_entity_overlap uses."""
    by_doc = defaultdict(dict)
    for doc, pos, tok in mentions:
        by_doc[doc][pos] = tok
    ents = defaultdict(set)
    for doc, toks in by_doc.items():
        for pos, tok in toks.items():
            ents[doc].add(tok)
            nxt = toks.get(pos + 1)
            if nxt is not None:
                ents[doc].add(f"{tok} {nxt}")
    return ents


def test_entity_overlap_matches_python(spark, mentions):
    ents = _entity_docs(mentions)
    df = defaultdict(set)
    for doc, es in ents.items():
        for e in es:
            df[e].add(doc)
    rare = {e for e, docs in df.items() if len(docs) <= ENTITY_DF_CAP}
    # the cap must be doing real work: every unigram is a hub on this
    # corpus, every surviving entity is a bigram compound
    assert rare and all(" " in e for e in rare)
    assert any(" " not in e for e in df)

    expect = defaultdict(lambda: [0, None])
    for e in sorted(rare):
        for a, b in combinations(sorted(df[e]), 2):
            cell = expect[(a, b)]
            cell[0] += 1
            if cell[1] is None:
                cell[1] = e
    got = {
        (r.doc_a, r.doc_b): (r.n_shared, r.first_entity)
        for r in q_kg_entity_overlap(spark, SF_DIR).collect()
    }
    assert got == {k: tuple(v) for k, v in expect.items()}


def test_triangles_match_python_and_are_unique(spark, mentions):
    ents = defaultdict(set)
    for doc, _, tok in mentions:
        ents[doc].add(tok)
    edges = set()
    for toks in ents.values():
        for u, v in combinations(sorted(toks), 2):
            edges.add((u, v))
    expect = {
        (a, b, c)
        for (a, b) in edges
        for c in {v for (u, v) in edges if u == b}
        if (a, c) in edges
    }
    rows = [(r.na, r.nb, r.nc) for r in q_kg_triangles(spark, SF_DIR).collect()]
    # oriented wedge generation must emit each triangle exactly once
    assert len(rows) == len(set(rows))
    assert all(a < b < c for a, b, c in rows)
    assert set(rows) == expect


def test_tfidf_topk_matches_python(spark):
    docs_pd = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = [
        (row.doc_id, t)
        for _, row in docs_pd.iterrows()
        for t in row.text.split(" ")
        if t and t not in STOPWORDS
    ]
    tf = defaultdict(int)
    for doc, tok in toks:
        tf[(doc, tok)] += 1
    dfv = defaultdict(int)
    for _, tok in tf:
        dfv[tok] += 1
    n_docs = docs_pd.doc_id.nunique()  # the query counts ALL documents
    scored = defaultdict(list)
    for (doc, tok), f in tf.items():
        scored[doc].append(
            (round(f * math.log(n_docs / dfv[tok]), 6), tok, f)
        )
    expect = {}
    for doc, rows in scored.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        for rank, (s, tok, f) in enumerate(rows[:TFIDF_TOPK], start=1):
            expect[(doc, rank)] = (tok, f, dfv[tok], s)
    got = {
        (r.doc_id, r.rank): (r.token, r.tf, r.df, r.tfidf)
        for r in q_doc_tfidf_topk(spark, SF_DIR).collect()
    }
    assert got == expect


def test_ann_recall_report_matches_definition(spark):
    exact = defaultdict(set)
    for r in q_cosine_topk(spark, SF_DIR).collect():
        if r.rank <= ANN_RECALL_K:
            exact[r.qid].add(r.nid)
    approx = defaultdict(set)
    for r in q_ann_topk_bucketed(spark, SF_DIR).collect():
        if r.qid < ANN_RECALL_MAX_QID:
            approx[r.qid].add(r.nid)
    got = {r.qid: r for r in q_ann_recall_report(spark, SF_DIR).collect()}
    assert set(got) == set(exact)
    for qid, nids in exact.items():
        r = got[qid]
        hits = len(nids & approx.get(qid, set()))
        assert (r.n_exact, r.n_hit) == (len(nids), hits)
        assert r.recall == pytest.approx(hits / len(nids), abs=1e-6)
