"""Semantics of the PII-scrub, per-line code-metric, and paragraph-dedup
operators, pinned against independent pure-Python recomputation (the
DuckDB oracle checks engine parity; these check the *math*). The real-
newline variant of the line metrics runs over the generated source-code
fixture corpus — the testdata registry entry uses a synthesized
fixed-width line structure because documents.text is single-line."""

import hashlib
import re
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.queries import (
    LINE_TOKENS,
    LONG_LINE_CHARS,
    PARA_TOKENS,
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    _doc_line_agg,
    q_code_line_metrics,
    q_dedup_paragraph,
    q_pii_scrub,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _toks(text):
    return [t for t in text.split(" ") if t]


def _augment(row):
    return (
        f"{row.text} contact user{row.doc_id}@mail-{row.source}.com"
        f" from host 10.{row.doc_id % 200}.0.{row.doc_id % 250}"
        f" tel 555-{row.doc_id % 10000:04d}"
    )


def test_pii_scrub_matches_python(spark, docs_pd):
    got = {r.doc_id: r for r in q_pii_scrub(spark, SF_DIR).collect()}
    assert len(got) == len(docs_pd)
    for _, row in docs_pd.head(25).iterrows():
        aug = _augment(row)
        red = re.sub(PII_EMAIL_RE, "<EMAIL>", aug)
        red = re.sub(PII_IP_RE, "<IP>", red)
        red = re.sub(PII_PHONE_RE, "<PHONE>", red)
        r = got[row.doc_id]
        assert r.n_email == len(re.findall(PII_EMAIL_RE, aug))
        assert r.n_ip == len(re.findall(PII_IP_RE, aug))
        assert r.n_phone == len(re.findall(PII_PHONE_RE, aug))
        assert r.redacted_sha == hashlib.sha256(red.encode()).hexdigest()


def test_pii_scrub_redacts_every_category(spark):
    rows = q_pii_scrub(spark, SF_DIR).collect()
    # the deterministic synthesis plants exactly one of each PII kind and
    # the word-soup text contains none of its own
    assert all(r.n_email == 1 and r.n_ip == 1 and r.n_phone == 1 for r in rows)


def test_code_line_metrics_matches_python(spark, docs_pd):
    got = {r.doc_id: r for r in q_code_line_metrics(spark, SF_DIR).collect()}
    checked = 0
    for _, row in docs_pd.head(30).iterrows():
        toks = _toks(row.text)
        if not toks:
            assert row.doc_id not in got  # empty docs have no lines
            continue
        lines = [toks[i : i + LINE_TOKENS] for i in range(0, len(toks), LINE_TOKENS)]
        lens = [sum(len(t) for t in ln) + len(ln) - 1 for ln in lines]
        alnum = sum(c.isalnum() and c.isascii() for c in row.text)
        r = got[row.doc_id]
        assert r.n_lines == len(lens)
        assert r.max_line_chars == max(lens)
        assert r.avg_line_chars == pytest.approx(sum(lens) / len(lens), abs=1e-6)
        assert r.n_long_lines == sum(l > LONG_LINE_CHARS for l in lens)
        assert r.alnum_frac == pytest.approx(alnum / row.n_chars, abs=1e-6)
        checked += 1
    assert checked >= 25


def test_line_metrics_real_newlines(spark):
    """The shared per-doc aggregation over REAL '\\n' lines of generated
    source-code documents (the production shape per BASELINE input_hint)."""
    corpus = generate_corpus("code", n_docs=30, seed=7)
    src = corpus["source"].assign(
        doc_id=lambda d: d.repo + "/" + d.path
    )
    sdf = spark.createDataFrame(src[["doc_id", "content"]]).select(
        "doc_id",
        F.posexplode(F.split("content", "\n")).alias("ln", "line"),
    )
    out = _doc_line_agg(sdf.select("doc_id", F.length("line").alias("line_chars")))
    got = {r.doc_id: r for r in out.collect()}
    for _, row in src.head(10).iterrows():
        lens = [len(l) for l in row.content.split("\n")]
        r = got[row.doc_id]
        assert r.n_lines == len(lens)
        assert r.max_line_chars == max(lens)
        assert r.avg_line_chars == pytest.approx(sum(lens) / len(lens), abs=1e-6)
        assert r.n_long_lines == sum(l > LONG_LINE_CHARS for l in lens)


def test_dedup_paragraph_matches_python(spark, docs_pd):
    got = {r.doc_id: r for r in q_dedup_paragraph(spark, SF_DIR).collect()}
    occ = Counter()
    paras_by_doc = {}
    for _, row in docs_pd.iterrows():
        toks = _toks(row.text)
        paras = [
            " ".join(toks[i : i + PARA_TOKENS])
            for i in range(0, len(toks), PARA_TOKENS)
        ]
        paras_by_doc[row.doc_id] = paras
        occ.update(paras)
    n_docs_with_paras = sum(1 for p in paras_by_doc.values() if p)
    assert len(got) == n_docs_with_paras
    dup_seen = 0
    for doc_id, paras in paras_by_doc.items():
        if not paras:
            continue
        r = got[doc_id]
        n_dup = sum(occ[p] > 1 for p in paras)
        assert r.n_paras == len(paras)
        assert r.n_dup_paras == n_dup
        assert r.dup_para_frac == pytest.approx(n_dup / len(paras), abs=1e-6)
        dup_seen += n_dup
    assert dup_seen > 0  # the corpus genuinely contains repeated paragraphs
