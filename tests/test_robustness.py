"""Degenerate-input hardening: a production extraction job meets empty
partitions, mention-free documents, and non-ASCII content long before it
meets interesting ones. The pipeline must pass them through without
exceptions and with exact offset/sha semantics (Spark `substring` and
Python slicing both index code points, so multibyte content must not skew
the context slices).

Plus a property test: connected_components must emit, for every input
graph, the same partition as a driver-side union-find (the operator is the
canonicalization backbone — a wrong component silently merges entities).
"""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus, soccer_ontology
from obiemachinelearningframework_spark.operators.canonicalize import connected_components
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline

SRC_COLS = ["repo", "path", "commit", "lang", "content"]


def _fitted_pipe(spark):
    c = generate_corpus("soccer", n_docs=30, seed=21)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"]))
    pipe.fit(inst, spark.createDataFrame(c["gold_triples"]))
    return pipe


@pytest.fixture(scope="module")
def pipe(spark):
    return _fitted_pipe(spark)


SRC_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _src(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=SRC_COLS), schema=SRC_SCHEMA)


def test_empty_corpus(spark, pipe):
    empty = _src(spark, []).filter("1=0")
    inst = pipe.prepare(empty)
    assert pipe.predict_fused(inst).count() == 0
    out = pipe.predict(inst)
    assert out["triples"].count() == 0


def test_mention_free_and_whitespace_docs(spark, pipe):
    rows = [
        ("org0/p", "a.py", "c" * 40, "python", "nothing relevant here at all"),
        ("org0/p", "b.py", "d" * 40, "python", "   \n\t  \n"),
        ("org0/p", "c.py", "e" * 40, "python", ""),
    ]
    inst = pipe.prepare(_src(spark, rows))
    # no exceptions; no hallucinated triples from mention-free docs
    assert pipe.predict_fused(inst).count() == 0


def test_multibyte_content_offsets(spark, pipe):
    """Mentions after multibyte chars must carry code-point offsets that
    slice back to the mention text on BOTH engines."""
    c = generate_corpus("soccer", n_docs=3, seed=2)
    base = c["source"].iloc[0]["content"]
    doc = "émoji é中文 \U0001f600 " + base
    rows = [("org0/p", "u.py", "f" * 40, "python", doc)]
    inst = pipe.prepare(_src(spark, rows))
    from obiemachinelearningframework_spark.operators.mentions import detect_mentions

    m = detect_mentions(inst, pipe.ontology).join(
        inst.select("doc_key", "content"), "doc_key"
    ).withColumn(
        "slice", F.expr("substring(content, onset + 1, offset - onset)")
    )
    bad = m.filter(F.col("slice") != F.col("text")).count()
    assert m.count() > 0 and bad == 0
    # and the fused path emits triples for the shifted doc
    assert pipe.predict_fused(inst).count() > 0


@settings(max_examples=25, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=0, max_size=40
    )
)
def test_connected_components_matches_union_find(spark_global, edges):
    spark = spark_global
    df = spark.createDataFrame(
        pd.DataFrame(edges or [(0, 0)], columns=["src", "dst"])
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    # driver-side union-find oracle
    parent: dict = {}

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

    for a, b in (edges or [(0, 0)]):
        union(a, b)
    # union() always attaches the larger root under the smaller, so find(n)
    # IS the component's min id — the operator's canonical-id contract
    expect = {n: find(n) for n in parent}
    assert got == expect, (sorted(got.items()), sorted(expect.items()))


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
