"""Property test: q_dedup_substring_spans equals a 20-line pure-Python
reference (gram document frequency -> flagged positions -> merged islands)
on randomized small corpora drawn from a tiny vocabulary (to force
collisions), plus degenerate-input checks for the round-3 queries."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from obiemachinelearningframework_spark.queries import (
    SUBSTR_K,
    SUBSTR_MIN_DF,
    q_dedup_simhash_band,
    q_dedup_substring_spans,
    q_fuzzy_topk_links,
)

VOCAB = ["a", "b", "c", "d"]


def _py_spans(docs):
    """Reference implementation over {doc_id: [tokens]}."""
    from collections import defaultdict

    grams = defaultdict(set)           # gram -> set of doc_ids
    positions = defaultdict(list)      # doc_id -> [(pos, gram)]
    for did, toks in docs.items():
        for i in range(len(toks) - SUBSTR_K + 1):
            g = " ".join(toks[i:i + SUBSTR_K])
            grams[g].add(did)
            positions[did].append((i, g))
    out = []
    for did, toks in docs.items():
        flagged = sorted(
            p for p, g in positions[did] if len(grams[g]) >= SUBSTR_MIN_DF
        )
        i = 0
        while i < len(flagged):
            j = i
            while j + 1 < len(flagged) and flagged[j + 1] - flagged[j] <= SUBSTR_K:
                j += 1
            start, end = flagged[i], flagged[j] + SUBSTR_K - 1
            out.append((did, start, end, end - start + 1,
                        " ".join(toks[start:end + 1])))
            i = j + 1
    return sorted(out)


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(min_value=2, max_value=5))
    docs = {}
    for did in range(1, n_docs + 1):
        n_tok = draw(st.integers(min_value=SUBSTR_K, max_value=14))
        docs[did] = [
            draw(st.sampled_from(VOCAB)) for _ in range(n_tok)
        ]
    return docs


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=corpora())
def test_substring_spans_match_python_reference(spark, tmp_path_factory, docs):
    out = str(tmp_path_factory.mktemp("prop") / "sf")
    pdf = pd.DataFrame(
        [(did, " ".join(toks)) for did, toks in docs.items()],
        columns=["doc_id", "text"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_tokens, r.span_text)
        for r in q_dedup_substring_spans(spark, out).collect()
    )
    assert got == _py_spans(docs)


@pytest.fixture(scope="module")
def empty_docs_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty") / "sf")
    spark.createDataFrame(
        [], schema="doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_round3_queries_on_empty_corpus(spark, empty_docs_dir):
    assert q_dedup_substring_spans(spark, empty_docs_dir).count() == 0
    assert q_dedup_simhash_band(spark, empty_docs_dir).count() == 0
    # the fuzzy query's unknown-token stream is fixed; against an empty
    # corpus it must still link purely from the inline dictionary
    assert q_fuzzy_topk_links(spark, empty_docs_dir).count() > 0
