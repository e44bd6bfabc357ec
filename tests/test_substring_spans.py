"""Exact-substring dedup spans (queries.q_dedup_substring_spans): a
shared >= K-token run across two docs must surface as ONE maximal span per
doc with exact boundaries and text; repeats shorter than K must not."""

import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import SUBSTR_K, q_dedup_substring_spans

SHARED = "alpha beta gamma delta epsilon zeta eta"       # 7 tokens > K=5
SHORT = "one two three four"                             # 4 tokens < K=5


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    assert SUBSTR_K == 5, "test fixture is sized for K=5"
    docs = [
        (1, f"intro {SHARED} closing words here"),
        (2, f"{SHARED} trailing unique content of doc two"),
        (3, f"leadthree {SHORT} tailthree completely different text"),
        (4, f"leadfour {SHORT} tailfour its own distinct ending"),
        (5, "fully unique document with no repetition at all"),
    ]
    out = str(tmp_path_factory.mktemp("substr") / "sf")
    spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_shared_run_is_one_maximal_span(spark, corpus_dir):
    rows = {r.doc_id: r for r in q_dedup_substring_spans(spark, corpus_dir).collect()}
    # docs 1 and 2 each carry exactly one span: the 7-token shared run
    assert set(rows) == {1, 2}, f"flagged docs {sorted(rows)}"
    assert rows[1].span_text == SHARED
    assert rows[2].span_text == SHARED
    # boundaries: doc 1 has one leading token, doc 2 starts at 0
    assert (rows[1].span_start, rows[1].span_end) == (1, 7)
    assert (rows[2].span_start, rows[2].span_end) == (0, 6)
    assert rows[1].n_tokens == 7 and rows[2].n_tokens == 7
