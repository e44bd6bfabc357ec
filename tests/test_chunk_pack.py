"""Concatenate-and-chunk sequence packing pinned against a pandas
prefix sum, plus the bucket-decomposition invariant: the two-level
bucket prefix sum must equal the single global cumsum exactly for any
bucket size (the decomposition is algebra, not approximation).
"""

import pandas as pd
import pytest
from hypothesis import given, strategies as st

from obiemachinelearningframework_spark.queries import (
    CHUNK_TOKENS,
    PACK_BUCKET_DOCS,
    q_chunk_pack,
)

SF_DIR = "/root/testdata/sf0.001"


def test_chunk_pack_matches_pandas_prefix_sum(spark):
    got = (
        q_chunk_pack(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n = docs.text.apply(lambda t: len([x for x in t.split(" ") if x]))
    want = (
        pd.DataFrame({"doc_id": docs.doc_id, "n_tokens": n})
        .query("n_tokens > 0")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want["cum_end"] = want.n_tokens.cumsum()
    want["cum_start"] = want.cum_end - want.n_tokens
    want["first_chunk"] = want.cum_start // CHUNK_TOKENS
    want["last_chunk"] = (want.cum_end - 1) // CHUNK_TOKENS
    want["spans_boundary"] = (
        want.first_chunk != want.last_chunk
    ).astype("int32")

    assert len(got) == len(want)
    for col in (
        "doc_id", "n_tokens", "cum_start",
        "first_chunk", "last_chunk", "spans_boundary",
    ):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
    # the fixture genuinely exercises the interesting paths
    assert len(want) // PACK_BUCKET_DOCS > 1          # multi-bucket
    assert got.spans_boundary.sum() > 0               # straddling docs
    assert (got.spans_boundary == 0).sum() > 0        # contained docs
    # windows tile the corpus: every chunk id up to the last is hit
    covered = set()
    for f, l in zip(got.first_chunk, got.last_chunk):
        covered.update(range(f, l + 1))
    assert covered == set(range(max(got.last_chunk) + 1))


@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1,
             max_size=200),
    st.integers(min_value=1, max_value=17),
)
def test_bucket_decomposition_equals_global_cumsum(lens, bucket):
    cum, out = 0, []
    for x in lens:
        cum += x
        out.append(cum)
    # two-level: per-bucket offset (sum of earlier buckets) + local cumsum
    offsets, seen = {}, 0
    for i in range(0, len(lens), bucket):
        offsets[i // bucket] = seen
        seen += sum(lens[i : i + bucket])
    got = []
    for i, x in enumerate(lens):
        b = i // bucket
        local = sum(lens[b * bucket : i + 1])
        got.append(offsets[b] + local)
    assert got == out
