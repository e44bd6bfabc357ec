"""Streaming incremental Gram (streaming/gram_stream.py): the running
state merged across micro-batch drains must equal the at-rest batch
state BIT-EXACTLY (integer mergeability — the same contract as the CMS
stream), a re-drain with no new files must not change it, and the PCA
re-fit from the streamed state must match the batch PCA of all vectors."""

import numpy as np
import pandas as pd
import pytest

from obiemachinelearningframework_spark.operators.pca import (
    gram_micro,
    gram_to_matrix,
    pca_from_gram,
)
from obiemachinelearningframework_spark.streaming.gram_stream import (
    VEC_SCHEMA,
    batch_state,
    read_state,
    running_pca,
    stream_gram,
)

D = 8
rng = np.random.RandomState(7)
ALL = [
    (i, [float(x) for x in rng.randn(D) * 0.3], int(i % 3))
    for i in range(40)
]
BATCH1, BATCH2 = ALL[:25], ALL[25:]


def _write(spark, rows, path):
    spark.createDataFrame(rows, VEC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "state"),
            str(tmp_path / "ck"))


def _state_dict(df):
    return {(r["kind"], r["i"], r["j"]): int(r["v"]) for r in df.collect()}


def test_stream_gram_merge_is_exact(spark, dirs):
    in_dir, state, ck = dirs
    _write(spark, BATCH1, in_dir)
    stream_gram(spark, in_dir, state, ck)
    _write(spark, BATCH2, in_dir)
    stream_gram(spark, in_dir, state, ck)

    merged = _state_dict(read_state(spark, state))
    at_rest = _state_dict(
        batch_state(spark.createDataFrame(ALL, VEC_SCHEMA))
    )
    assert merged == at_rest
    assert merged[("n", 0, 0)] == len(ALL)

    # exactly-once: a drain with nothing new leaves the state unchanged
    stream_gram(spark, in_dir, state, ck)
    assert _state_dict(read_state(spark, state)) == merged


def test_running_pca_matches_batch(spark, dirs):
    in_dir, state, ck = dirs
    _write(spark, BATCH1, in_dir)
    stream_gram(spark, in_dir, state, ck)
    _write(spark, BATCH2, in_dir)
    stream_gram(spark, in_dir, state, ck)

    comps, evals, total, n = running_pca(spark, state, D, 3)
    assert n == len(ALL)

    vecs = spark.createDataFrame(ALL, VEC_SCHEMA)
    m = np.stack([np.asarray(v, dtype=np.float64) for _, v, _ in ALL])
    bg = gram_to_matrix(gram_micro(vecs).collect(), D)
    bc, be, bt = pca_from_gram(bg, len(ALL), m.mean(axis=0), 3)
    # streamed mean is micro-quantized; tolerance covers the 1e-6 grid
    assert np.allclose(evals, be, atol=1e-4)
    assert total == pytest.approx(bt, abs=1e-4)
    for a, b in zip(comps, bc):
        assert abs(float(np.dot(a, b))) > 0.999


def test_empty_state_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="empty"):
        running_pca(spark, str(tmp_path / "nope"), D, 2)
