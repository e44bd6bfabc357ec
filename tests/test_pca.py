"""Distributed Gram/PCA operator (operators/pca.py) — exactness,
partition invariance, and parity of the driver-side eigen step against
a straight numpy PCA on the collected data."""

import numpy as np
import pandas as pd
import pytest

from obiemachinelearningframework_spark.operators.pca import (
    MICRO,
    gram_micro,
    gram_to_matrix,
    pca_from_gram,
    project,
)

SF_DIR = "/root/testdata/sf0.001"
D = 64


@pytest.fixture(scope="module")
def emb_pd():
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    return np.stack([np.asarray(a, dtype=np.float64) for a in df.embedding])


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _np_gram_micro(m):
    # half-away-from-zero: the one convention (Spark F.round / DuckDB
    # round) pinned across every quantization site in the repo
    x = m * MICRO
    mi = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)
    return mi.T @ mi


def test_rounding_convention_half_away(spark):
    """ADVICE r3: float32 odd multiples of 1/128 land on exact .5 micros;
    np.rint (half-even) would disagree with Spark F.round and DuckDB
    round() there. Pin that gram_micro uses half-away-from-zero on both
    signs of an exact-tie value."""
    v = 0.0078125          # 1/128 -> 7812.5 micros, an exact tie
    df = spark.createDataFrame(
        [(0, [v, -v]), (1, [v, -v])],
        "vec_id long, embedding array<float>")
    got = {(r["i"], r["j"]): int(r["g"]) for r in gram_micro(df).collect()}
    # half-away: 7812.5 -> 7813, -7812.5 -> -7813 (np.rint would give 7812)
    assert got[(0, 0)] == 2 * 7813 * 7813
    assert got[(0, 1)] == 2 * 7813 * -7813
    assert got[(1, 1)] == 2 * 7813 * 7813


def test_rounding_ulp_boundary_matches_decimal_engines():
    """Code-review r4: floor(x+0.5) misrounds doubles within half an ulp
    below a .5 boundary (x+0.5 rounds UP in binary before floor sees it).
    The exact fractional-part comparison must agree with BigDecimal
    engines: round(0.49999999999999994) == 0, both signs."""
    import numpy as np

    from obiemachinelearningframework_spark.operators.pca import (
        _round_half_away,
    )

    x = np.array([0.49999999999999994, -0.49999999999999994])
    assert np.floor(x[0] + 0.5) == 1.0          # the trap this guards
    r = _round_half_away(x)
    assert r[0] == 0.0 and r[1] == 0.0


def test_gram_overflow_guard(spark):
    """The int64 accumulator refuses loudly instead of wrapping: one
    partition of huge-magnitude vectors trips the documented bound."""
    big = 4e3  # (4e3 * 1e6)^2 = 1.6e19 > 2^62 from a single row
    df = spark.createDataFrame(
        [(0, [big, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="accumulator bound exceeded"):
        gram_micro(df).collect()


def test_gram_exact_vs_numpy(spark, emb_df, emb_pd):
    rows = gram_micro(emb_df).collect()
    assert len(rows) == D * (D + 1) // 2
    exp = _np_gram_micro(emb_pd)
    for r in rows:
        assert int(r["g"]) == exp[r["i"], r["j"]], (r["i"], r["j"])


def test_gram_partition_invariant(spark, emb_df):
    """The exactness contract: identical results regardless of how rows
    are split across partitions (what makes checkpoints stable)."""
    a = {(r["i"], r["j"]): int(r["g"])
         for r in gram_micro(emb_df.repartition(1)).collect()}
    b = {(r["i"], r["j"]): int(r["g"])
         for r in gram_micro(emb_df.repartition(7)).collect()}
    assert a == b


def test_pca_matches_numpy(spark, emb_df, emb_pd):
    k = 8
    n = len(emb_pd)
    mean = emb_pd.mean(axis=0)
    g = gram_to_matrix(gram_micro(emb_df).collect(), D)
    comps, evals, total = pca_from_gram(g, n, mean, k)
    # numpy reference PCA on the raw (un-quantized) data
    c = emb_pd - mean
    ref_evals, ref_vecs = np.linalg.eigh((c.T @ c) / n)
    order = np.argsort(ref_evals)[::-1][:k]
    ref_evals = ref_evals[order]
    ref_vecs = ref_vecs[:, order].T
    # micro-quantization perturbs the covariance by O(1e-6)
    assert np.allclose(evals, ref_evals, atol=1e-4)
    for got, ref in zip(comps, ref_vecs):
        assert abs(float(np.dot(got, ref))) > 0.999
    assert total == pytest.approx(float(np.trace((c.T @ c) / n)), rel=1e-3)


def test_projection_variance_and_reconstruction(spark, emb_df, emb_pd):
    n = len(emb_pd)
    mean = emb_pd.mean(axis=0)
    g = gram_to_matrix(gram_micro(emb_df).collect(), D)
    comps8, evals8, _ = pca_from_gram(g, n, mean, 8)
    out = project(emb_df, comps8, mean).orderBy("vec_id").collect()
    assert len(out) == n
    p = np.stack([np.asarray(r["pc"]) for r in out])
    # per-component variance of the projections == the eigenvalues
    assert np.allclose(p.var(axis=0), evals8, atol=1e-4)
    # components are orthonormal
    assert np.allclose(comps8 @ comps8.T, np.eye(8), atol=1e-9)
    # reconstruction error shrinks as k grows
    c = emb_pd - mean
    def recon_err(k):
        comps, _, _ = pca_from_gram(g, n, mean, k)
        proj = c @ comps.T
        return float(((c - proj @ comps) ** 2).sum())
    assert recon_err(8) < recon_err(2) < recon_err(1)
    # schema: non-vector columns survive the projection
    assert {"vec_id", "label", "pc"} == set(out[0].asDict().keys())


def test_pca_ann_recall_on_low_rank_data(spark):
    """The retrieval-safety gauge for PCA as an ANN reduction (the
    ann_sq_recall story for the linear projection): on data with
    low-rank cluster structure, brute-force top-5 in the PCA-8 space
    recovers >= 0.8 of the exact-cosine neighbors. (On isotropic data
    PCA compression rightfully destroys neighborhoods — the fixture
    embeddings measure ~0.23 at k=16 — which is exactly why the gauge
    must be MEASURED per-corpus before swapping the index input.)"""
    rng = np.random.RandomState(11)
    # data living in a true 8-dim subspace of R^64 (clusters + noise in
    # the subspace, tiny full-dim jitter) — the regime the reduction is
    # FOR; full-rank noise (the fixture) is the regime it is not
    basis, _ = np.linalg.qr(rng.randn(D, 8))
    centers8 = rng.randn(5, 8) * 2.0
    rows = []
    for i in range(400):
        z = centers8[i % 5] + rng.randn(8) * 0.3
        x = z @ basis.T + rng.randn(D) * 0.002
        rows.append((i, [float(v) for v in x], int(i % 5)))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    m = np.stack([np.asarray(v, np.float64) for _, v, _ in rows])
    n, mean = len(m), m.mean(axis=0)
    g = gram_to_matrix(gram_micro(df).collect(), D)
    comps, _, _ = pca_from_gram(g, n, mean, 8)
    p = np.stack([
        np.asarray(r["pc"])
        for r in project(df, comps, mean).orderBy("vec_id").collect()
    ])

    def top5(mat, q):
        sims = mat @ mat[q] / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[q]) + 1e-12)
        sims[q] = -2
        return set(np.argsort(-sims)[:5])

    c = m - mean
    hits = sum(len(top5(c, q) & top5(p, q)) for q in range(100))
    assert hits / 500 >= 0.8
