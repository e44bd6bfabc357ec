"""Distributed exact Gram matrix + PCA over an embedding column.

The scale-correct way to run PCA on 10^12 vectors is NOT to ship
vectors anywhere: the d x d Gram matrix G = sum_r x_r x_r^T is a
commutative aggregation, so each partition folds its rows into one
d x d integer accumulator (a numpy matmul per Arrow batch) and emits
d(d+1)/2 partial sums — the shuffle carries O(parts * d^2) rows
regardless of corpus size, and the eigendecomposition of the d x d
result is a constant-cost driver step (the same planning-action budget
as a broadcast codebook).

Exactness contract: values are fixed to integer micros
(round(v * 1e6), HALF-AWAY-FROM-ZERO — the convention Spark's F.round
and DuckDB's round() both use; float32 values that are odd multiples
of 1/128 DO land on exact .5 micros, so the convention must be pinned,
not assumed away), products and partition partials ride int64 —
bounded by rows_per_partition * (max|v| * 1e6)^2, i.e. safe to
~9.2e6 rows per partition at |v| <= 1 (size maxPartitionBytes
accordingly for unnormalized embeddings; the accumulator enforces this
bound loudly instead of letting int64 wrap) — and the cross-partition
reduce sums decimal(38,0), so the Gram entries are bit-identical across
engines, partitionings, and cluster sizes — the property that makes the
result oracle-checkable and a resumable pipeline's checkpoint stable.

Reference parity: the reference framework has no linear-algebra
operators; this extends the embedding-analytics family
(embedding_dim_stats / embedding_quantize_sq / SemDeDup) with the
covariance-level diagnostic (dead directions, effective rank) and a
cheap linear dimensionality reduction for the ANN index builders.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

MICRO = 10 ** 6

# int64 tops out at ~9.22e18; refuse to fold a partition whose worst-case
# accumulated |entry| could exceed this (with 2x headroom) instead of
# letting numpy wrap silently.
_I64_SAFE = 2 ** 62


def _round_half_away(x: "np.ndarray") -> "np.ndarray":
    """Half-away-from-zero rounding — matches Spark F.round (HALF_UP on
    BigDecimal = away from zero) and DuckDB round(), unlike np.rint
    (half-to-even). Pinned so Gram entries are bit-identical across the
    numpy, Spark-SQL, and DuckDB-oracle computations of the same value.

    Implemented via an EXACT fractional-part comparison, not floor(x+0.5):
    adding 0.5 can round up in binary before floor sees it (e.g.
    x = 0.49999999999999994, the largest double below 0.5, has
    x + 0.5 == 1.0 exactly), which would diverge from the BigDecimal
    engines. For |x| < 2^52, floor(|x|) and |x| share an ulp grid, so
    |x| - floor(|x|) is computed exactly and the >= 0.5 test is the true
    decimal comparison."""
    a = np.abs(x)
    f = np.floor(a)
    r = np.where(a - f >= 0.5, f + 1.0, f)
    return np.copysign(r, x)


def gram_micro(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle Gram matrix (i <= j) in exact micro^2 units.

    Returns (i int, j int, g decimal(38,0)) with
    g = sum_rows round(v_i * 1e6) * round(v_j * 1e6).
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:  # empty input (e.g. a replayed empty micro-batch)
        return df.sparkSession.createDataFrame(
            [], "i int, j int, g decimal(38,0)")
    d = first["d"]

    def part(batches):
        import pandas as pd

        acc = np.zeros((d, d), dtype=np.int64)
        seen = False
        worst = 0.0  # running bound on any accumulated |entry|
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            m = np.stack([np.asarray(a, dtype=np.float64) for a in pdf[vec_col]])
            mi = _round_half_away(m * MICRO).astype(np.int64)
            # |sum_r mi_ri * mi_rj| <= rows * max|mi|^2 per batch; keep a
            # running worst-case so overflow fails loudly, never wraps
            worst += float(len(pdf)) * float(np.abs(mi).max()) ** 2
            if worst >= _I64_SAFE:
                raise OverflowError(
                    "gram_micro int64 accumulator bound exceeded: "
                    f"worst-case |entry| ~{worst:.3g} >= {_I64_SAFE:.3g}. "
                    "Shrink partitions (spark.sql.files.maxPartitionBytes) "
                    "or normalize the embedding column."
                )
            acc += mi.T @ mi
        if not seen:
            return
        iu = np.triu_indices(d)
        yield pd.DataFrame(
            {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
             "s": acc[iu]}
        )

    parts = df.select(vec_col).mapInPandas(part, "i int, j int, s long")
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("g")
    )


def gram_to_matrix(gram_rows, d: int) -> np.ndarray:
    """Driver-side: (i, j, g) rows -> symmetric d x d float64 matrix in
    original (un-scaled) units."""
    g = np.zeros((d, d), dtype=np.float64)
    for r in gram_rows:
        v = float(r["g"]) / (MICRO * MICRO)
        g[r["i"], r["j"]] = v
        g[r["j"], r["i"]] = v
    return g


def pca_from_gram(gram: np.ndarray, n: int, mean: np.ndarray, k: int):
    """Covariance eigendecomposition from the Gram matrix:
    cov = G/n - mean mean^T. Returns (components [k, d] rows = top
    eigenvectors with a deterministic sign convention, explained
    variance [k], total variance)."""
    cov = gram / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    # deterministic sign: largest-|coord| entry positive
    for row in comps:
        a = np.argmax(np.abs(row))
        if row[a] < 0:
            row *= -1
    return comps, w[order], float(w.sum())


def project(df: DataFrame, components: np.ndarray,
            mean: np.ndarray, vec_col: str = "embedding",
            out_col: str = "pc") -> DataFrame:
    """Map-only projection onto the fitted components: one Arrow-batched
    matmul per batch, components/mean ride in the closure (k x d — the
    broadcast-codebook pattern)."""
    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    cols = df.columns

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(a, dtype=np.float64) for a in pdf[vec_col]])
            p = (m - mu) @ comps.T
            out = pdf.drop(columns=[vec_col])
            out[out_col] = list(p)
            yield out

    keep = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != vec_col
    )
    return df.mapInPandas(part, f"{keep}, {out_col} array<double>")
