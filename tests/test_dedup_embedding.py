"""Embedding-cosine dedup wired to canonical ids (queries.q_dedup_embedding).

The operator chains the LSH multiprobe bucketed cosine kernel (never
all-pairs) into connected-components canonicalization: pairs with
cos >= EMB_DEDUP_COS become edges, every vector gets the min vec_id of its
component as canonical_id, singletons keep their own id. On planted tight
clusters (within-cluster cos ~0.99) each cluster must collapse to ONE
canonical id — no splits — and the output must stay one-row-per-vector.
DuckDB value parity for the same operator is covered by the oracle CLI
(tools/check_oracles.py: `dedup_embedding`).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark import queries as Q

N_CLUSTERS, PER_CLUSTER, DIM = 6, 20, 16


@pytest.fixture(scope="module")
def clustered_sf_dir(spark, tmp_path_factory):
    # centers drawn orthogonal-ish (QR of a random matrix) so no two
    # planted clusters sit above the dedup threshold by accident;
    # noise 0.01 keeps cluster-mates agreeing on at least one of the
    # ANN_TABLES 10-bit codes (any-table match), so every planted cluster
    # stays fully connected through the threshold edges
    rng = np.random.RandomState(23)
    centers, _ = np.linalg.qr(rng.normal(0, 1, (DIM, N_CLUSTERS)))
    rows, vid = [], 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[:, c] + 0.01 * rng.normal(0, 1, DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    out = str(tmp_path_factory.mktemp("embdedup") / "sf")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def test_clusters_collapse_to_one_canonical_id(spark, clustered_sf_dir):
    res = Q.q_dedup_embedding(spark, clustered_sf_dir).cache()
    rows = {r["vec_id"]: r for r in res.collect()}
    n = N_CLUSTERS * PER_CLUSTER
    assert len(rows) == n, "must emit exactly one row per input vector"

    for c in range(N_CLUSTERS):
        members = range(c * PER_CLUSTER, (c + 1) * PER_CLUSTER)
        canon = {rows[m]["canonical_id"] for m in members}
        assert len(canon) == 1, f"planted cluster {c} split into {canon}"
        # orthogonal centers: cluster c must NOT merge with any other, and
        # min-id canonicalization makes the first member the canonical id
        assert canon == {c * PER_CLUSTER}
        assert rows[c * PER_CLUSTER]["n_members"] == PER_CLUSTER


def test_n_members_consistent(spark, clustered_sf_dir):
    res = Q.q_dedup_embedding(spark, clustered_sf_dir)
    bad = (
        res.groupBy("canonical_id", "n_members")
        .agg(F.count("*").alias("actual"))
        .filter(F.col("actual") != F.col("n_members"))
        .count()
    )
    assert bad == 0, "n_members must equal the true component size"
