"""Distributed graph primitives over edge DataFrames.

Companion to ``operators/canonicalize.py`` (connected components): these
run on the entity / co-occurrence graphs the KG pipeline materializes.
The reference framework has no graph analytics (its graphs live inside
single documents as Java object trees); these are the corpus-wide
operators a KG built at 10^12-document scale needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangles(edges: DataFrame) -> DataFrame:
    """Enumerate each triangle of an undirected graph exactly once, using
    degree-ORIENTED wedge generation: every edge points from its lower
    (degree, name) endpoint to the higher one, wedges are generated at
    their lowest-rank vertex only, and a closing-edge join confirms the
    third side. This is the standard O(m^1.5) scheme — the wedge count at
    a hub vertex collapses because hubs sit at the HIGH end of the order
    and therefore generate no wedges, which is exactly the skew that kills
    the naive a<b<c self-join at scale.

    ``edges``: columns (u, v), string node ids; treated as undirected —
    duplicates, self-loops, and reversed copies are normalized away.
    Returns one row per triangle with the canonical sorted triple
    (na < nb < nc). The orientation is a (deg, name) struct comparison, so
    no global rank window is needed.
    """
    e = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        # the edge table feeds five plan branches (two degree sides,
        # orientation, both wedge legs, the closing join) — cut lineage so
        # upstream derivation runs once (kg_pagerank pattern)
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    u_first = F.struct("deg_u", "u") < F.struct("deg_v", "v")
    eo = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_t"),
        )
    )
    e1 = eo.select(F.col("s").alias("p"), F.col("t").alias("x"), F.col("deg_t").alias("deg_x"))
    e2 = eo.select(F.col("s").alias("p"), F.col("t").alias("y"), F.col("deg_t").alias("deg_y"))
    wedges = e1.join(e2, "p").filter(F.struct("deg_x", "x") < F.struct("deg_y", "y"))
    closing = eo.select(F.col("s").alias("x"), F.col("t").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select(
        F.array_sort(F.array("p", "x", "y")).alias("t3")
    )
    return tri.select(
        F.col("t3")[0].alias("na"),
        F.col("t3")[1].alias("nb"),
        F.col("t3")[2].alias("nc"),
    )
