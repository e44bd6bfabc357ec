"""Cross-document entity canonicalization: connected components.

The reference resolves entities only within a document (dictionary +
retrieval caches); the north rule extends this to cross-document entity
resolution: entities whose evidence ties them together (shared canonical
dictionary entry, near-duplicate labels) are merged into one canonical id
across the whole corpus before the triples are finalized.

Implementation: iterative min-id label propagation over the entity graph —
the standard Spark connected-components loop (alternating join + min-agg
until fixpoint), with ``localCheckpoint`` every few rounds to truncate the
lineage that iterative plans otherwise accumulate. Converges in
O(log(diameter)) rounds; entity graphs from co-mention edges have tiny
diameters, so this is a handful of shuffles regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


# graphs at or below this many edges resolve on the driver: the iterative
# loop costs ~2 actions per round (checkpoint + convergence count) and the
# entity graphs most queries feed it are tiny, so a hard-bounded take()
# gate — the same hybrid the fused link map uses (fused.py
# LINK_MAP_DRIVER_MAX) — replaces ~10 fixed-latency jobs with one.
# 200k edges is a few MB on the driver; beyond it, the distributed
# pointer-jumping loop runs unchanged (the 10^12-row path).
DRIVER_CC_MAX = 200_000


def _driver_components(edge_rows) -> list:
    """Union-find with min-id representatives — exactly the distributed
    loop's fixpoint (component = min reachable id), in O(E a(E))."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:       # path compression
            parent[x], x = r, parent[x]
        return r

    for r in edge_rows:
        a, b = r["src"], r["dst"]
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the representative
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(v, find(v)) for v in parent]


def connected_components(edges: DataFrame, max_iter: int = 15,
                         driver_max: int = DRIVER_CC_MAX) -> DataFrame:
    """edges(src, dst) undirected -> components(id, component) where
    component = min id reachable. Deterministic. Graphs under
    ``driver_max`` edges short-circuit to a driver union-find (bounded
    take() gate); larger graphs run the distributed pointer-jumping loop."""
    gated = None
    if driver_max > 0:
        # persist BEFORE the gate: the take() that sizes the graph
        # materializes the partitions it scans into the block manager, so
        # the big-graph branch reuses them instead of re-running the
        # (often expensive) edge derivation a second time (code-review
        # r4). persist/unpersist — not localCheckpoint — because BOTH
        # branches must be able to release the blocks: the early-return
        # small-graph branch previously pinned the checkpointed edges for
        # the rest of the session (ADVICE r4).
        gated = edges = edges.select("src", "dst").persist()
        head = edges.take(driver_max + 1)
        if len(head) <= driver_max:
            spark = edges.sparkSession
            id_type = edges.schema["src"].dataType.simpleString()
            rows = _driver_components(head)
            edges.unpersist()
            return spark.createDataFrame(
                rows or [], f"id {id_type}, component {id_type}")
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint()  # cut lineage: iterations must not re-derive edges
    )
    if gated is not None:
        gated.unpersist()  # sym is eagerly materialized; edges no longer needed
    nodes = sym.select(F.col("src").alias("id")).distinct()
    comp = nodes.withColumn("component", F.col("id")).localCheckpoint()

    for i in range(max_iter):
        # each node adopts min(own component, neighbors' components)
        neighbor_min = (
            sym.join(comp.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("component").alias("n_comp"))
        )
        new_comp = (
            comp.join(neighbor_min, "id", "left")
            .select("id", F.least("component", F.coalesce("n_comp", "component")).alias("component"))
        )
        # propagate through component representatives (pointer jumping):
        # comp(id) -> comp(comp(id)) halves path lengths each round.
        # Carry the old component along so convergence falls out of the
        # same materialization (one action per iteration, not two).
        jump = new_comp.alias("a").join(
            new_comp.select(F.col("id").alias("component"), F.col("component").alias("jumped")).alias("b"),
            "component",
            "left",
        ).select(
            "id", F.coalesce("jumped", "component").alias("component"),
        ).join(comp.select("id", F.col("component").alias("prev")), "id")
        jump = jump.localCheckpoint()
        changed = jump.filter(F.col("component") != F.col("prev")).count()
        comp = jump.select("id", "component")
        if changed == 0:
            break
    return comp


def canonicalization_edges(triples: DataFrame, label_similarity_edges: DataFrame | None = None,
                           entity_ids: DataFrame | None = None) -> DataFrame:
    """Entity graph edges: identity self-edges for every entity appearing as
    subj or entity-valued obj, plus optional externally-computed similarity
    edges (e.g. the fuzzy-linking join output).

    Which objs are entities (vs literals) comes from the ONTOLOGY —
    ``entity_ids`` is a one-column (``id``) table of known individual ids
    (broadcast; vocabulary-sized). Skolem ids (containing ``::``) are
    always entities. Without ``entity_ids``, only subjects and skolems get
    self-edges — never a hardcoded id-prefix test."""
    ent_objs = triples.filter(F.col("obj").contains("::")).select(F.col("obj").alias("id"))
    if entity_ids is not None:
        ent_objs = ent_objs.union(
            triples.join(
                F.broadcast(entity_ids.select(F.col("id").alias("obj"))), "obj", "left_semi"
            ).select(F.col("obj").alias("id"))
        )
    ents = triples.select(F.col("subj").alias("id")).union(ent_objs).distinct()
    self_edges = ents.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    if label_similarity_edges is not None:
        return self_edges.unionByName(label_similarity_edges.select("src", "dst"))
    return self_edges


def canonicalize_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Rewrite subj/obj to their component representative (min id)."""
    subj_map = components.select(F.col("id").alias("subj"), F.col("component").alias("subj_canon"))
    obj_map = components.select(F.col("id").alias("obj"), F.col("component").alias("obj_canon"))
    return (
        triples.join(F.broadcast(subj_map), "subj", "left")
        .join(F.broadcast(obj_map), "obj", "left")
        .select(
            "doc_key",
            F.coalesce("subj_canon", "subj").alias("subj"),
            "pred",
            F.coalesce("obj_canon", "obj").alias("obj"),
        )
        .dropDuplicates(["doc_key", "subj", "pred", "obj"])
    )
