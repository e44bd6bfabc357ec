"""State <-> node-table conversion.

A search state in the reference is a set of root template annotations with
filled slots (``variables/OBIEState.java:48-58``). Our relational encoding
is an adjacency-list node table, the same shape as the gold fixtures:

    nodes(doc_key, ann_id, node_id, parent_node_id, slot_name,
          class_id, individual_id, dt_value, text)

Pure column operations — no UDF.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window as W, functions as F


def assignments_to_nodes(assignments: DataFrame, ontology) -> DataFrame:
    """Flattened slot assignments -> prediction node trees (evaluator input)."""
    wr = W.partitionBy("doc_key").orderBy("root_id")
    roots = (
        assignments.select("doc_key", "root_id", "root_class_id", "anchor_individual_id")
        .distinct()
        .withColumn("ann_id", F.dense_rank().over(wr) - 1)
    )
    grounded = F.col("root_id") == F.col("anchor_individual_id")
    root_nodes = roots.select(
        "doc_key",
        "ann_id",
        F.lit(0).alias("node_id"),
        F.lit(None).cast("int").alias("parent_node_id"),
        F.lit(None).cast("string").alias("slot_name"),
        F.col("root_class_id").alias("class_id"),
        F.when(grounded, F.col("anchor_individual_id")).otherwise(F.lit(None)).alias("individual_id"),
        F.lit(None).cast("string").alias("dt_value"),
        F.lit(None).cast("string").alias("text"),
    )

    wa = W.partitionBy("doc_key", "root_id").orderBy("slot_name", "obj_id")
    a = (
        assignments.join(roots.select("doc_key", "root_id", "ann_id"), ["doc_key", "root_id"])
        .withColumn("_rn", F.row_number().over(wa))
    )
    filler_nodes = a.select(
        "doc_key",
        "ann_id",
        (F.col("_rn") * 10).alias("node_id"),
        F.lit(0).alias("parent_node_id"),
        "slot_name",
        "class_id",
        "individual_id",
        "dt_value",
        "text",
    )

    # auxiliary fillers: child datatype nodes under the aux node
    child_range = {
        r.slot_name: r.range_class_id
        for r in ontology.slots.itertuples()
        if r.owner_class_id in set(ontology.classes[ontology.classes.is_auxiliary].class_id)
    }
    if child_range:
        range_map = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in child_range.items()))
        aux_children = (
            a.filter(F.col("slot_kind") == "aux")
            .select("doc_key", "ann_id", "_rn", F.posexplode("aux_values").alias("pos", "child_slot", "child_value"))
            .select(
                "doc_key",
                "ann_id",
                (F.col("_rn") * 10 + F.col("pos") + 1).alias("node_id"),
                (F.col("_rn") * 10).alias("parent_node_id"),
                F.col("child_slot").alias("slot_name"),
                range_map[F.col("child_slot")].alias("class_id"),
                F.lit(None).cast("string").alias("individual_id"),
                F.col("child_value").alias("dt_value"),
                F.lit(None).cast("string").alias("text"),
            )
        )
        filler_nodes = filler_nodes.unionByName(aux_children)

    return root_nodes.unionByName(filler_nodes)
