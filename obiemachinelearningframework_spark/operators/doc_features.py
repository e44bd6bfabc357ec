"""State/document-level feature templates outside the pair projection.

Two reference template families score the STATE or the whole DOCUMENT
rather than a (root, slot, candidate) pair, so they live outside the
fused pair-feature projection (``operators/features.py``):

* ``DocumentClassificationTemplate`` (templates/DocumentClassification
  Template.java:115-130): for an assigned document class, one boolean
  feature ``<class>_<token>`` per document token — the feature family of
  the reference's binary/document classification runner.
* ``EmptyRootClassCardinalityTemplate`` (templates/EmptyRootClass
  CardinalityTemplate.java:36-76): per state, the boolean feature
  ``#OfEmpty_<RootClass> <= 1`` over the number of proposed roots whose
  template annotation has NO filled slot — a state-level signal the
  sampler uses to discourage piles of empty roots.

Both are plain DataFrame products; the state-level one takes a beam
state (assignment rows) + the proposed roots, exactly the inputs
``beam.beam_fill`` iterates on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def document_classification_features(instances: DataFrame, doc_classes: DataFrame) -> DataFrame:
    """(doc_key, content) x (doc_key, class_id) -> long-format features
    ``doccls=<class>_<token>`` with unit total mass per document (the
    reference emits booleans per distinct token; unit mass keeps long
    documents from outscoring short ones, as in the other token families).
    """
    toks = instances.select(
        "doc_key",
        F.explode(
            F.array_distinct(F.filter(F.split(F.lower("content"), r"\W+"), lambda t: F.length(t) >= 1))
        ).alias("token"),
    )
    n = toks.groupBy("doc_key").agg(F.count("*").alias("_n"))
    return (
        toks.join(doc_classes, "doc_key")
        .join(n, "doc_key")
        .select(
            "doc_key",
            "class_id",
            F.concat(F.lit("doccls="), F.col("class_id"), F.lit("_"), F.col("token")).alias("feature"),
            (F.lit(1.0) / F.col("_n")).alias("value"),
        )
    )


def empty_root_cardinality_features(roots: DataFrame, state: DataFrame) -> DataFrame:
    """Per (doc, root-class): ``#OfEmpty_<RootClass> <= 1`` over the count
    of proposed roots with zero assignment rows in the given state."""
    filled = state.select("doc_key", "root_id").distinct()
    empty = (
        roots.select("doc_key", "root_id", "root_class_id")
        .join(filled, ["doc_key", "root_id"], "left_anti")
        .groupBy("doc_key", "root_class_id")
        .agg(F.count("*").alias("n_empty"))
    )
    base = roots.select("doc_key", "root_class_id").distinct()
    j = base.join(empty, ["doc_key", "root_class_id"], "left").fillna({"n_empty": 0})
    return j.select(
        "doc_key",
        F.concat(
            F.lit("#OfEmpty_"), F.col("root_class_id"),
            F.when(F.col("n_empty") <= 1, F.lit(" <= 1")).otherwise(F.lit(" > 1")),
        ).alias("feature"),
        F.lit(1.0).alias("value"),
        F.col("n_empty"),
    )
