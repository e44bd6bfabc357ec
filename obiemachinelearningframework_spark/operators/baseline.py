"""Baselines — the sandwich bounds around the trained slot filler.

* ``high_frequency_fill`` re-creates
  ``tools/baseline/HighFrequencyBaseline.java:34-80``: for every slot,
  predict (at most one) the most frequent candidate in the document —
  frequency of its text evidence, ties broken by earliest onset.
* ``random_fill`` re-creates ``tools/baseline/RandomBaseline.java:28-50``:
  a uniformly random candidate per slot under the same exploration
  constraints (evidence-pruned candidate set), seeded for determinism
  (the reference's RNG is unseeded; we pin it, SURVEY.md §4#8).

The trained filler must land between random/high-frequency from below and
the UpperBound oracle (``distributor.upper_bound_recall``) from above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def evidence_counts(mentions: DataFrame) -> DataFrame:
    """Per-document evidence frequency per type (HighFrequencyUtils.java:38-57
    with the cache replaced by a computed-once DataFrame)."""
    by_type = mentions.groupBy("doc_key", "type_id").agg(F.count("*").alias("type_count"))
    by_value = (
        mentions.filter(F.col("dt_value").isNotNull())
        .groupBy("doc_key", "class_id", "dt_value")
        .agg(F.count("*").alias("value_count"))
    )
    return by_type, by_value


def high_frequency_fill(roots: DataFrame, candidates: DataFrame, mentions: DataFrame) -> DataFrame:
    """roots x top-1-per-slot candidates -> assignments DataFrame
    (doc_key, root_id, root_class_id, anchor_individual_id, slot_name,
    slot_kind, class_id, individual_id, dt_value, obj_id, aux_values)."""
    by_type, by_value = evidence_counts(mentions)
    cand = (
        candidates
        .join(by_type.withColumnRenamed("type_id", "individual_id"),
              ["doc_key", "individual_id"], "left")
        .join(by_value, ["doc_key", "class_id", "dt_value"], "left")
        .withColumn("freq", F.coalesce("type_count", "value_count", F.lit(1)))
    )
    w = W.partitionBy("doc_key", "slot_name").orderBy(F.desc("freq"), F.asc("onset"), F.asc("obj_id"))
    top = cand.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn", "type_count", "value_count", "freq")
    return roots.select("doc_key", "root_id", "root_class_id", "anchor_individual_id").join(
        top, "doc_key"
    )


def random_fill(roots: DataFrame, candidates: DataFrame, seed: int = 100) -> DataFrame:
    """One uniformly random candidate per (doc, slot), seeded hash order."""
    w = W.partitionBy("doc_key", "slot_name").orderBy(
        F.xxhash64("doc_key", "slot_name", "obj_id", F.col("onset").cast("string"), F.lit(seed))
    )
    top = candidates.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    return roots.select("doc_key", "root_id", "root_class_id", "anchor_individual_id").join(
        top, "doc_key"
    )
