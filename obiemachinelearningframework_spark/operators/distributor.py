"""Corpus distributors — train/dev/test splitting strategies.

Re-creates ``corpus/distributor/*`` (reference):
* OriginalCorpusDistributor (170 LoC)  -> filter on the split column
* ShuffleCorpusDistributor (:14-60)    -> seeded shuffle + proportions
* FoldCrossCorpusDistributor (:13-40)  -> n-fold assignment
* ByInstanceNameDistributor            -> semi-join on explicit name lists

All pure column operations; the seeded shuffle uses a deterministic hash
ordering rather than randomSplit so the assignment is stable across
partitionings and resumes (randomSplit is partition-order sensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def original_split(instances: DataFrame, splits: DataFrame) -> dict:
    df = instances.join(splits, "doc_key")
    return {s: df.filter(F.col("split") == s).drop("split") for s in ("train", "dev", "test")}


def shuffle_split(instances: DataFrame, train: float = 0.6, dev: float = 0.2,
                  seed: int = 100) -> DataFrame:
    """Deterministic proportional split: rank by hash(doc_key, seed)."""
    w = W.orderBy(F.xxhash64("doc_key", F.lit(seed)))
    n = instances.count()
    ranked = instances.withColumn("_r", F.row_number().over(w))
    return ranked.withColumn(
        "split",
        F.when(F.col("_r") <= int(n * train), "train")
        .when(F.col("_r") <= int(n * (train + dev)), "dev")
        .otherwise("test"),
    ).drop("_r")


def fold_split(instances: DataFrame, n_folds: int = 5, seed: int = 100) -> DataFrame:
    """n-fold cross-validation fold assignment."""
    return instances.withColumn(
        "fold", F.pmod(F.xxhash64("doc_key", F.lit(seed)), F.lit(n_folds)).cast("int")
    )


def by_name_split(instances: DataFrame, train_keys: DataFrame, test_keys: DataFrame) -> dict:
    return {
        "train": instances.join(train_keys, "doc_key", "left_semi"),
        "test": instances.join(test_keys, "doc_key", "left_semi"),
    }


def upper_bound_recall(gold_triples: DataFrame, candidates: DataFrame, roots: DataFrame) -> dict:
    """UpperBound max-recall oracle (tools/upperbound/UpperBound.java:33-46):
    the fraction of gold triples reachable by ANY candidate — bounds what
    any slot filler built on these candidates can achieve."""
    reachable_fillers = candidates.select("doc_key", F.col("slot_name").alias("pred"), F.col("obj_id").alias("obj"))
    reachable_subj = roots.select("doc_key", F.col("root_id").alias("subj"))
    reach = reachable_fillers.join(reachable_subj, "doc_key")
    hit = gold_triples.join(reach, ["doc_key", "subj", "pred", "obj"], "left_semi").count()
    slot_gold = gold_triples.join(
        reachable_fillers.select("pred").distinct(), "pred", "left_semi"
    ).count()
    return {"reachable": hit, "gold_root_level": slot_gold,
            "upper_bound_recall": hit / slot_gold if slot_gold else 1.0}
