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
    """Deterministic proportional split: rank by hash(doc_key, seed).
    Exact proportions via two parallel sort-limits (sort-limit pushdown:
    each partition keeps a local head, the driver merges heads) — NOT a
    global row_number window, which funnels the whole corpus through one
    task."""
    n = instances.count()
    h = instances.select(
        "doc_key", F.xxhash64("doc_key", F.lit(seed)).alias("_h")
    ).orderBy("_h", "doc_key")
    train_k = h.limit(int(n * train)).select("doc_key").withColumn("split", F.lit("train"))
    dev_k = (
        h.limit(int(n * (train + dev)))
        .select("doc_key")
        .join(train_k.select("doc_key"), "doc_key", "left_anti")
        .withColumn("split", F.lit("dev"))
    )
    labeled = train_k.unionByName(dev_k)
    return (
        instances.drop("split")
        .join(labeled, "doc_key", "left")
        .withColumn("split", F.coalesce("split", F.lit("test")))
    )


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
