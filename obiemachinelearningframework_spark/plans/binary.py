"""Binary / document-classification runner.

The reference's ``run/DefaultBinaryClassificationRunner.java`` trains the
same sampling machinery against ``objfunc/BinaryClassificationObjective
Function.java:31-39``: a state scores 1 iff its predicted root INDIVIDUALS
equal the gold individuals, 0 otherwise — i.e. document-level
classification by root individual, with
``DocumentClassificationTemplate`` as the signal. The runner's epoch
callbacks (randomly alternating objective-score and model-score sampling
epochs, :32-43) are a schedule for BIRE's sequential sampler; the batched
trainer below replaces the whole sampling loop, so the schedule is
subsumed exactly like the explorers' add/remove variants are subsumed by
the one-shot top-k fill (SURVEY.md §3.2).

Batched decomposition: the exact-match objective over single-individual
states is per-candidate membership — a (doc, individual) candidate is
positive iff the individual is in the doc's gold set. So:

* candidates = distinct (doc_key, individual_id) over the detected
  individual mentions (the explorer's evidence pruning: only mentioned
  individuals are proposable);
* features = DocumentClassificationTemplate tokens (doc_features.py) +
  a per-candidate mention-frequency family;
* weights = the shared logistic trainer (operators/trainer.py) over the
  same long format;
* predict = per-doc argmax above the calibrated threshold;
* evaluate = exact-match accuracy (the objective itself, averaged).

Scale shape: candidates and features are mention-sized, keys are
doc_key-prefixed, the model is broadcast — same plan family as the main
pipeline, no corpus-sized shuffle beyond the one doc_key clustering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

from ..operators.doc_features import document_classification_features
from ..operators.mentions import detect_mentions
from ..operators.trainer import (
    thresholds_from_weights,
    train_weights,
)

DOC_SLOT = "__doc__"


class BinaryClassificationRunner:
    def __init__(self, spark, ontology, min_ner_length: int = 2):
        self.spark = spark
        self.ontology = ontology
        self.min_ner_length = min_ner_length
        self.weights: pd.DataFrame | None = None
        self.threshold: float = 0.0

    # ------------------------------------------------------------ stages

    def candidates(self, instances: DataFrame) -> DataFrame:
        """Distinct (doc_key, individual_id) with mention stats — evidence
        pruning: only individuals with a mention are proposable."""
        m = detect_mentions(instances, self.ontology, self.min_ner_length)
        return (
            m.filter(F.col("kind") == "individual")
            .groupBy("doc_key", "individual_id")
            .agg(
                F.count("*").alias("n_mentions"),
                F.min("onset").alias("first_onset"),
            )
        )

    def _features(self, instances: DataFrame, cands: DataFrame) -> DataFrame:
        """Long-format (doc_key, pair_id, feature, value) per candidate:
        DocumentClassificationTemplate tokens keyed by the candidate
        individual + frequency/position scalars."""
        pid = F.sha2(F.concat_ws("\x01", "doc_key", "individual_id"), 256)
        c = cands.withColumn("pair_id", pid)
        doccls = document_classification_features(
            instances, c.select("doc_key", F.col("individual_id").alias("class_id"))
        ).withColumn(
            "pair_id",
            F.sha2(F.concat_ws("\x01", "doc_key", "class_id"), 256),
        ).select("doc_key", "pair_id", "feature", "value")
        w_doc = W.partitionBy("doc_key")
        scalars = c.select(
            "doc_key", "pair_id",
            F.concat(
                F.lit("bincls_freq="), F.least(F.col("n_mentions"), F.lit(6)).cast("string")
            ).alias("feature"),
            F.lit(1.0).alias("value"),
        ).unionByName(
            c.withColumn("_mx", F.max("n_mentions").over(w_doc))
            .filter(F.col("n_mentions") == F.col("_mx"))
            .select(
                "doc_key", "pair_id",
                F.lit("bincls_max_freq").alias("feature"), F.lit(1.0).alias("value"),
            )
        ).unionByName(
            c.select(
                "doc_key", "pair_id",
                F.concat(F.lit("bincls_prior="), "individual_id").alias("feature"),
                F.lit(1.0).alias("value"),
            )
        )
        return doccls.unionByName(scalars)

    # ------------------------------------------------------------- train

    def fit(self, instances: DataFrame, gold: DataFrame) -> "BinaryClassificationRunner":
        """``gold``: (doc_key, individual_id) — the gold root individuals
        per document (BinaryClassificationObjectiveFunction compares
        exactly these lists)."""
        cands = self.candidates(instances).cache()
        feats = self._features(instances, cands)
        pid = F.sha2(F.concat_ws("\x01", "doc_key", "individual_id"), 256)
        labels = (
            cands.withColumn("pair_id", pid)
            .join(
                gold.select("doc_key", "individual_id", F.lit(1.0).alias("_g")).distinct(),
                ["doc_key", "individual_id"], "left",
            )
            .select(
                "doc_key", "pair_id",
                F.lit(DOC_SLOT).alias("slot_name"),
                F.coalesce("_g", F.lit(0.0)).alias("label"),
            )
        )
        self.weights = train_weights(feats, labels)
        self.threshold = thresholds_from_weights(self.weights).get(DOC_SLOT, 0.0)
        cands.unpersist()
        return self

    # ----------------------------------------------------------- predict

    def predict(self, instances: DataFrame) -> DataFrame:
        """(doc_key, individual_id, score): the argmax candidate per doc
        above the calibrated threshold (single-label classification, the
        reference's single-root binary task)."""
        assert self.weights is not None, "fit() first"
        from ..operators.trainer import model_weights_df

        cands = self.candidates(instances)
        feats = self._features(instances, cands)
        w_df = model_weights_df(self.spark, self.weights)
        scores = (
            feats.join(F.broadcast(w_df), "feature")
            .groupBy("doc_key", "pair_id")
            .agg(F.sum(F.col("value") * F.col("weight")).alias("score"))
        )
        pid = F.sha2(F.concat_ws("\x01", "doc_key", "individual_id"), 256)
        scored = cands.withColumn("pair_id", pid).join(
            scores, ["doc_key", "pair_id"], "left"
        ).fillna({"score": 0.0})
        w = W.partitionBy("doc_key").orderBy(
            F.desc("score"), F.asc("first_onset"), F.asc("individual_id")
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("score") > F.lit(self.threshold)))
            .select("doc_key", "individual_id", "score")
        )

    # ---------------------------------------------------------- evaluate

    def exact_match_accuracy(self, pred: DataFrame, gold: DataFrame) -> float:
        """The objective itself, averaged over documents: 1 iff the
        predicted individual set equals the gold set."""
        p = pred.groupBy("doc_key").agg(F.sort_array(F.collect_set("individual_id")).alias("_p"))
        g = gold.groupBy("doc_key").agg(F.sort_array(F.collect_set("individual_id")).alias("_g"))
        j = g.join(p, "doc_key", "left")
        row = j.agg(
            F.avg((F.coalesce("_p", F.array()) == F.col("_g")).cast("double")).alias("acc")
        ).collect()[0]
        return float(row["acc"])
