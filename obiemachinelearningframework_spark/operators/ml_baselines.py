"""Spark-ML-backed baseline scorers — the reference's external-solver
family re-expressed on Spark ML so no JNI/native solver is needed.

* ``MLBaselineScorer(kind="rf")`` re-creates
  ``tools/baseline/WEKABaseline.java:30-55``: the reference trains a WEKA
  RandomForest over sampled states' feature vectors and predicts state
  quality. Here the same (pair_id, feature, value) long table that feeds
  the linear trainer is assembled into sparse vectors executor-side
  (``trainer.assemble_vectors``) and fed to Spark ML
  ``RandomForestClassifier`` — JVM tree training with distributed
  histogram aggregation instead of a driver-side WEKA matrix.

* ``MLBaselineScorer(kind="reg")`` re-creates the regression-scorer path
  shared by ``scorer/LibSVMRegressionScorer.java`` (epsilon-SVR over
  collected (feature-vector, objective-score) points) and
  ``tools/baseline/SVRSampleBaseline.java``: fit a regressor of the
  objective signal and use its prediction as the decision value. Spark ML
  has no epsilon-insensitive loss, so the analog uses L2-regularized
  least squares (``LinearRegression``) — same role (regress the
  objective, score by prediction), different loss; documented
  substitution, not a silent one.

Both scorers share the linear pipeline's contract: ``fit(features,
labels)`` on training pairs, ``score(features)`` -> (pair_id, score)
where score > 0 means "assign" (probability/prediction centered at 0.5),
so the output drops into ``filler.greedy_fill`` with zero thresholds.
Train-only feature admission is inherited from ``assemble_vectors`` (the
transform-time vocabulary is the training vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .trainer import assemble_vectors


class MLBaselineScorer:
    def __init__(self, kind: str = "rf", num_trees: int = 50, max_depth: int = 8,
                 reg_param: float = 1e-4, seed: int = 13):
        if kind not in ("rf", "reg"):
            raise ValueError(f"unknown ML baseline kind: {kind!r}")
        self.kind = kind
        self.num_trees = num_trees
        self.max_depth = max_depth
        self.reg_param = reg_param
        self.seed = seed
        self.model = None
        self.vocab: list | None = None

    def fit(self, features: DataFrame, labels: DataFrame) -> "MLBaselineScorer":
        data, vocab = assemble_vectors(features, labels)
        scratch = getattr(data, "_obie_scratch_path", None)
        self.vocab = vocab
        if self.kind == "rf":
            from pyspark.ml.classification import RandomForestClassifier

            est = RandomForestClassifier(
                featuresCol="fvec", labelCol="label",
                numTrees=self.num_trees, maxDepth=self.max_depth,
                seed=self.seed, subsamplingRate=0.8,
            )
        else:
            from pyspark.ml.regression import LinearRegression

            est = LinearRegression(
                featuresCol="fvec", labelCol="label",
                regParam=self.reg_param, standardization=False,
            )
        data = data.cache()
        self.model = est.fit(data)
        data.unpersist()
        # same scratch hygiene as train_weights_distributed: the libsvm
        # text materialization (sparse path only) is dead once the
        # estimator is fitted (code-review r5)
        if scratch:
            from .trainer import _rm_scratch

            _rm_scratch(scratch)
        return self

    def score(self, features: DataFrame) -> DataFrame:
        """features (any split) -> (pair_id, score); score > 0 = assign.

        RF: score = P(label=1) - 0.5. Regression: score = yhat - 0.5 (the
        label is the 0/1 objective signal, so 0.5 is the natural cut)."""
        if self.model is None:
            raise RuntimeError("fit() first")
        data, _ = assemble_vectors(features, None, vocab=self.vocab)
        scored = self.model.transform(data)
        if self.kind == "rf":
            from pyspark.ml.functions import vector_to_array

            s = vector_to_array(F.col("probability")).getItem(1) - F.lit(0.5)
        else:
            s = F.col("prediction") - F.lit(0.5)
        return scored.select("pair_id", s.alias("score"))


def ml_baseline_fill(pairs: DataFrame, scorer: MLBaselineScorer,
                     features: DataFrame, ontology) -> DataFrame:
    """pairs + fitted ML baseline -> assignments, via the same greedy fill
    as the linear pipeline (thresholds all 0: the scorer's outputs are
    already centered)."""
    from .filler import greedy_fill

    scores = scorer.score(features)
    pw = pairs.join(scores, "pair_id", "left").fillna({"score": 0.0})
    return greedy_fill(pw, ontology, {})
