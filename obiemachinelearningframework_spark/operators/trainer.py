"""Linear-scorer training.

The reference trains a log-linear model by sampling + margin updates
(BIRE ``AdvancedLearner`` with SGD + L2, wired at
``run/AbstractOBIERunner.java:217-248``) against an objective that scores a
proposal by whether it moves the state toward gold
(``objfunc/REObjectiveFunction.java:39-61``). Batched over all documents,
that signal is exactly a per-candidate correctness label: a (root, slot,
candidate) pair is positive iff the gold tree contains that assignment.
We therefore train the same linear feature weights by logistic gradient
descent over the long-format feature table — deterministic (fixed seed,
full-batch), tiny model (thousands of named features), weights broadcast
back for scoring, train-only feature admission exactly like the
reference's ``scorer/InstanceCollection.java:44-50`` (features never seen
in training get no weight = inner join at scoring time).

Driver-side numpy is deliberate: the MODEL is small even at 10^12-file
scale (feature space is capped by ontology x vocabulary); only the
DATA is big, and the data-side products (features, labels) stay
distributed. For feature tables too large to aggregate onto the driver,
the identical long format feeds Spark ML LogisticRegression via feature
hashing — the scoring path is unchanged.

Thresholds: the explorer's null-filler proposal
(SlotFillerExplorer.java:250-261) means "leave the slot empty" competes
with every candidate; with a calibrated per-slot threshold the greedy
accept (score > threshold) reproduces strict-accept behavior.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

THRESHOLD_PREFIX = "__THRESHOLD__"


def label_pairs(pairs: DataFrame, gold_triples: DataFrame) -> DataFrame:
    """pair is positive iff (root_id, slot_name, obj_id) is a gold triple."""
    g = gold_triples.select(
        "doc_key",
        F.col("subj").alias("root_id"),
        F.col("pred").alias("slot_name"),
        F.col("obj").alias("obj_id"),
        F.lit(1.0).alias("label"),
    ).dropDuplicates()
    return (
        pairs.select("pair_id", "doc_key", "root_id", "slot_name", "obj_id")
        .join(g, ["doc_key", "root_id", "slot_name", "obj_id"], "left")
        .select("pair_id", "slot_name", F.coalesce("label", F.lit(0.0)).alias("label"))
        .dropDuplicates(["pair_id"])
    )


def train_weights(
    features: DataFrame,
    labels: DataFrame,
    iters: int = 300,
    lr: float = 0.5,
    l2: float = 1e-4,
    seed: int = 7,
) -> pd.DataFrame:
    """Full-batch logistic GD; returns (feature, weight) incl. per-slot
    calibrated thresholds as pseudo-features ``__THRESHOLD__[slot]``."""
    feat = features.toPandas()
    lab = labels.toPandas()

    pair_ids = lab.pair_id.to_numpy()
    pair_index = {p: i for i, p in enumerate(pair_ids)}
    y = lab.label.to_numpy(dtype=np.float64)
    feat = feat[feat.pair_id.isin(pair_index)]
    fnames = np.array(sorted(feat.feature.unique()))
    findex = {f: j for j, f in enumerate(fnames)}
    rows = feat.pair_id.map(pair_index).to_numpy(dtype=np.int64)
    cols = feat.feature.map(findex).to_numpy(dtype=np.int64)
    vals = feat.value.to_numpy(dtype=np.float64)

    n, m = len(y), len(fnames)
    rng = np.random.RandomState(seed)
    w = rng.normal(0.0, 0.01, size=m)
    pos = max(y.sum(), 1.0)
    neg = max(len(y) - y.sum(), 1.0)
    sample_w = np.where(y > 0.5, neg / pos, 1.0)  # balance classes
    sample_w = sample_w / sample_w.mean()

    for _ in range(iters):
        margin = np.zeros(n)
        np.add.at(margin, rows, vals * w[cols])
        p = 1.0 / (1.0 + np.exp(-np.clip(margin, -30, 30)))
        g_row = (p - y) * sample_w / n
        grad = np.zeros(m)
        np.add.at(grad, cols, vals * g_row[rows])
        w -= lr * (grad + l2 * w)

    # per-slot threshold calibration on the training pairs (sweep the
    # midpoint grid of observed scores, maximize F1)
    margin = np.zeros(n)
    np.add.at(margin, rows, vals * w[cols])
    slots = lab.slot_name.to_numpy()
    th_rows = []
    for slot in np.unique(slots):
        mask = slots == slot
        s, t = margin[mask], y[mask]
        order = np.argsort(s)
        s_sorted, t_sorted = s[order], t[order]
        cand_th = np.concatenate([[s_sorted[0] - 1.0], (s_sorted[1:] + s_sorted[:-1]) / 2.0])
        best_th, best_f1 = 0.0, -1.0
        total_pos = t.sum()
        for th in np.unique(cand_th):
            pred = s > th
            tp = float((pred & (t > 0.5)).sum())
            fp = float((pred & (t <= 0.5)).sum())
            fn = float(total_pos - tp)
            f1 = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
            if f1 > best_f1:
                best_f1, best_th = f1, float(th)
        th_rows.append((f"{THRESHOLD_PREFIX}[{slot}]", best_th))

    out = pd.DataFrame({"feature": fnames, "weight": w})
    return pd.concat([out, pd.DataFrame(th_rows, columns=["feature", "weight"])], ignore_index=True)


def thresholds_from_weights(weights: pd.DataFrame) -> dict:
    th = {}
    for r in weights.itertuples():
        if r.feature.startswith(THRESHOLD_PREFIX):
            th[r.feature[len(THRESHOLD_PREFIX) + 1 : -1]] = float(r.weight)
    return th


def model_weights_df(spark, weights: pd.DataFrame) -> DataFrame:
    """Broadcastable model table without the threshold pseudo-rows."""
    w = weights[~weights.feature.str.startswith(THRESHOLD_PREFIX)]
    return spark.createDataFrame(w)
