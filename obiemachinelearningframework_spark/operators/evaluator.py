"""Structure-aware P/R/F1 evaluation.

Two layers, as in the reference:

1. ``triple_prf`` — exact-match micro P/R/F1 over flattened
   (doc_key, subj, pred, obj) triples: the BASELINE.json parity gate.
   Pure DataFrame joins + one aggregate.

2. ``tree_prf`` — recursive best-permutation tree comparison re-creating
   ``evaluation/evaluator/AbstractOBIEEvaluator.compareObjectWise``
   (``:196-434``) + ``CartesianSearchEvaluator.explore`` (``:170-249``):
   datatype equality on interpreted value (fallback surface text), class +
   individual identity for entities, recursion over the union of gold and
   predicted slots, list slots matched by best permutation, root
   annotation lists padded with empty instances (``:263-273``) and matched
   over all permutations with early exit at F1=1 (``:244``). Executed as a
   cogrouped ``applyInPandas`` per document — per-pair results are memoized
   inside the UDF exactly like the reference's PRF1 cache (``:49,215-237``).
"""

from __future__ import annotations

from itertools import permutations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAX_PERMUTE = 7          # n! explored up to here (reference tie-breaking)
MAX_ASSIGN = 12          # exact assignment up to here — the reference's
                         # CartesianSearchEvaluator explores permutations to
                         # n=12 (:26-39); we find the same optimal F1 in
                         # O(n^3 log) via Dinkelbach iterations of a
                         # Hungarian assignment (F1 is a ratio of sums —
                         # linear-fractional over matchings, not linear, so
                         # a single tp-max assignment is NOT sufficient:
                         # e.g. a null-valued datatype node contributes an
                         # fp under some pairings and none under others)
MAX_DEPTH = 5            # reference maxEvaluationDepth (project-supplied)


def hungarian_max(score: np.ndarray) -> list[int]:
    """Maximum-weight perfect matching on a square score matrix; returns
    col index assigned to each row. O(n^3) shortest-augmenting-path
    algorithm with potentials (Jonker-Volgenant style) on the negated
    matrix — no scipy in this environment."""
    n = score.shape[0]
    cost = (score.max() - score).astype(np.float64)  # minimize
    INF = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row matched to col j (1-based)
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    assign = [0] * n
    for j in range(1, n + 1):
        if p[j]:
            assign[p[j] - 1] = j - 1
    return assign


def beam_match(pair: dict, n: int, beam_width: int = 10):
    """``BeamSearchEvaluator`` (evaluation/evaluator/BeamSearchEvaluator
    .java:24-62): assignment built left-to-right keeping the best
    ``beam_width`` partial assignments by F1 — the parameterized-quality
    alternative to the exact matchers for very large lists."""
    beams = [((0, 0, 0), frozenset())]
    for i in range(n):
        nxt = []
        for counts, used in beams:
            for j in range(n):
                if j in used:
                    continue
                t = pair[(i, j)]
                c = (counts[0] + t[0], counts[1] + t[1], counts[2] + t[2])
                nxt.append((c, used | {j}))
        # F1 is not additive, so partials with the same used-set but
        # different per-row pairings must BOTH survive if the beam allows —
        # truncate by current F1 only (deterministic tie order)
        nxt.sort(key=lambda b: (-_prf(*b[0]), sorted(b[1]), b[0]))
        beams = nxt[:beam_width]
    return max(beams, key=lambda b: _prf(*b[0]))[0]


def assignment_best_f1(pair: dict, n: int):
    """Exact max-F1 perfect matching over an n x n pair table of
    (tp, fp, fn) counts — Dinkelbach's algorithm for the linear-fractional
    objective 2·ΣT / (2·ΣT + ΣFP + ΣFN): iterate λ ← F1(best assignment
    under weights 2tp - λ(2tp+fp+fn)) until fixpoint; each step is one
    O(n^3) Hungarian. Converges in a handful of iterations; exact at the
    fixpoint (standard fractional-programming result)."""
    t2 = np.array([[2.0 * pair[(i, j)][0] for j in range(n)] for i in range(n)])
    den = np.array(
        [[2.0 * pair[(i, j)][0] + pair[(i, j)][1] + pair[(i, j)][2] for j in range(n)]
         for i in range(n)]
    )
    lam, best = 0.0, (0, 0, 0)
    for _ in range(30):
        assign = hungarian_max(t2 - lam * den)
        tp = fp = fn = 0
        for i, j in enumerate(assign):
            t = pair[(i, j)]
            tp, fp, fn = tp + t[0], fp + t[1], fn + t[2]
        f1 = _prf(tp, fp, fn)
        best = (tp, fp, fn)
        if abs(f1 - lam) < 1e-12:
            break
        lam = f1
    return best


# ---------------------------------------------------------------- triples

def triple_prf(pred: DataFrame, gold: DataFrame) -> dict:
    """Micro P/R/F1 by exact triple match (per-doc scoped)."""
    keys = ["doc_key", "subj", "pred", "obj"]
    p = pred.select(*keys).dropDuplicates()
    g = gold.select(*keys).dropDuplicates()
    tp = p.join(g, keys, "inner").count()
    n_pred = p.count()
    n_gold = g.count()
    fp, fn = n_pred - tp, n_gold - tp
    prec = tp / n_pred if n_pred else 1.0
    rec = tp / n_gold if n_gold else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1}


# ------------------------------------------------------------------ trees

def build_trees(pdf: pd.DataFrame) -> list[dict]:
    """Long-format nodes -> list of root template trees (one per ann_id)."""
    roots = []
    for _, ann in pdf.groupby("ann_id"):
        nodes: dict[int, dict] = {}
        for r in ann.itertuples():
            nodes[int(r.node_id)] = {
                "class_id": r.class_id,
                "individual_id": r.individual_id if pd.notna(r.individual_id) else None,
                "dt_value": r.dt_value if pd.notna(r.dt_value) else None,
                "text": r.text if pd.notna(r.text) else None,
                "slots": {},
                "_parent": int(r.parent_node_id) if pd.notna(r.parent_node_id) else None,
                "_slot": r.slot_name if pd.notna(r.slot_name) else None,
            }
        for nid, n in nodes.items():
            if n["_parent"] is not None and n["_parent"] in nodes:
                nodes[n["_parent"]]["slots"].setdefault(n["_slot"], []).append(n)
            elif n["_parent"] is None and n["_slot"] is None:
                roots.append(n)
    return roots


def _prf(tp: int, fp: int, fn: int) -> float:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return 2 * p * r / (p + r) if p + r else 0.0


class TreeComparator:
    """compareObjectWise semantics with per-pair memoization."""

    def __init__(self, datatype_classes: frozenset, list_slots: frozenset,
                 ignore_empty: bool = False, restrict_slots: frozenset | None = None,
                 matcher: str = "exact", beam_width: int = 10):
        """``restrict_slots`` — InvestigationRestriction
        (``variables/OBIEState.java:232-261,378-411``): when set, only the
        listed slot names are compared/recursed; others are invisible to
        the evaluation, exactly as restricted slots are invisible to the
        reference's explorers and evaluator.

        ``matcher`` — 'exact' (CartesianSearchEvaluator: permutations to
        MAX_PERMUTE, Dinkelbach+Hungarian to MAX_ASSIGN, greedy beyond) or
        'beam' (BeamSearchEvaluator.java:24-62 with ``beam_width``)."""
        self.dt = datatype_classes
        self.list_slots = list_slots
        self.ignore_empty = ignore_empty
        self.restrict_slots = restrict_slots
        self.matcher = matcher
        self.beam_width = beam_width
        self._memo: dict = {}

    def compare(self, gold: dict | None, pred: dict | None, depth: int = 0):
        key = (id(gold), id(pred), depth > 0)
        if key in self._memo:
            return self._memo[key]
        res = self._compare(gold, pred, depth)
        self._memo[key] = res
        return res

    def _compare(self, gold, pred, depth):
        if gold is None and pred is None:
            return (0, 0, 0)
        tp = fp = fn = 0
        if gold is None:
            fp += 1
        elif pred is None:
            fn += 1
        else:
            g_dt = gold["class_id"] in self.dt
            p_dt = pred["class_id"] in self.dt
            if g_dt or p_dt:
                # datatype branch returns without slot recursion (:261-310)
                if gold["class_id"] == pred["class_id"]:
                    pv = pred["dt_value"] if pred["dt_value"] is not None else pred["text"]
                    gv = gold["dt_value"] if gold["dt_value"] is not None else gold["text"]
                    if pv is None:
                        return (0, 0, 1)
                    if gv == pv:
                        return (1, 0, 0)
                    return (0, 1, 1)
                return (0, 1, 1)
            same_class = gold["class_id"] == pred["class_id"]
            same_ind = gold["individual_id"] == pred["individual_id"]
            if same_class and same_ind:
                tp += 1
            else:
                gi, pi = gold["individual_id"], pred["individual_id"]
                if gi is None and pi is not None:
                    fp += 1
                elif gi is not None and pi is None:
                    fn += 1
                else:
                    fp += 1
                    fn += 1
        if depth == MAX_DEPTH:
            return (tp, fp, fn)
        g_slots = gold["slots"] if gold else {}
        p_slots = pred["slots"] if pred else {}
        slot_set = set(g_slots) | set(p_slots)
        if self.restrict_slots is not None:
            slot_set &= self.restrict_slots
        for slot in slot_set:
            gl = g_slots.get(slot, [])
            pl = p_slots.get(slot, [])
            if slot in self.list_slots:
                t = self.match_lists(gl, pl, depth + 1)
            else:
                t = self.compare(gl[0] if gl else None, pl[0] if pl else None, depth + 1)
            tp, fp, fn = tp + t[0], fp + t[1], fn + t[2]
        return (tp, fp, fn)

    def match_lists(self, gold_list: list, pred_list: list, depth: int):
        """Best-assignment matching of two filler lists, padded with None —
        permutation explore for small n (reference pads with
        EmptyOBIEInstance and tries all permutations), greedy beyond."""
        n = max(len(gold_list), len(pred_list))
        if n == 0:
            return (0, 0, 0)
        g = gold_list + [None] * (n - len(gold_list))
        p = pred_list + [None] * (n - len(pred_list))
        pair = {}
        for i in range(n):
            for j in range(n):
                pair[(i, j)] = self.compare(g[i], p[j], depth)
        if self.matcher == "beam" and n > 1:
            return beam_match(pair, n, self.beam_width)
        best, best_f1 = None, -1.0
        if n <= MAX_PERMUTE:
            for perm in permutations(range(n)):
                tp = fp = fn = 0
                for i, j in enumerate(perm):
                    t = pair[(i, j)]
                    tp, fp, fn = tp + t[0], fp + t[1], fn + t[2]
                f1 = _prf(tp, fp, fn)
                if f1 > best_f1:
                    best_f1, best = f1, (tp, fp, fn)
                    if f1 == 1.0:
                        break
        elif n <= MAX_ASSIGN:
            # exact optimum without n! — Dinkelbach + Hungarian (asserted
            # equal to brute-force F1 in tests/test_hungarian_matching.py)
            best = assignment_best_f1(pair, n)
        else:
            used, tp, fp, fn = set(), 0, 0, 0
            for i in range(n):
                j_best = max(
                    (j for j in range(n) if j not in used),
                    key=lambda j: _prf(*pair[(i, j)]),
                )
                used.add(j_best)
                t = pair[(i, j_best)]
                tp, fp, fn = tp + t[0], fp + t[1], fn + t[2]
            best = (tp, fp, fn)
        return best


def compare_documents(gold_roots: list, pred_roots: list,
                      datatype_classes: frozenset, list_slots: frozenset,
                      restrict_slots: frozenset | None = None):
    """CartesianSearchEvaluator.explore over root annotation lists."""
    cmp = TreeComparator(datatype_classes, list_slots, restrict_slots=restrict_slots)
    return cmp.match_lists(gold_roots, pred_roots, depth=0)


def tree_prf(pred_nodes: DataFrame, gold_nodes: DataFrame, ontology,
             restrict_slots: frozenset | None = None) -> DataFrame:
    """Per-document (tp, fp, fn) via cogrouped applyInPandas; micro-aggregate
    with .agg(sum) afterwards (run/eval/EvaluatePrediction.java:39-115).
    ``restrict_slots`` applies InvestigationRestriction to the comparison."""
    dt_classes = frozenset(ontology.classes[ontology.classes.is_datatype].class_id)
    list_slots = frozenset(ontology.slots[ontology.slots.is_list].slot_name)
    cols = ["doc_key", "ann_id", "node_id", "parent_node_id", "slot_name",
            "class_id", "individual_id", "dt_value", "text"]

    def fn(key, gold_pdf: pd.DataFrame, pred_pdf: pd.DataFrame) -> pd.DataFrame:
        gold_roots = build_trees(gold_pdf) if len(gold_pdf) else []
        pred_roots = build_trees(pred_pdf) if len(pred_pdf) else []
        tp, fp, fn_ = compare_documents(
            gold_roots, pred_roots, dt_classes, list_slots, restrict_slots
        )
        return pd.DataFrame([{"doc_key": key[0], "tp": tp, "fp": fp, "fn": fn_}])

    g = gold_nodes.select(*cols)
    # fresh expression IDs on the pred side: cogrouping a DataFrame with
    # itself (gold-vs-gold identity checks) otherwise hits self-join
    # attribute dedup and the right side loses its columns
    p = pred_nodes.select([F.col(c).alias(c) for c in cols])
    return (
        g.groupBy("doc_key")
        .cogroup(p.groupBy("doc_key"))
        .applyInPandas(fn, "doc_key string, tp long, fp long, fn long")
    )


def strict_nel_prf(pred_mentions: DataFrame, gold_mentions: DataFrame,
                   keys: list[str] | None = None) -> dict:
    """StrictNamedEntityLinkingEvaluator (:25-115): set-based micro P/R/F1
    on exact annotation equality — join-based set intersection counts."""
    keys = keys or ["doc_key", "kind", "type_id", "onset", "offset"]
    p = pred_mentions.select(*keys).dropDuplicates()
    g = gold_mentions.select(*keys).dropDuplicates()
    tp = p.join(g, keys, "inner").count()
    n_pred, n_gold = p.count(), g.count()
    # empty-set convention matches triple_prf/micro_prf: predicting nothing
    # is vacuous precision 1.0 (not 0.0), so the evaluators agree on the
    # degenerate case and mixed-metric gates cannot disagree about it;
    # F1 is unchanged either way whenever recall is 0
    prec = tp / n_pred if n_pred else 1.0
    rec = tp / n_gold if n_gold else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": n_pred - tp, "fn": n_gold - tp,
            "precision": prec, "recall": rec, "f1": f1}


def per_slot_prf(pred_triples: DataFrame, gold_triples: DataFrame) -> DataFrame:
    """Slot-wise P/R/F1 breakdown (run/eval/EvaluatePrediction.java:150+):
    per predicate, exact-match tp/fp/fn and the derived rates."""
    keys = ["doc_key", "subj", "pred", "obj"]
    p = pred_triples.select(*keys).dropDuplicates()
    g = gold_triples.select(*keys).dropDuplicates()
    tp = p.join(g, keys, "inner").groupBy("pred").agg(F.count("*").alias("tp"))
    np_ = p.groupBy("pred").agg(F.count("*").alias("n_pred"))
    ng = g.groupBy("pred").agg(F.count("*").alias("n_gold"))
    j = (
        np_.join(ng, "pred", "full_outer")
        .join(tp, "pred", "left")
        .fillna({"tp": 0, "n_pred": 0, "n_gold": 0})
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    rec = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(F.lit(0.0))
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return j.select(
        "pred", "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_gold") - F.col("tp")).alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def purity(clusters: DataFrame, categories: DataFrame) -> dict:
    """PurityEvaluator (:15-37; Amigó et al. 2011): Purity =
    Σ_i (|C_i|/N) · max_j |C_i ∩ L_j| / |C_i|; InversePurity swaps the
    roles. Inputs: (item_id, cluster_id) and (item_id, category_id) — a
    groupBy/max computation, no pairwise blow-up."""
    j = clusters.join(categories, "item_id")
    overlap = j.groupBy("cluster_id", "category_id").agg(F.count("*").alias("o"))
    n = clusters.count()
    best_per_cluster = overlap.groupBy("cluster_id").agg(F.max("o").alias("mx"))
    pur = (best_per_cluster.agg(F.sum("mx")).collect()[0][0] or 0) / n if n else 0.0
    best_per_cat = overlap.groupBy("category_id").agg(F.max("o").alias("mx"))
    inv = (best_per_cat.agg(F.sum("mx")).collect()[0][0] or 0) / n if n else 0.0
    f = 2 * pur * inv / (pur + inv) if pur + inv else 0.0
    return {"purity": pur, "inverse_purity": inv, "f_purity": f, "n": n}


def micro_prf(per_doc: DataFrame) -> dict:
    row = per_doc.agg(F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")).collect()[0]
    tp, fp, fn = row.tp or 0, row.fp or 0, row.fn or 0
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1}
