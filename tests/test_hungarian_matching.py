"""Exact assignment matching to n = 12 (CartesianSearchEvaluator parity).

The reference explores permutations to n = 12 (CartesianSearchEvaluator
.java:26-39); we keep literal permutations to n <= 7 and switch to
Dinkelbach + Hungarian for 8..12 (F1 is a RATIO of matching sums, so a
single tp-max assignment is not enough — Dinkelbach iterates Hungarian on
lambda-adjusted weights to the exact fractional optimum). Property pinned
here: on random annotation trees the assignment branch returns the SAME
optimal F1 as the brute-force permutation branch.
"""

import random
from itertools import permutations

import numpy as np

from obiemachinelearningframework_spark.operators.evaluator import (
    MAX_PERMUTE,
    TreeComparator,
    _prf,
    assignment_best_f1,
    hungarian_max,
)

DT = frozenset(["dt_a", "dt_b"])
CLASSES = ["player", "team", "coach", "dt_a", "dt_b"]


def _rand_node(rng, depth=0):
    cls = rng.choice(CLASSES)
    node = {
        "class_id": cls,
        "individual_id": rng.choice([None, "i1", "i2", "i3"]),
        "dt_value": rng.choice([None, "v1", "v2"]) if cls in DT else None,
        "text": rng.choice([None, "t1", "t2"]),
        "slots": {},
    }
    if depth < 2 and cls not in DT:
        for slot in rng.sample(["s1", "s2", "s3"], rng.randint(0, 2)):
            node["slots"][slot] = [_rand_node(rng, depth + 1) for _ in range(rng.randint(1, 2))]
    return node


def _brute_best(cmp, g, p, depth):
    n = max(len(g), len(p))
    g = g + [None] * (n - len(g))
    p = p + [None] * (n - len(p))
    best, best_f1 = None, -1.0
    for perm in permutations(range(n)):
        tp = fp = fn = 0
        for i, j in enumerate(perm):
            t = cmp.compare(g[i], p[j], depth)
            tp, fp, fn = tp + t[0], fp + t[1], fn + t[2]
        f1 = _prf(tp, fp, fn)
        if f1 > best_f1:
            best_f1, best = f1, (tp, fp, fn)
    return best, best_f1


def test_hungarian_equals_bruteforce_f1_on_random_trees():
    rng = random.Random(99)
    for trial in range(40):
        n = rng.randint(2, 6)
        gold = [_rand_node(rng) for _ in range(rng.randint(0, n))]
        pred = [_rand_node(rng) for _ in range(rng.randint(0, n))]
        if not gold and not pred:
            continue
        cmp = TreeComparator(DT, frozenset(["s3"]))
        _, brute_f1 = _brute_best(cmp, list(gold), list(pred), depth=0)
        # force the assignment branch by building the same pair table
        m = max(len(gold), len(pred))
        g = gold + [None] * (m - len(gold))
        p = pred + [None] * (m - len(pred))
        pair = {(i, j): cmp.compare(g[i], p[j], 0) for i in range(m) for j in range(m)}
        tp, fp, fn = assignment_best_f1(pair, m)
        assert _prf(tp, fp, fn) == brute_f1, (trial, (tp, fp, fn), brute_f1)


def test_large_list_uses_hungarian_and_matches_identity():
    """n = 10 identical lists (beyond MAX_PERMUTE, within MAX_ASSIGN) must
    score perfect F1 — the greedy fallback previously ran here."""
    rng = random.Random(7)
    nodes = [_rand_node(rng) for _ in range(10)]
    assert len(nodes) > MAX_PERMUTE
    cmp = TreeComparator(DT, frozenset(["s3"]))
    tp, fp, fn = cmp.match_lists(nodes, list(nodes), depth=0)
    assert fp == 0 and fn == 0 and tp > 0
    assert _prf(tp, fp, fn) == 1.0


def test_hungarian_max_simple_matrix():
    s = np.array([[1.0, 5.0], [5.0, 1.0]])
    a = hungarian_max(s)
    assert a == [1, 0]
    s2 = np.array([[9.0, 1.0, 1.0], [1.0, 9.0, 1.0], [1.0, 1.0, 9.0]])
    assert hungarian_max(s2) == [0, 1, 2]


def test_beam_matcher_wide_beam_equals_bruteforce():
    """BeamSearchEvaluator variant: with a beam wide enough to hold every
    partial assignment it must equal the exact matcher on random trees."""
    from obiemachinelearningframework_spark.operators.evaluator import beam_match

    rng = random.Random(5)
    for _ in range(20):
        n = rng.randint(2, 5)
        gold = [_rand_node(rng) for _ in range(n)]
        pred = [_rand_node(rng) for _ in range(rng.randint(1, n))]
        cmp = TreeComparator(DT, frozenset(["s3"]))
        _, brute_f1 = _brute_best(cmp, list(gold), list(pred), depth=0)
        m = max(len(gold), len(pred))
        g = gold + [None] * (m - len(gold))
        p = pred + [None] * (m - len(pred))
        pair = {(i, j): cmp.compare(g[i], p[j], 0) for i in range(m) for j in range(m)}
        t = beam_match(pair, m, beam_width=1000)
        assert _prf(*t) == brute_f1


def test_beam_matcher_narrow_beam_never_above_optimum():
    from obiemachinelearningframework_spark.operators.evaluator import beam_match

    rng = random.Random(11)
    for _ in range(20):
        n = rng.randint(2, 5)
        gold = [_rand_node(rng) for _ in range(n)]
        pred = [_rand_node(rng) for _ in range(n)]
        cmp = TreeComparator(DT, frozenset(["s3"]))
        _, brute_f1 = _brute_best(cmp, list(gold), list(pred), depth=0)
        pair = {(i, j): cmp.compare(gold[i], pred[j], 0) for i in range(n) for j in range(n)}
        t = beam_match(pair, n, beam_width=1)
        assert _prf(*t) <= brute_f1 + 1e-12
