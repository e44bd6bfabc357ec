"""Semantics of kg_triple_support and the portable HyperLogLog distinct
sketch, pinned against pure-Python recomputation."""

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import (
    DICT,
    HLL_ALPHA,
    HLL_M,
    PRED_DICT,
    q_distinct_hll,
    q_kg_triple_support,
)

SF_DIR = "/root/testdata/sf0.001"


def _toks(text):
    return [t for t in text.split(" ") if t]


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_kg_triple_support_matches_python(spark, docs_pd):
    dict_map = defaultdict(set)
    for s, t in DICT:
        dict_map[s].add(t)
    pred_set = {(s, t) for s, t in PRED_DICT}

    want = {}
    for _, row in docs_pd.iterrows():
        for pos, tok in enumerate(_toks(row.text)):
            for t in dict_map.get(tok, ()):
                key = (f"doc_{row.doc_id}", f"mentions_{t}", tok)
                sup, first, corr = want.get(key, (0, pos, 0))
                want[key] = (sup + 1, min(first, pos),
                             max(corr, int((tok, t) in pred_set)))

    got = {(r.subj, r.pred, r.obj): (r.support, r.first_pos, r.corroborated)
           for r in q_kg_triple_support(spark, SF_DIR).collect()}
    assert got == want and len(got) > 0
    # support aggregates occurrences: at least one triple has support > 1,
    # and the noisy channel corroborates some but not all assertions
    assert any(v[0] > 1 for v in got.values())
    corrs = {v[2] for v in got.values()}
    assert corrs == {0, 1}


def _hll_estimate(values):
    regs = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
        idx, w = h % HLL_M, h // HLL_M
        rho = 27 if w == 0 else 27 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s = sum(2.0 ** -m for m in regs.values()) + (HLL_M - len(regs))
    v0 = HLL_M - len(regs)
    raw = HLL_ALPHA * HLL_M * HLL_M / s
    if raw <= 2.5 * HLL_M and v0 > 0:
        return HLL_M * math.log(HLL_M / v0)
    return raw


def test_distinct_hll_matches_python(spark, docs_pd):
    vocab = defaultdict(set)
    for _, row in docs_pd.iterrows():
        vocab[row.lang].update(_toks(row.text))

    got = {r.lang: r for r in q_distinct_hll(spark, SF_DIR).collect()}
    assert set(got) == set(vocab)
    for lang, toks in vocab.items():
        r = got[lang]
        assert r.n_exact == len(toks)
        assert r.n_est == pytest.approx(round(_hll_estimate(toks), 4), abs=1e-6)
        # m=64 -> standard error ~13%; the report's reason to exist
        assert r.rel_err < 0.4


def test_distinct_hll_deterministic_across_parallelism(spark):
    one = sorted(map(tuple, q_distinct_hll(spark, SF_DIR).coalesce(1).collect()))
    many = sorted(map(tuple, q_distinct_hll(spark, SF_DIR).repartition(16).collect()))
    assert one == many  # register max + dyadic-exact sums: order-free


def test_distinct_hll_small_range_correction(spark, tmp_path):
    """A tiny vocabulary leaves empty registers (V > 0) and a raw
    estimate <= 2.5m, so the linear-counting branch E = m*ln(m/V) must
    fire — pinned against the same math in pure Python."""
    rng = [f"w{i:02d}" for i in range(25)]
    rows = [(i, " ".join(rng), "xx", "t", 1) for i in range(3)]
    pd_df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    out = str(tmp_path / "tiny")
    spark.createDataFrame(pd_df).write.mode("overwrite").parquet(
        f"{out}/documents.parquet")

    r = q_distinct_hll(spark, out).collect()
    assert len(r) == 1 and r[0].lang == "xx"
    assert r[0].n_exact == 25
    est = _hll_estimate(set(rng))
    # the branch must actually be linear counting on this input
    regs = set()
    for v in rng:
        h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
        regs.add(h % HLL_M)
    assert HLL_M - len(regs) > 0
    assert r[0].n_est == pytest.approx(round(est, 4), abs=1e-6)
    assert abs(r[0].n_est - 25) / 25 < 0.45  # m=64 linear counting is coarse
