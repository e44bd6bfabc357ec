"""BPE tokenizer induction (operators/bpe.py), pinned against a pure-
Python reference implementation of Sennrich-style BPE on the same
word-frequency table."""

from collections import Counter

import pandas as pd
import pytest

from obiemachinelearningframework_spark.operators.bpe import (
    END,
    encode_bpe,
    learn_bpe,
    word_freqs,
)
from obiemachinelearningframework_spark.queries import _tokens

SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 12


def _py_word_freqs():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wf = Counter()
    for text in docs.text:
        for tok in text.split(" "):
            if tok:
                wf[tok] += 1
    return wf


def _py_learn(wf, n_merges, min_freq=2):
    vocab = {w: list(w) + [END] for w in wf}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # (freq DESC, pair ASC) — the operator's deterministic tie-break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _py_encode(word, ranks):
    syms = list(word) + [END]
    while len(syms) > 1:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


@pytest.fixture(scope="module")
def learned(spark):
    t = _tokens(spark, SF_DIR)
    return t, learn_bpe(t, n_merges=N_MERGES)


def test_word_freqs_match(spark):
    got = {r.word: r.freq for r in word_freqs(_tokens(spark, SF_DIR)).collect()}
    assert got == dict(_py_word_freqs())


def test_learned_merges_match_python(learned):
    _, merges = learned
    want = _py_learn(_py_word_freqs(), N_MERGES)
    assert merges == want
    assert len(merges) == N_MERGES  # corpus is big enough to learn them all


def test_encode_matches_python_and_compresses(spark, learned):
    t, merges = learned
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    enc = encode_bpe(t.limit(500), merges).collect()
    assert len(enc) == 500
    for r in enc:
        assert r.pieces == _py_encode(r.token, ranks)
        assert r.n_pieces == len(r.pieces)
        assert "".join(r.pieces) == r.token + END  # lossless
    # more merges => never more pieces, and strictly fewer somewhere
    few = {(r.doc_id, r.token): r.n_pieces
           for r in encode_bpe(t.limit(500), merges[:3]).collect()}
    full = {(r.doc_id, r.token): r.n_pieces for r in enc}
    assert all(full[k] <= few[k] for k in few)
    assert any(full[k] < few[k] for k in few)
