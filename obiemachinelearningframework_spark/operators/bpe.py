"""BPE tokenizer induction — trained subword vocabulary at corpus scale.

Classic byte-pair-encoding training (Sennrich et al., ACL 2016) has the
shape every large-scale tokenizer trainer exploits: the learning loop
never touches the corpus — it runs on the WORD-FREQUENCY table, which
is vocabulary-bounded. So the Spark plan is:

* one corpus pass: tokens -> (word, freq) hash aggregate (map-side
  combined; at 100 TB this is the cheapest aggregation shape there is);
* n_merges driver-paced iterations over the (word, symbols, freq)
  table: adjacent-pair counts weighted by freq (array ops, JVM-side),
  a 1-row argmax action, then an Arrow-batched merge of the chosen
  pair inside each word's symbol array;
* encode: the learned merge ranks broadcast, applied per token by a
  vectorized pandas UDF (the standard lowest-rank-first merge loop).

Ties break on (freq DESC, pair ASC) so the learned vocabulary is
deterministic across partitionings and engines.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

END = "</w>"   # end-of-word marker, merged like any symbol


def word_freqs(tokens: DataFrame) -> DataFrame:
    """(doc_id, token) -> (word, freq): the ONE corpus-sized pass."""
    return tokens.groupBy(F.col("token").alias("word")).agg(
        F.count("*").alias("freq")
    )


def _apply_merges_udf(merges_batch: list):
    """Apply a LIST of merges, in learned order, inside one Arrow-batched
    pass — identical output to chaining one UDF per merge (each merge is
    the same left-to-right scan), at one plan stage instead of
    ``len(merges_batch)``."""
    ms = [tuple(m) for m in merges_batch]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def apply(col: pd.Series) -> pd.Series:
        def m(syms):
            for a, b in ms:
                ab = a + b
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms
        return col.map(m)

    return apply


def learn_bpe(tokens: DataFrame, n_merges: int = 16, min_freq: int = 2,
              flush_every: int = 8) -> list:
    """Learn ``n_merges`` merge rules from a (doc_id, token) DataFrame.
    Returns [(left, right), ...] in learned order.

    Exact greedy BPE (each argmax sees counts AFTER all prior merges),
    but the vocabulary rewrite is AMORTIZED (round-3 verdict #4): merges
    since the last materialization ride as a PENDING list applied inside
    the pair-count pass itself, and the cached vocab is rewritten only
    every ``flush_every`` merges. Per merge that is ONE action (the
    argmax) instead of argmax + materialize-count, and n/flush_every
    cache rewrites instead of n — the shape a 10k-merge production run
    needs, with per-pass UDF work bounded by ``flush_every`` pending
    merges."""
    wf = word_freqs(tokens)
    base = wf.select(
        "word", "freq",
        F.concat(F.split("word", ""), F.array(F.lit(END))).alias("syms"),
    ).cache()  # materialized lazily by the first argmax action

    merges: list = []
    pending: list = []
    try:
        for it in range(n_merges):
            cur = base if not pending else base.withColumn(
                "syms", _apply_merges_udf(pending)(F.col("syms")))
            pairs = cur.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.col("syms"),
                        F.slice("syms", 2, F.size("syms")),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            ).filter(F.col("p.b").isNotNull())
            top = (
                pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_freq:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            pending.append((a, b))
            if len(pending) >= flush_every:
                nxt = base.withColumn(
                    "syms", _apply_merges_udf(pending)(F.col("syms"))).cache()
                nxt.count()   # materialize BEFORE dropping the parent cache
                base.unpersist()
                base = nxt
                pending = []
    finally:
        base.unpersist()
    return merges


def encode_bpe(tokens: DataFrame, merges: Iterable) -> DataFrame:
    """Apply learned merges to (doc_id, token): lowest-rank-first, the
    standard BPE encode. Vectorized (Arrow batches), merge ranks are a
    broadcast-sized closure. Returns (doc_id, token, n_pieces, pieces)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(col: pd.Series) -> pd.Series:
        def e(word):
            syms = list(word) + [END]
            while len(syms) > 1:
                best, bi = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
            return syms
        return col.map(e)

    return tokens.select(
        "doc_id", "token", enc(F.col("token")).alias("pieces")
    ).withColumn("n_pieces", F.size("pieces"))
