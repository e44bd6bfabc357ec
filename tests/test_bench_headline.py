"""Registry/bench coupling gate: every registry query is either in
bench.py's HEADLINE list or on the explicit exclusion list below.

HEADLINE is a hand-maintained list, so a newly-registered operator can
silently miss the per-round benchmark; this test turns that omission
into a failure. The exclusions are cheap building-block queries whose
cost is already covered by a composite headline query (e.g.
connected_components inside dedup_embedding / split_leakage_safe,
minhash_signature inside dedup_minhash_lsh) or sub-second scans with no
plan of their own worth tracking."""

import re

import __spark_entry__ as entry

# building blocks / trivial scans deliberately kept out of the benchmark
HEADLINE_EXCLUDED = {
    "bpe_merges",            # the learning loop is benched via token_count_bpe
    "candidates_evidence",   # inside the obie_extract pipeline timings
    "connected_components",  # inside dedup_embedding / dedup_cluster_sizes
    "cooccurrence",          # feature-family building block
    "cosine_pairs_exact_slice",  # bounded-slice baseline of cosine_pairs_threshold
    "cosine_pairs_threshold",    # benched via the bucketed ANN family
    "customers_without_orders",  # trivial anti-join demo
    "doc_sha256",            # one-projection scan
    "eval_micro_prf",        # oracle-only evaluator checks
    "eval_per_slot_prf",
    "evidence_frequency",    # feature-family building block
    "greedy_fill_top1",      # subsumed by the beam/filler pipeline timings
    "lang_id",               # inside quality/funnel timings
    "levenshtein_linking",   # subsumed by fuzzy_topk_links
    "minhash_signature",     # inside dedup_minhash_lsh
    "quality_score",         # subsumed by quality_funnel
    "token_stats",           # one-aggregation scan
    "top_customers",         # trivial top-k demo
}


def _headline():
    src = open("bench.py").read()
    m = re.search(r"HEADLINE\s*=\s*\[(.*?)\]", src, re.S)
    return re.findall(r'"([^"]+)"', m.group(1))


def test_every_registry_query_is_benched_or_excluded():
    headline = _headline()
    registry = set(entry.queries())
    missing = registry - set(headline) - HEADLINE_EXCLUDED
    assert not missing, (
        f"registry queries neither benched nor excluded: {sorted(missing)} — "
        "add them to bench.py HEADLINE (or, with a reason, to "
        "HEADLINE_EXCLUDED here)"
    )
    # the lists stay honest in the other directions too
    stale = set(headline) - registry - {"obie_fit", "obie_extract",
                                        "obie_extract_relational"}
    assert not stale, f"HEADLINE entries not in the registry: {sorted(stale)}"
    overlap = set(headline) & HEADLINE_EXCLUDED
    assert not overlap, f"both benched and excluded: {sorted(overlap)}"
    assert HEADLINE_EXCLUDED <= registry


def test_every_query_has_an_oracle():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) == set(q), "every registry query must be DuckDB-paired"


def test_registry_reorder_is_lossless():
    """The cheap-first registry reordering (queries._CHEAP_FIRST) must be
    a pure permutation: same keys, same callables/SQL, every oracle still
    paired, and the first entries genuinely come from the measured cheap
    list so the driver's budget certifies the most queries."""
    from obiemachinelearningframework_spark import queries as Q

    q, o = entry.queries(), entry.oracle_sql()
    assert set(q) == set(o)
    assert len(q) >= 133
    # every measured name still registered, in the measured order prefix
    present = [k for k in Q._CHEAP_FIRST if k in q]
    assert list(q)[: len(present)] == present
