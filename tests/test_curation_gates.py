"""Code-curation gates (queries.py): bloom-prefiltered decontamination,
license detection priority, vendored/generated filter priority, and
bounded BFS — the semantics the DuckDB oracles can't see (prefilter
selectivity, rule precedence on adversarial content, frontier-BFS vs an
independent pure-Python BFS).
"""

from collections import deque

from pyspark.sql import functions as F

from obiemachinelearningframework_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _mini_docs(spark, rows):
    """documents-shaped frame: (doc_id, text, lang, source, n_chars)."""
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "mini")
    _mini_docs(spark, rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    return d


def test_bloom_prefilter_prunes_without_losing_hits(spark):
    """The bloom gate must admit every true contaminated shingle (no
    false negatives — the decontamination guarantee) while pruning the
    overwhelming majority of clean shingles map-side."""
    sh = Q._shingles(spark, SF)
    total = sh.count()
    admitted = sh.filter(Q.bloom_member(F.col("shingle"))).count()
    # every benchmark shingle passes its own filter (false-negative-free)
    snips = spark.createDataFrame(
        Q._snippet_shingles(), ["snippet_id", "shingle"]
    )
    assert snips.filter(~Q.bloom_member(F.col("shingle"))).count() == 0
    # and the prefilter actually prunes: <2% of corpus shingles admitted
    assert admitted / total < 0.02, (admitted, total)
    # end result identical to the exact (no-bloom) aggregation
    exact = (
        sh.join(F.broadcast(snips), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("snippet_id").alias("n_snippets"),
            F.count("*").alias("n_hits"),
            F.min("pos").alias("first_pos"),
        )
    )
    got = {r.doc_id: (r.n_snippets, r.n_hits, r.first_pos)
           for r in Q.q_decontaminate_bloom(spark, SF).collect()}
    want = {r.doc_id: (r.n_snippets, r.n_hits, r.first_pos)
            for r in exact.collect()}
    assert got == want and len(want) > 0


def test_license_priority_resolves_multimarker_files(spark, tmp_path):
    """A file carrying BOTH a permissive header (synthesized: doc_id%5==1
    -> Apache) and GPL text in its body must classify as gpl-3.0 — the
    copyleft marker has priority 1 and min(struct(prio, ...)) must pick
    it. doc 4 (%5==4) gets no header and clean text -> unlicensed."""
    d = _write_docs(spark, tmp_path, [
        (1, "this file also contains the GNU General Public License text"),
        (4, "plain code with no license header at all"),
    ])
    got = {
        (r.license, r.family): r.n_files
        for r in Q.q_license_detect(spark, d).collect()
    }
    assert got == {("gpl-3.0", "copyleft"): 1, ("unlicensed", "unknown"): 1}


def test_vendored_priority_over_generated_and_minified(spark, tmp_path):
    """doc 44: %7==2 -> vendor/ AND %11==0 -> @generated marker AND a
    >MINIFIED_LINE_CHARS line; 'vendored' must win (rule order). doc 33:
    %7==5 -> test/, %11==0 -> marker -> 'generated'. doc 15: %7==1 ->
    lib/, ext .py, short lines, no marker -> 'keep'."""
    long_text = " ".join(["x" * 9] * Q.LINE_TOKENS)  # one ~80-char line
    d = _write_docs(spark, tmp_path, [
        (44, long_text),
        (33, "short toks only"),
        (15, "short toks only"),
    ])
    got = {r.doc_id: (r.verdict, r.keep)
           for r in Q.q_code_vendored_filter(spark, d).collect()}
    assert got == {
        44: ("vendored", 0),
        33: ("generated", 0),
        15: ("keep", 1),
    }


def test_bfs_matches_pure_python_bfs(spark):
    """Frontier anti-join BFS == an independent queue BFS on the collected
    edge set (the oracle already pins it against the unrolled-CTE form;
    this pins it against a third, non-relational implementation)."""
    triples = Q.q_triples_kg(spark, SF).collect()
    adj = {}
    for r in triples:
        adj.setdefault(r.subj, set()).add(r.obj)
        adj.setdefault(r.obj, set()).add(r.subj)
    dist = {s: 0 for s in Q.BFS_SEEDS}
    queue = deque(Q.BFS_SEEDS)
    while queue:
        n = queue.popleft()
        if dist[n] >= Q.BFS_MAX_HOPS:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                queue.append(m)
    got = {r.node: r.dist for r in Q.q_kg_bfs_hops(spark, SF).collect()}
    assert got == dist and max(dist.values()) == Q.BFS_MAX_HOPS


def test_fork_overlap_detects_planted_fork_and_caps_boilerplate(spark, tmp_path):
    """A planted fork (repo_b = copy of repo_a's doc + one extra doc)
    must surface with containment = shared/min; a paragraph shared by
    MORE than FORK_PARA_DF repos (license boilerplate) must be excluded
    from pair generation entirely."""
    fork_text = " ".join(f"tok{i}" for i in range(Q.PARA_TOKENS * 3))  # 3 paras
    extra = " ".join(f"only{i}" for i in range(Q.PARA_TOKENS * 2))     # 2 paras
    boiler = " ".join(f"lic{i}" for i in range(Q.PARA_TOKENS))         # 1 para
    rows = [
        (0, fork_text, "en", "repoA", len(fork_text)),
        (1, fork_text, "en", "repoB", len(fork_text)),
        (2, extra, "en", "repoB", len(extra)),
    ] + [
        # the same boilerplate paragraph in >FORK_PARA_DF other repos
        (10 + i, boiler, "en", f"boiler{i:02d}", len(boiler))
        for i in range(Q.FORK_PARA_DF + 5)
    ]
    d = str(tmp_path / "forks")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {(r.repo_a, r.repo_b): (r.n_shared, r.containment)
           for r in Q.q_repo_fork_overlap(spark, d).collect()}
    # only the planted fork pair: 3 shared paras, min(|A|,|B|) = 3 -> 1.0
    assert got == {("repoA", "repoB"): (3, 1.0)}


def test_negative_sampling_invariants(spark):
    """Filtered negative sampling: no emitted corruption may be a true
    triple or a no-op, at most NEG_K negatives per positive, and the
    hash-derived choice is deterministic (two runs, identical rows)."""
    pos = {(r.subj, r.pred, r.obj)
           for r in Q.q_triples_kg(spark, SF).collect()}
    rows = Q.q_kg_negative_sampling(spark, SF).collect()
    assert rows
    per_pos = {}
    for r in rows:
        assert (r.subj, r.pred, r.obj) in pos          # derives from a positive
        assert (r.subj, r.pred, r.obj_neg) not in pos  # filtered
        assert r.obj_neg != r.obj                      # not a no-op
        per_pos.setdefault((r.subj, r.pred, r.obj), set()).add(r.k)
    assert all(len(ks) <= Q.NEG_K for ks in per_pos.values())
    again = Q.q_kg_negative_sampling(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
