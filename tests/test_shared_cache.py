"""Session-scoped intermediate cache (queries._shared_cache): a corpus
rewrite WITHIN one Spark session must be a cache miss (ADVICE r4 — the
memo used to key on (app, sf_dir, key) only, so a pipeline regenerating
a corpus dir silently served stale tokens to every later query)."""

import pandas as pd

from obiemachinelearningframework_spark import queries as Q


def _write_docs(spark, sf_dir, texts):
    rows = [(i, f"r{i}", t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, repo string, text string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")


def test_rewritten_corpus_is_cache_miss(spark, tmp_path):
    sf_dir = str(tmp_path / "corpus")
    _write_docs(spark, sf_dir, ["alpha beta", "gamma"])
    t1 = Q._tokens(spark, sf_dir)
    assert t1.count() == 3

    _write_docs(spark, sf_dir, ["alpha beta gamma delta"])
    t2 = Q._tokens(spark, sf_dir)
    assert t2.count() == 4, "stale cached tokens served after corpus rewrite"


def test_invalidate_clears_by_sf_dir(spark, tmp_path):
    sf_dir = str(tmp_path / "corpus2")
    _write_docs(spark, sf_dir, ["one two three"])
    Q._tokens(spark, sf_dir).count()
    app = spark.sparkContext.applicationId
    assert any(k[0] == app and k[1] == sf_dir for k in Q._SHARED)
    Q.invalidate(sf_dir)
    assert not any(k[1] == sf_dir for k in Q._SHARED)


def test_emb_count_tracks_corpus_rewrite(spark, tmp_path):
    """code-review r5: _ann_bits_for must see the CURRENT corpus size —
    a stale cached count would diverge the index geometry from the
    oracle's count(*)-derived bits."""
    sf_dir = str(tmp_path / "corpus3")
    emb = [(i, [0.1, 0.2]) for i in range(5)]
    spark.createDataFrame(emb, "vec_id long, embedding array<float>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    assert Q._emb_count(spark, sf_dir) == 5
    emb = [(i, [0.1, 0.2]) for i in range(9)]
    spark.createDataFrame(emb, "vec_id long, embedding array<float>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    assert Q._emb_count(spark, sf_dir) == 9, "stale embedding count served"
