"""Incremental extraction (kg_incremental_extract): the CDC loop must
equal the full extraction while re-extracting ONLY the changed slice,
and must drop the deleted document's triples."""

from pyspark.sql import functions as F

from obiemachinelearningframework_spark.queries import (
    _docs,
    _inc_extract,
    _inc_prev_docs,
    q_kg_incremental_extract,
    q_triples_kg,
)

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_equals_full(spark):
    inc = {(r.subj, r.pred, r.obj)
           for r in q_kg_incremental_extract(spark, SF_DIR).collect()}
    full = {(r.subj, r.pred, r.obj)
            for r in q_triples_kg(spark, SF_DIR).collect()}
    assert inc == full
    assert not any(s == "doc_-1" for s, _, _ in inc)


def test_changed_slice_is_minimal(spark):
    """The extraction kernel must only see the %5==0 (changed) docs —
    the whole point of CDC at 10^12 files."""
    new = _docs(spark, SF_DIR).select("doc_id", "text")
    prev = _inc_prev_docs(spark, SF_DIR)
    new_sha = new.select("doc_id", F.sha2("text", 256).alias("sha"))
    prev_sha = prev.select("doc_id", F.sha2("text", 256).alias("psha"))
    cdc = new_sha.join(prev_sha, "doc_id", "full")
    changed = cdc.filter(
        F.col("psha").isNull() | (F.col("sha") != F.col("psha"))
    ).filter(F.col("sha").isNotNull())
    n_changed = changed.count()
    n_mod5 = new.filter((F.col("doc_id") % 5) == 0).count()
    n_total = new.count()
    assert n_changed == n_mod5          # exactly the perturbed docs
    assert 0 < n_changed < n_total / 2  # CDC re-extracts a strict minority
    # deleted doc is in neither branch
    unchanged = cdc.filter(F.col("sha") == F.col("psha")).count()
    assert n_changed + unchanged == n_total


def test_prev_extraction_differs_on_changed_docs(spark):
    """Sanity of the synthesis: the perturbation actually changes the
    previous KG (otherwise the carry-forward branch proves nothing)."""
    prev = {(r.subj, r.pred, r.obj)
            for r in _inc_extract(_inc_prev_docs(spark, SF_DIR)).collect()}
    full = {(r.subj, r.pred, r.obj)
            for r in q_triples_kg(spark, SF_DIR).collect()}
    assert prev != full
    assert any(s == "doc_-1" for s, _, _ in prev)
    # some %5==0 doc gained a 'spark' mention in the previous snapshot
    gained = {s for s, p, o in prev - full if o == "spark"}
    assert any(int(s.removeprefix("doc_")) % 5 == 0
               for s in gained if s != "doc_-1")
