"""Document/state-level template families (DocumentClassification,
EmptyRootClassCardinality)."""

from pyspark.sql import functions as F

from obiemachinelearningframework_spark.operators.doc_features import (
    document_classification_features,
    empty_root_cardinality_features,
)


def test_document_classification_features(spark):
    inst = spark.createDataFrame(
        [("d1", "alpha beta alpha"), ("d2", "gamma")], ["doc_key", "content"]
    )
    cls = spark.createDataFrame([("d1", "Pos"), ("d2", "Neg")], ["doc_key", "class_id"])
    out = document_classification_features(inst, cls).collect()
    d1 = {r.feature: r.value for r in out if r.doc_key == "d1"}
    # distinct tokens only, unit mass over the distinct-token count
    assert set(d1) == {"doccls=Pos_alpha", "doccls=Pos_beta"}
    assert all(abs(v - 0.5) < 1e-12 for v in d1.values())
    d2 = {r.feature for r in out if r.doc_key == "d2"}
    assert d2 == {"doccls=Neg_gamma"}


def test_empty_root_cardinality_features(spark):
    roots = spark.createDataFrame(
        [("d1", "r1", "Player"), ("d1", "r2", "Player"), ("d1", "r3", "Player"),
         ("d2", "r4", "Player")],
        ["doc_key", "root_id", "root_class_id"],
    )
    state = spark.createDataFrame(
        [("d1", "r1", "team", "t1"), ("d2", "r4", "team", "t2")],
        ["doc_key", "root_id", "slot_name", "obj_id"],
    )
    out = {r.doc_key: r for r in empty_root_cardinality_features(roots, state).collect()}
    assert out["d1"].n_empty == 2 and out["d1"].feature == "#OfEmpty_Player > 1"
    assert out["d2"].n_empty == 0 and out["d2"].feature == "#OfEmpty_Player <= 1"
