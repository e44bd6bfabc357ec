"""Composed streaming ingest (streaming/ingest_stream.py): quality gate ->
watermarked exact dedup -> fused extraction as ONE StreamingQuery. Checks:
garbage documents never reach extraction, a re-sent content is suppressed
within the watermark (in-batch, cross-file, cross-drain), surviving docs
emit exactly the batch kernel's triples, and a re-drain appends nothing."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline
from obiemachinelearningframework_spark.streaming.ingest_stream import stream_ingest

T0 = datetime.datetime(2026, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def fitted(spark):
    c = generate_corpus("soccer", n_docs=40, seed=9)
    pipe = OBIEPipeline(spark, c["ontology"], fuzzy_linking=False)
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    pipe.fit(inst, spark.createDataFrame(c["gold_triples"]))
    return {"c": c, "pipe": pipe, "inst": inst}


def _with_ts(pdf, ts):
    pdf = pdf.copy()
    pdf["ingest_ts"] = ts
    return pdf


def test_ingest_gates_dedups_extracts(fitted, spark, tmp_path):
    c, pipe = fitted["c"], fitted["pipe"]
    src = c["source"]
    half = len(src) // 2
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))

    # a doc known to emit triples in the batch plan
    batch = pipe.predict_fused(fitted["inst"]).cache()
    rich_key = batch.groupBy("doc_key").count().orderBy(F.desc("count")).first().doc_key
    rich_row = fitted["inst"].filter(F.col("doc_key") == rich_key).toPandas().iloc[0]

    dup1 = {**{k: rich_row[k] for k in src.columns}, "path": "dup/one.py"}
    garbage = [
        {"repo": "g", "path": "short.py", "commit": "c" * 40, "lang": "py",
         "content": "x"},                                   # length gate
        {"repo": "g", "path": "spam.py", "commit": "c" * 40, "lang": "py",
         "content": "spam " * 50},                          # repetition gate
    ]
    batch1 = pd.concat([src.iloc[:half], pd.DataFrame([dup1, *garbage])],
                       ignore_index=True)
    spark.createDataFrame(_with_ts(batch1, T0)).coalesce(1).write.mode(
        "append").parquet(in_dir)
    stream_ingest(spark, c["ontology"], pipe.weights, pipe.thresholds,
                  in_dir, out_dir, ck)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() > 0
    # the duplicate content (different path -> different doc_key) was
    # dropped BEFORE extraction; the original emitted its triples
    assert got1.filter(F.col("doc_key").contains("dup/one.py")).count() == 0
    assert got1.filter(F.col("doc_key") == rich_key).count() > 0
    assert got1.filter(F.col("doc_key").contains("short.py")).count() == 0
    assert got1.filter(F.col("doc_key").contains("spam.py")).count() == 0

    # second drain: new files only; a cross-drain re-send of the same
    # content inside the watermark is still suppressed
    dup2 = {**dup1, "path": "dup/two.py"}
    batch2 = pd.concat([src.iloc[half:], pd.DataFrame([dup2])],
                       ignore_index=True)
    spark.createDataFrame(
        _with_ts(batch2, T0 + datetime.timedelta(minutes=30))
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream_ingest(spark, c["ontology"], pipe.weights, pipe.thresholds,
                  in_dir, out_dir, ck)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() > got1.count()
    assert got2.filter(F.col("doc_key").contains("dup/")).count() == 0

    # exactly-once: a re-drain with no new files appends nothing
    stream_ingest(spark, c["ontology"], pipe.weights, pipe.thresholds,
                  in_dir, out_dir, ck)
    assert spark.read.parquet(out_dir).count() == got2.count()

    # surviving documents carry exactly the batch kernel's triples
    keys = ["doc_key", "subj", "pred", "obj"]
    stream_side = got2.select(*keys)
    batch_side = batch.join(
        got2.select("doc_key").distinct(), "doc_key", "left_semi"
    ).select(*keys)
    diff = (stream_side.exceptAll(batch_side).count()
            + batch_side.exceptAll(stream_side).count())
    assert diff == 0, f"stream/batch triple mismatch on surviving docs: {diff}"
    batch.unpersist()
