"""Streaming triple extraction (streaming/extract_stream.py): the fused
kernel over a file-source stream must (a) emit exactly the batch
predict_fused triples for the same corpus, and (b) be incremental +
exactly-once — a second drain processes only newly-landed files and a
re-drain with no new files appends nothing."""

import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline
from obiemachinelearningframework_spark.streaming.extract_stream import stream_extract


@pytest.fixture(scope="module")
def fitted(spark):
    c = generate_corpus("soccer", n_docs=40, seed=9)
    pipe = OBIEPipeline(spark, c["ontology"], fuzzy_linking=False)
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    pipe.fit(inst, spark.createDataFrame(c["gold_triples"]))
    return {"c": c, "pipe": pipe, "inst": inst, "spark": spark}


def test_stream_matches_batch_and_is_incremental(fitted, tmp_path):
    spark, pipe, c = fitted["spark"], fitted["pipe"], fitted["c"]
    src_pdf = c["source"]
    half = len(src_pdf) // 2
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # first file lands -> drain
    spark.createDataFrame(src_pdf.iloc[:half]).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_extract(spark, c["ontology"], pipe.weights, pipe.thresholds,
                   in_dir, out_dir, ck)
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    # second file lands -> drain picks up ONLY the new file
    spark.createDataFrame(src_pdf.iloc[half:]).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_extract(spark, c["ontology"], pipe.weights, pipe.thresholds,
                   in_dir, out_dir, ck)
    got = spark.read.parquet(out_dir)
    n_both = got.count()
    assert n_both > n_first

    # exactly-once: a third drain with no new files appends nothing
    stream_extract(spark, c["ontology"], pipe.weights, pipe.thresholds,
                   in_dir, out_dir, ck)
    assert spark.read.parquet(out_dir).count() == n_both

    # parity with the batch fused plan over the same corpus
    batch = pipe.predict_fused(fitted["inst"])
    keys = ["doc_key", "subj", "pred", "obj"]
    diff = got.select(*keys).exceptAll(batch.select(*keys)).count() + batch.select(
        *keys
    ).exceptAll(got.select(*keys)).count()
    assert diff == 0, f"stream/batch triple mismatch: {diff} rows"
