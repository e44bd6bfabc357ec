"""The partitioned triple sink must never touch the corpus again.

Round-2 verdict (What's wrong #1): ``with_partition_salt`` broadcast one
row per document — at 10^12 docs that OOMs every executor. The fix carries
(repo, lang) THROUGH the fused kernel onto every triple, so the write path
is map -> shuffle-on-write with zero joins. These tests pin:

* carry-cols parity: the carried output equals the bare output on
  (doc_key, subj, pred, obj) and the carried (repo, lang) match the
  instance table;
* the salted write plan contains NO BroadcastExchange / join at all;
* the distributed unknown-surface scan COVERS every unknown span the
  extraction kernel enumerates (link-map completeness).
"""

import glob
import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from obiemachinelearningframework_spark.fixtures import generate_corpus
from obiemachinelearningframework_spark.operators.fused import unknown_vocabulary_df
from obiemachinelearningframework_spark.operators.mentions import (
    UNKNOWN_KIND,
    detect_mentions,
)
from obiemachinelearningframework_spark.operators.triples import (
    with_partition_salt,
    write_triples,
)
from obiemachinelearningframework_spark.plans.pipeline import OBIEPipeline


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_carry_cols_and_broadcast_free_sink(spark, tmp_path):
    c = generate_corpus("soccer", n_docs=30, seed=7)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"])).cache()
    pipe.fit(inst, spark.createDataFrame(c["gold_triples"]))

    bare = pipe.predict_fused(inst).collect()
    carried_df = pipe.predict_fused(inst, carry_cols=("repo", "lang"))
    carried = carried_df.collect()

    assert {tuple(r)[:4] for r in carried} == {tuple(r) for r in bare}
    assert len(bare) > 0
    # carried (repo, lang) must match the instance table per doc_key
    keys = {r["doc_key"]: (r["repo"], r["lang"])
            for r in inst.select("doc_key", "repo", "lang").collect()}
    for r in carried:
        assert (r["repo"], r["lang"]) == keys[r["doc_key"]]

    # the salted sink plan: a pure column append + shuffle-on-write — no
    # BroadcastExchange, no join operator of any kind
    salted = with_partition_salt(carried_df).repartition("repo", "lang", "salt")
    plan = _plan(salted)
    assert "BroadcastExchange" not in plan, plan
    assert "Join" not in plan, plan

    out = str(tmp_path / "triples")
    write_triples(carried_df, out)
    assert glob.glob(f"{out}/repo=*/lang=*"), "partitioned layout missing"
    back = spark.read.parquet(out)
    assert {tuple(r) for r in back.select("doc_key", "subj", "pred", "obj").collect()} == {
        tuple(r) for r in bare
    }

    # bare-triples fallback: a plain join with NO broadcast hint — under
    # autoBroadcastJoinThreshold=-1 (i.e. when the optimizer may not choose
    # broadcast on size) the plan must contain no BroadcastExchange; a
    # forced F.broadcast hint would survive the threshold and fail here
    bare_df = pipe.predict_fused(inst)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(with_partition_salt(bare_df, inst))
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unknown_vocabulary_covers_kernel_spans(spark):
    """Link-map completeness: every unknown span the extraction kernel
    enumerates (both gates, post coverage filter) must appear in the
    distributed pre-scan's surface set — otherwise the fused kernel would
    look up surfaces the broadcast map never scored."""
    c = generate_corpus("disease", n_docs=40, seed=42)
    pipe = OBIEPipeline(spark, c["ontology"])
    inst = pipe.prepare(spark.createDataFrame(c["source"]))
    kernel_surfaces = {
        r["text"]
        for r in detect_mentions(inst, c["ontology"], emit_unknown=True)
        .filter(F.col("kind") == UNKNOWN_KIND)
        .select("text").distinct().collect()
    }
    scan = {r["text"] for r in unknown_vocabulary_df(inst, c["ontology"]).collect()}
    assert kernel_surfaces and kernel_surfaces <= scan
