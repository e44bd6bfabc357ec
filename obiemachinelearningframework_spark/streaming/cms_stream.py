"""Streaming count-min sketch — continuous token-frequency estimation.

The batch operator (queries.q_topk_cms) sketches a corpus at rest; at
ingestion time the question is "how often has token X occurred SO FAR",
and the CMS answers it continuously because the sketch is MERGEABLE:
counters add, so

    sketch(all data) == sketch(batch 1) + sketch(batch 2) + ...

exactly (not approximately — merging loses nothing; the estimate error
comes only from bucket collisions, which are identical either way since
both sides use queries.cms_bucket_array). Each micro-batch folds its
{CMS_D}x{CMS_W}-integer batch sketch into a persistent running sketch in
``foreachBatch`` (the merge must read current state, which a plain
streaming sink cannot), committed with the same A/B write-then-flip
discipline as kg_stream — a crash mid-batch leaves the previous sketch
intact and the restarted drain re-applies the batch from the streaming
checkpoint.

Mergeability is THE scale property here: on a real cluster every
executor builds a partial sketch map-side and the exchange carries only
D*W counters per task — the same reason the batch plan's aggregate is
cheap makes the streaming state O(1) in stream length.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..queries import cms_bucket_array
from .dedup_stream import DOC_SCHEMA

SKETCH_SCHEMA = T.StructType([
    T.StructField("r", T.IntegerType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("cnt", T.LongType()),
])


def batch_sketch(docs: DataFrame) -> DataFrame:
    """(r, bucket, cnt) counters for one batch of documents — one token
    scan, one fixed-size aggregate."""
    return (
        docs.select(
            F.posexplode(F.split("text", " ")).alias("pos", "token")
        )
        .filter(F.col("token") != "")
        .select(
            F.posexplode(cms_bucket_array(F.md5("token"))).alias(
                "r", "bucket"
            )
        )
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def read_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current committed running sketch (empty if none committed yet)."""
    ptr = os.path.join(state_dir, "CURRENT")
    if not os.path.exists(ptr):
        return spark.createDataFrame([], SKETCH_SCHEMA)
    with open(ptr) as f:
        side = f.read().strip()
    return spark.read.parquet(os.path.join(state_dir, side))


def estimate(sketch: DataFrame, tokens: list[str]) -> dict[str, int]:
    """Point estimates for ``tokens`` from a (r, bucket, cnt) sketch:
    min over hash rows; 0 for a token whose buckets were never hit."""
    spark = sketch.sparkSession
    cand = (
        spark.createDataFrame([(t,) for t in tokens], ["token"])
        .select(
            "token",
            F.posexplode(cms_bucket_array(F.md5("token"))).alias(
                "r", "bucket"
            ),
        )
    )
    rows = (
        cand.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("n_est"))
        .collect()
    )
    return {r.token: r.n_est for r in rows}


def _merge_batch(spark: SparkSession, docs: DataFrame, state_dir: str) -> None:
    merged = (
        read_sketch(spark, state_dir)
        .unionByName(batch_sketch(docs))
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    ptr = os.path.join(state_dir, "CURRENT")
    cur = open(ptr).read().strip() if os.path.exists(ptr) else "b"
    nxt = "a" if cur == "b" else "b"
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, nxt))
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(nxt)
    os.replace(tmp, ptr)  # atomic flip = the commit


def stream_cms(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Document files landing in ``input_dir`` -> continuously merged
    running CMS under ``state_dir``. Returns the StreamingQuery (drained
    when ``available_now``)."""
    os.makedirs(state_dir, exist_ok=True)
    src = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    writer = (
        src.writeStream
        .foreachBatch(lambda batch, _bid: _merge_batch(spark, batch, state_dir))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
