"""Streaming similarity search: query vectors against a static IVF index.

The batch operator (operators/ivf.ivf_topk) answers top-k for a bounded
query set in one job; at serving time queries arrive continuously and
each micro-batch must probe the SAME at-rest index. The index is built
ONCE (operators/ivf.train_codebook + the r==1 centroid assignment of the
corpus, materialized as inverted lists partitioned by centroid id — in
production the bucketed-table sink, sources/bucketed.py) and every
micro-batch runs the identical probe plan stream-static: the index IS
the state, so no state store grows with the query stream — the exact
shape incremental_dedup_stream.py established for the LSH index.

Scale properties:

* **Assignment is map-only per batch.** The codebook is tiny and
  broadcast; ranking a query's nprobe centroids is a window over at most
  ANN index-K rows PER QUERY (batch-bounded), and the candidate join
  touches only the probed lists — never the corpus.
* **Whole-array cosine, no explode.** Both the centroid ranking and the
  exact re-score use the zip_with/aggregate kernel (_cos_expr), JVM-side.
* **Exactly-once sink.** Per-epoch dynamic partition overwrite
  (batch_id=<epoch>) — a replayed epoch overwrites its own partition,
  the same idempotency recipe as the other foreachBatch sinks here.

Parity: tests/test_ann_stream.py pins the streamed result row-for-row
against the batch ivf_topk answer for the same queries and index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from ..operators.ivf import _cos_expr, train_codebook

__all__ = ["QUERY_SCHEMA", "build_ann_index", "annotate_queries", "stream_ann_topk"]

QUERY_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def build_ann_index(
    emb: DataFrame, index_dir: str, k: int = 16, seed: int = 7
) -> None:
    """Materialize the serving index under ``index_dir``: the KMeans
    codebook (cid, cv) and the corpus inverted lists (cid, nid, nv) —
    each corpus vector filed under its nearest centroid. Write-once; the
    corpus-sized work is ONE assignment map + ONE partitioned write."""
    codebook = train_codebook(emb, k=k, seed=seed)
    codebook.write.mode("overwrite").parquet(os.path.join(index_dir, "codebook"))
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ac = e.crossJoin(F.broadcast(codebook)).select(
        "vec_id", "v", "cid", _cos_expr("v", "cv").alias("cos_c")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc(F.round("cos_c", 6)), F.asc("cid"))
    (
        ac.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("cid", F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(index_dir, "lists"))
    )


def annotate_queries(
    batch: DataFrame,
    codebook: DataFrame,
    lists: DataFrame,
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """One micro-batch of queries (qid, embedding) -> (qid, nid, rank,
    cos): exact-cosine top-k among the candidates filed under each
    query's ``nprobe`` nearest centroids. Identical admission and
    tie-break to operators/ivf.ivf_topk (round-6 cosine DESC, id ASC)."""
    q = batch.select("qid", F.col("embedding").cast("array<double>").alias("qv"))
    ac = q.crossJoin(F.broadcast(codebook)).select(
        "qid", "qv", "cid", _cos_expr("qv", "cv").alias("cos_c")
    )
    w_assign = W.partitionBy("qid").orderBy(F.desc(F.round("cos_c", 6)), F.asc("cid"))
    probes = (
        ac.withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") <= nprobe)
        .select("qid", "qv", "cid")
    )
    cand = probes.join(lists, "cid").filter(F.col("qid") != F.col("nid"))
    scored = cand.select(
        "qid", "nid", _cos_expr("qv", "nv").alias("cos")
    ).dropDuplicates(["qid", "nid"])
    w = W.partitionBy("qid").orderBy(F.desc(F.round("cos", 6)), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", F.round("cos", 4).alias("cos"))
    )


def stream_ann_topk(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    nprobe: int = 2,
    available_now: bool = True,
):
    """Query vectors landing in ``input_dir`` -> their top-k neighbors
    vs the static index in ``output_dir``, partitioned by batch_id with
    dynamic-overwrite idempotency. Returns the StreamingQuery (drained
    when ``available_now``)."""
    codebook = spark.read.parquet(os.path.join(index_dir, "codebook"))
    lists = spark.read.parquet(os.path.join(index_dir, "lists"))

    def _write(batch: DataFrame, epoch_id: int) -> None:
        (
            annotate_queries(batch, codebook, lists, k=k, nprobe=nprobe)
            .withColumn("batch_id", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    src = spark.readStream.schema(QUERY_SCHEMA).parquet(input_dir)
    writer = (
        src.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
