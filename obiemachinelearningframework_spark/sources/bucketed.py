"""Bucketed-table sink: shuffle-once, join-forever co-location.

At 100 TB the dominant recurring cost of a triple store is the join of
its big keyed tables (triples x doc stats, triples x entity stats, KG
snapshot x snapshot). Bucketing pays that shuffle ONCE at write time:
both sides are hash-clustered into the same number of buckets on the
join key, so every later equi-join on that key is exchange-free — each
bucket pair joins locally (and sort-free too when ``sortBy`` matches).

This is the Spark-native analog of the reference pipeline's persistent
corpus organisation (the BigramInternalCorpus is rebuilt once and
queried many times; `AbstractOBIERunner.java` keeps the corpus keyed by
instance across the whole train/predict lifecycle).

Spark only reads bucket metadata through the catalog, so the sink
writes an EXTERNAL table: data lives at the caller's path, the catalog
entry is just the bucket spec. ``spark.sql.sources.bucketing.enabled``
is on by default; readers that ignore the catalog still see plain
parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as an external bucketed parquet table.

    ``buckets`` is a layout contract, not a parallelism knob: every
    writer and every co-located join partner must agree on it (at
    production scale, size it so one bucket of the biggest table fits
    an executor core's memory — e.g. 2^10..2^14 buckets for 100 TB).
    """
    writer = df.write.mode("overwrite").option("path", path).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (``spark.table``) —
    reading the parquet path directly would drop the bucket spec and
    reintroduce the exchange."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external data files are left to the
    caller's lifecycle — a checkpoint manifest owns them, not Spark)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
