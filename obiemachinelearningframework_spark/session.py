"""SparkSession factory tuned for this engine.

Local-mode settings mirror what the production job sets via
``spark-submit --conf``: AQE on (runtime skew-join + partition
coalescing), Arrow on (every UDF in this package is a pandas UDF),
shuffle partitions sized to the parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "obie_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N-ish shuffle partitions; a real cluster sets this to
        # 2-3x total executor cores (or relies on AQE coalescing).
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # joins co-partitioned on a SUBSET of the join keys (everything in
        # the extraction plan is clustered by doc_key; join keys are
        # doc_key-prefixed) must not re-exchange both sides — this is the
        # bucketed-join co-location contract at cluster scale
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # NOTE: a 48g heap regressed local[32] extraction 4-5x (G1 region
        # management / page churn dominated as system time); 16g keeps GC
        # flat at every parallelism this sandbox runs. On a real cluster
        # this is per-executor memory and sized to partition volume.
        .config("spark.driver.memory", os.environ.get("OBIE_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions", os.environ.get("OBIE_DRIVER_JAVA_OPTS", ""))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
