"""Bucketed-table co-location: the write-once shuffle contract.

Asserts the property that matters at 100 TB — an equi-join of two
tables bucketed on the join key runs WITHOUT any Exchange (and without
re-sorting, since sortBy matches), while the identical join on plain
parquet shuffles both sides."""

import pytest

from obiemachinelearningframework_spark.queries import q_kg_triple_support, q_triples_kg
from obiemachinelearningframework_spark.sources.bucketed import (
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def smj_only(spark):
    """Force sort-merge joins so the Exchange assertion tests bucketing,
    not broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_is_exchange_free(spark, tmp_path, smj_only):
    triples = q_triples_kg(spark, SF_DIR)
    support = q_kg_triple_support(spark, SF_DIR).select("subj", "support")

    write_bucketed(triples, "t_triples", str(tmp_path / "t"), "subj", buckets=8)
    write_bucketed(support, "t_support", str(tmp_path / "s"), "subj", buckets=8)
    try:
        a, b = read_bucketed(spark, "t_triples"), read_bucketed(spark, "t_support")
        joined = a.join(b, "subj")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout IS the shuffle
        assert joined.count() == triples.join(support, "subj").count() > 0

        # control: the same join on catalog-free parquet shuffles both sides
        plain_a = spark.read.parquet(str(tmp_path / "t"))
        plain_b = spark.read.parquet(str(tmp_path / "s"))
        plain_plan = (
            plain_a.join(plain_b, "subj")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning(subj" in plain_plan
    finally:
        drop_bucketed(spark, "t_triples")
        drop_bucketed(spark, "t_support")


def test_bucketed_roundtrip_rows(spark, tmp_path):
    support = q_kg_triple_support(spark, SF_DIR)
    write_bucketed(support, "t_rt", str(tmp_path / "rt"), "subj", buckets=4)
    try:
        got = sorted(map(tuple, read_bucketed(spark, "t_rt").collect()))
        want = sorted(map(tuple, support.collect()))
        assert got == want
    finally:
        drop_bucketed(spark, "t_rt")
