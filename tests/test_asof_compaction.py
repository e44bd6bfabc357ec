"""Semantics of the as-of join operator and the compaction planner,
pinned against constructed frames and pure-Python recomputation (the
DuckDB oracle checks engine parity; these check the *math* and the
operator contract: inclusive ts>=ts' semantics, null on no-match,
latest-wins, struct-consistent carry)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from obiemachinelearningframework_spark.operators.asof import asof_join
from obiemachinelearningframework_spark.queries import (
    COMPACT_TARGET_BYTES,
    q_compaction_plan,
    q_events_asof_join,
)

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_basic_semantics(spark):
    left = _mk(spark, [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")],
               ["k", "t", "tag"])
    right = _mk(spark, [(1, 8, 100), (1, 15, 200), (2, 9, 300)],
                ["k", "t", "v"])
    got = {r.tag: r.v for r in
           asof_join(left, right, key="k", ts="t", carry_cols=["v"]).collect()}
    # t=10 sees right t=8; t=20 sees right t=15; t=5 precedes all -> null
    assert got == {"a": 100, "b": 200, "c": None}


def test_asof_equal_ts_is_inclusive_and_latest_wins(spark):
    left = _mk(spark, [(1, 10, "x")], ["k", "t", "tag"])
    right = _mk(spark, [(1, 10, 1, 111), (1, 10, 2, 222), (1, 9, 3, 333)],
                ["k", "t", "rid", "v"])
    rows = asof_join(left, right, key="k", ts="t",
                     carry_cols=["rid", "v"], order_extra="rid").collect()
    # ts==ts' is admitted (DuckDB ASOF semantics); among equal-ts rights
    # the greatest order_extra wins, and BOTH carried columns come from
    # that same row (struct carry)
    assert rows[0].rid == 2 and rows[0].v == 222


def test_asof_left_columns_preserved(spark):
    left = _mk(spark, [(1, 10, "payload")], ["k", "t", "extra"])
    right = _mk(spark, [(1, 1, 7)], ["k", "t", "v"])
    out = asof_join(left, right, key="k", ts="t", carry_cols=["v"])
    assert out.columns == ["k", "t", "extra", "v"]
    assert out.collect()[0].extra == "payload"


def test_events_asof_matches_python(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    got = {r.event_id: r for r in q_events_asof_join(spark, SF_DIR).collect()}
    purchases = ev[ev.event_type == "purchase"]
    errors = ev[ev.event_type == "error"]
    assert len(got) == len(purchases)
    nulls = matched = 0
    for _, p in purchases.iterrows():
        prior = errors[(errors.user_id == p.user_id) & (errors.ts <= p.ts)]
        r = got[p.event_id]
        if prior.empty:
            assert r.err_event_id is None and r.err_lag_us is None
            nulls += 1
        else:
            best = prior.sort_values(["ts", "event_id"]).iloc[-1]
            assert r.err_event_id == best.event_id
            assert r.err_lag_us == (p.ts - best.ts) // pd.Timedelta(microseconds=1)
            matched += 1
    assert matched > 0  # the fixture genuinely exercises the match path
    # (no-prior-error purchases may or may not exist at this SF; the
    # constructed-frame tests above pin the null path regardless)


def test_compaction_plan_matches_python(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    got = {(r.part, r.bin_id): r for r in q_compaction_plan(spark, SF_DIR).collect()}
    expect = {}
    for lang, grp in docs.sort_values("doc_id").groupby("lang"):
        cum = 0
        for _, f in grp.iterrows():
            key = (lang, cum // COMPACT_TARGET_BYTES)
            n, b = expect.get(key, (0, 0))
            expect[key] = (n + 1, b + f.n_chars)
            cum += f.n_chars
    assert set(got) == set(expect)
    for key, (n, b) in expect.items():
        assert (got[key].n_files, got[key].bin_bytes) == (n, b)
    # every non-final bin is filled to at least the target (sequential
    # fill never leaves a bin short unless the partition ran out of files)
    for (lang, bin_id), (n, b) in expect.items():
        if (lang, bin_id + 1) in expect:
            assert b + COMPACT_TARGET_BYTES > COMPACT_TARGET_BYTES  # bins are non-empty
            assert b >= COMPACT_TARGET_BYTES - max(
                docs[docs.lang == lang].n_chars.max(), 0
            )
