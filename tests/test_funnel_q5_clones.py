"""Semantics of the sequential event funnel, cohort retention matrix,
Q5-shaped local-supplier join, and winnowing clone pairs, pinned against
pure-pandas recomputation (independent of both Spark and DuckDB)."""

import hashlib

import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import (
    CLONE_FP_DF_CAP,
    CLONE_MIN_SHARED,
    Q5_CUTOFF,
    Q5_REGION,
    q_clone_pairs_winnow,
    q_events_funnel,
    q_events_retention,
    q_local_supplier_volume,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def test_funnel_is_sequential(spark, events_pd):
    row = q_events_funnel(spark, SF_DIR).collect()[0]
    n_view = n_click = n_purchase = 0
    for _, grp in events_pd.groupby("user_id"):
        views = grp[grp.event_type == "view"]
        if views.empty:
            continue
        n_view += 1
        clicks = grp[(grp.event_type == "click") & (grp.ts > views.ts.min())]
        if clicks.empty:
            continue
        n_click += 1
        buys = grp[(grp.event_type == "purchase") & (grp.ts > clicks.ts.min())]
        if not buys.empty:
            n_purchase += 1
    assert (row.n_view, row.n_click_after_view, row.n_purchase_after_click) \
        == (n_view, n_click, n_purchase)
    # funnel is monotone by construction
    assert row.n_view >= row.n_click_after_view >= row.n_purchase_after_click


def test_retention_matrix(spark, events_pd):
    rows = q_events_retention(spark, SF_DIR).collect()
    got = {(r.cohort_day, r.day_offset): r.n_users for r in rows}
    d = events_pd.assign(d=events_pd.ts.dt.normalize()).drop_duplicates(
        ["user_id", "d"])
    first = d.groupby("user_id").d.min().rename("cohort")
    j = d.join(first, on="user_id")
    exp = {}
    for (cohort, day), grp in j.groupby(["cohort", "d"]):
        key = (str(cohort.date()), (day - cohort).days)
        exp[key] = grp.user_id.nunique()
    assert got == exp
    # day-0 cells account for every user exactly once
    assert sum(v for (c, o), v in got.items() if o == 0) == events_pd.user_id.nunique()


def test_q5_matches_pandas(spark):
    got = {r.n_name: (r.revenue, r.n_lineitems)
           for r in q_local_supplier_volume(spark, SF_DIR).collect()}
    region = pd.read_parquet(f"{SF_DIR}/region.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    rk = region[region.r_name == Q5_REGION].r_regionkey
    n = nation[nation.n_regionkey.isin(rk)]
    j = (li.merge(orders[orders.o_orderdate < pd.Timestamp(Q5_CUTOFF)],
                  left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust[cust.c_nationkey.isin(n.n_nationkey)],
                left_on="o_custkey", right_on="c_custkey")
         .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j.s_nationkey == j.c_nationkey].merge(
        n, left_on="s_nationkey", right_on="n_nationkey")
    exp = {}
    for name, grp in j.groupby("n_name"):
        rev = (grp.l_extendedprice * (1 - grp.l_discount)).sum()
        exp[name] = (round(rev, 2), len(grp))
    assert set(got) == set(exp)
    for name in exp:
        assert got[name][1] == exp[name][1]
        assert got[name][0] == pytest.approx(exp[name][0], abs=0.011)


def test_clone_pairs_match_bruteforce(spark):
    got = {(r.doc_a, r.doc_b): r.n_shared
           for r in q_clone_pairs_winnow(spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    fps = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [t for t in text.split(" ") if t]
        hs = [hashlib.md5(" ".join(toks[i:i + 3]).encode()).hexdigest()[:16]
              for i in range(len(toks) - 2)]
        fset = {min(hs[i:i + 4]) for i in range(len(hs))}
        for f in fset:
            fps.setdefault(f, []).append(doc_id)
    pair_counts = {}
    for f, members in fps.items():
        if len(members) > CLONE_FP_DF_CAP:
            continue  # boilerplate fingerprint, DF-capped on both sides
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    exp = {k: v for k, v in pair_counts.items() if v >= CLONE_MIN_SHARED}
    assert got == exp
    assert len(got) > 0
