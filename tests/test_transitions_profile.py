"""Semantics of the event transition matrix, the Q4-shaped semi-join
count, and the single-pass table profiler, pinned against pure-pandas
recomputation."""

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import (
    q_events_transitions,
    q_priority_semi_counts,
    q_profile_lineitem,
)

SF_DIR = "/root/testdata/sf0.001"


def _r6(x):
    # Spark round() is HALF_UP; Python round() is half-even
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def test_transition_matrix(spark):
    rows = q_events_transitions(spark, SF_DIR).collect()
    got = {(r.event_type, r.next_type): (r.n, r.p) for r in rows}
    e = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    exp = {}
    for _, grp in e.groupby("user_id"):
        types = grp.event_type.tolist()
        for a, b in zip(types, types[1:]):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    totals = {}
    for (a, _), n in exp.items():
        totals[a] = totals.get(a, 0) + n
    assert {k: v[0] for k, v in got.items()} == exp
    for k, (n, p) in got.items():
        assert p == _r6(n / totals[k[0]])
    # rows out of each source state sum to ~1
    for a in totals:
        assert sum(p for (s, _), (_, p) in got.items() if s == a) == pytest.approx(1, abs=1e-4)


def test_priority_semi_counts(spark):
    got = {r.o_orderpriority: r.n_orders
           for r in q_priority_semi_counts(spark, SF_DIR).collect()}
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    hit = j[j.l_shipdate > j.o_orderdate].o_orderkey.unique()
    exp = o[o.o_orderkey.isin(hit)].o_orderpriority.value_counts().to_dict()
    assert got == exp
    # the semi-join is selective: some orders have no late lineitem
    assert sum(got.values()) < len(o)


def test_profile_lineitem(spark):
    row = q_profile_lineitem(spark, SF_DIR).collect()[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    assert row.n_rows == len(li)
    assert row.qty_nulls == int(li.l_quantity.isna().sum())
    assert row.qty_distinct == li.l_quantity.nunique()
    assert row.qty_min == li.l_quantity.min()
    assert row.qty_max == li.l_quantity.max()
    assert row.part_distinct == li.l_partkey.nunique()
    assert row.flag_distinct == li.l_returnflag.nunique()
    assert row.flag_min == li.l_returnflag.min()
    assert row.flag_max == li.l_returnflag.max()
    assert row.price_min == round(li.l_extendedprice.min(), 2)
    assert row.price_max == round(li.l_extendedprice.max(), 2)
    assert row.ship_min == str(li.l_shipdate.min())
    assert row.ship_max == str(li.l_shipdate.max())
