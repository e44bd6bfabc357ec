"""Semantics of the bucketized range join, Zipf fit, lang-ID confusion
matrix, and CUBE rollup, pinned against pure-Python recomputation."""

import numpy as np
import pandas as pd
import pytest

from obiemachinelearningframework_spark.queries import (
    RANGE_LEN_S,
    q_events_rollup,
    q_lang_id_confusion,
    q_range_join_intervals,
    q_tokens_zipf,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def test_range_join_matches_bruteforce(spark, events_pd):
    got = {r.interval_id: r.n_points
           for r in q_range_join_intervals(spark, SF_DIR).collect()}
    # parquet timestamps load as datetime64[us]; go through Timedelta so
    # the epoch-second derivation is unit-independent
    ev = events_pd.assign(
        sec=(events_pd.ts - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
    )
    errors = ev[ev.event_type == "error"]
    purchases = ev[ev.event_type == "purchase"]
    assert len(got) == len(errors)
    total = 0
    for _, iv in errors.iterrows():
        n = len(purchases[(purchases.user_id == iv.user_id)
                          & (purchases.sec >= iv.sec)
                          & (purchases.sec < iv.sec + RANGE_LEN_S)])
        assert got[iv.event_id] == n
        total += n
    assert total > 0  # the fixture exercises the match path
    assert 0 in got.values()  # and the empty-interval path


def test_zipf_matches_numpy(spark):
    row = q_tokens_zipf(spark, SF_DIR).collect()[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    freq = pd.Series(
        [t for text in docs.text for t in text.split(" ") if t]
    ).value_counts()
    f = np.sort(freq.values)[::-1].astype(float)
    rank = np.arange(1, len(f) + 1, dtype=float)
    slope, intercept = np.polyfit(np.log(rank), np.log(f), 1)
    assert row.n_vocab == len(f)
    assert row.zipf_slope == pytest.approx(slope, abs=2e-4)
    assert row.zipf_intercept == pytest.approx(intercept, abs=2e-4)
    assert -2.5 < row.zipf_slope < -0.1 and 0 < row.zipf_r2 <= 1


def test_zipf_two_level_rank_equals_global_window(spark):
    """The (freq, token-prefix) band decomposition must reproduce the
    global (freq DESC, token ASC) row_number exactly — the scale rewrite
    may not change a single rank."""
    from pyspark.sql import Window as W, functions as F

    from obiemachinelearningframework_spark.queries import _tokens

    freq = _tokens(spark, SF_DIR).groupBy("token").agg(F.count("*").alias("freq"))
    banded = freq.withColumn("pfx", F.substring("token", 1, 1))
    bands = banded.groupBy("freq", "pfx").agg(F.count("*").alias("bn"))
    w_band = W.orderBy(F.desc("freq"), F.asc("pfx")).rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = bands.select(
        "freq", "pfx", F.coalesce(F.sum("bn").over(w_band), F.lit(0)).alias("off")
    )
    w_in = W.partitionBy("freq", "pfx").orderBy("token")
    two_level = {
        r.token: r.rank
        for r in banded.join(F.broadcast(offsets), ["freq", "pfx"])
        .select("token", (F.col("off") + F.row_number().over(w_in)).alias("rank"))
        .collect()
    }
    global_rank = {
        r.token: r.rank
        for r in freq.select(
            "token",
            F.row_number()
            .over(W.orderBy(F.desc("freq"), F.asc("token")))
            .alias("rank"),
        ).collect()
    }
    assert two_level == global_rank


def test_confusion_matrix_accounts_for_every_doc(spark):
    rows = q_lang_id_confusion(spark, SF_DIR).collect()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    per_lang = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + r.n_docs
    assert per_lang == docs.lang.value_counts().to_dict()
    # the heuristic genuinely separates languages: the dominant predicted
    # label for 'en' docs is 'en'
    en = {r.predicted_lang: r.n_docs for r in rows if r.lang == "en"}
    assert max(en, key=en.get) == "en"


def test_rollup_subtotals_consistent(spark, events_pd):
    rows = q_events_rollup(spark, SF_DIR).collect()
    cells = {(r.event_type, r.hh): (r.n_events, r.sum_value_cents) for r in rows}
    n_types = events_pd.event_type.nunique()
    hours = sorted(events_pd.ts.dt.hour.unique())
    # all four grouping levels are present
    grand = cells[(None, None)]
    assert grand[0] == len(events_pd)
    assert grand[1] == int(round((events_pd.value * 100).round().sum()))
    for t, grp in events_pd.groupby("event_type"):
        assert cells[(t, None)][0] == len(grp)
    for h in hours:
        assert cells[(None, h)][0] == (events_pd.ts.dt.hour == h).sum()
    # detail cells sum to the grand total
    detail = [(k, v) for k, v in cells.items()
              if k[0] is not None and k[1] is not None]
    assert sum(v[0] for _, v in detail) == len(events_pd)
    assert len(cells) == (n_types + 1) * (len(hours) + 1)


# ---- bucketization invariant (pure arithmetic, hypothesis) ----
# q_range_join_intervals needs no pair dedup because each (interval,
# point) pair can meet in AT MOST one bucket — the point lands in exactly
# floor(t/B); correctness then reduces to "the interval's bucket range
# covers floor(t/B) iff t might be in range, and the BETWEEN post-filter
# decides exactly". Verified over arbitrary epoch seconds.

from hypothesis import given, strategies as st

from obiemachinelearningframework_spark.queries import RANGE_BUCKET_S


@given(st.integers(min_value=0, max_value=10**10),
       st.integers(min_value=-2 * RANGE_LEN_S, max_value=3 * RANGE_LEN_S))
def test_bucketization_is_exact_and_duplicate_free(s, dt):
    t = s + dt
    B, L = RANGE_BUCKET_S, RANGE_LEN_S
    interval_buckets = range(s // B, (s + L - 1) // B + 1)
    meets = [b for b in interval_buckets if b == t // B]
    assert len(meets) <= 1                       # never a duplicate pair
    in_range = s <= t < s + L
    if in_range:
        assert len(meets) == 1                   # a true hit always meets
