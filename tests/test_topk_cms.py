"""Count-min-sketch semantics pinned against a pure-Python sketch with
the identical md5 hash recipe, plus the CMS one-sided-error invariant.
"""

import hashlib
from collections import Counter

import pandas as pd

from obiemachinelearningframework_spark.queries import (
    CMS_D,
    CMS_TOPK,
    CMS_W,
    q_topk_cms,
)

SF_DIR = "/root/testdata/sf0.001"


def _bucket(r: int, token: str) -> int:
    # all CMS_D row-hashes come from slices of ONE md5 digest
    h = hashlib.md5(token.encode()).hexdigest()[8 * r : 8 * r + 8]
    return int(h, 16) % CMS_W


def test_cms_matches_pure_python(spark):
    got = {r.token: r for r in q_topk_cms(spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    counts = Counter(
        t for text in docs.text for t in text.split(" ") if t
    )
    sketch = [Counter() for _ in range(CMS_D)]
    for token, n in counts.items():
        for r in range(CMS_D):
            sketch[r][_bucket(r, token)] += n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPK]
    assert set(got) == {t for t, _ in top}
    for token, n_exact in top:
        est = min(sketch[r][_bucket(r, token)] for r in range(CMS_D))
        row = got[token]
        assert (row.n_exact, row.n_est, row.overcount) == (
            n_exact, est, est - n_exact,
        )
        assert row.n_est >= row.n_exact  # CMS never undercounts
