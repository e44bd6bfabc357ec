"""Tokenization + sentence splitting as a vectorized pandas UDF.

The reference tokenizes each document once at corpus construction
(``variables/OBIEInstance.java:101-107``, via OBIECore's
RegExTokenizer/SentenceSplitter) and keeps char→token maps. Here the same
product is one ``ArrayType(StructType)`` column computed by an
Arrow-batched UDF; sentence index and char offsets ride along with each
token so downstream locality features are plain column arithmetic.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F, types as T

_TOKEN = re.compile(r"\w+|[^\w\s]")
_SENT_BREAK = re.compile(r"[.!?\n]")

TOKEN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("tok_idx", T.IntegerType()),
            T.StructField("sent_idx", T.IntegerType()),
            T.StructField("on", T.IntegerType()),
            T.StructField("off", T.IntegerType()),
        ]
    )
)


def sentence_bounds(content: str) -> list[tuple[int, int]]:
    """[(start, end)) sentence spans; breaks at ./!/?/newline. Spans that
    contain no word characters (e.g. the '\\n' right after a '.') are merged
    into their successor instead of counting as sentences — sentence
    distance is a locality feature, so '.\\n' must be ONE boundary."""
    bounds, start = [], 0
    for m in _SENT_BREAK.finditer(content):
        end = m.end()
        if end > start and any(c.isalnum() for c in content[start:end]):
            bounds.append((start, end))
        elif bounds and end > start:
            bounds[-1] = (bounds[-1][0], end)
        start = end
    if start < len(content):
        if any(c.isalnum() for c in content[start:]):
            bounds.append((start, len(content)))
        elif bounds:
            bounds[-1] = (bounds[-1][0], len(content))
    return bounds


def sent_index_of(bounds: list[tuple[int, int]], onset: int) -> int:
    """Sentence index containing a char onset (binary search)."""
    lo, hi = 0, len(bounds) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if bounds[mid][1] <= onset:
            lo = mid + 1
        else:
            hi = mid
    return lo


def tokenize_one(content: str) -> list[dict]:
    bounds = sentence_bounds(content)
    toks = []
    for i, m in enumerate(_TOKEN.finditer(content)):
        toks.append(
            {
                "text": m.group(0),
                "tok_idx": i,
                "sent_idx": sent_index_of(bounds, m.start()) if bounds else 0,
                "on": m.start(),
                "off": m.end(),
            }
        )
    return toks


@F.pandas_udf(TOKEN_TYPE)
def tokenize_udf(content: pd.Series) -> pd.Series:
    return content.map(lambda c: tokenize_one(c or ""))


def with_tokens(df, content_col: str = "content", out_col: str = "tokens"):
    return df.withColumn(out_col, tokenize_udf(F.col(content_col)))
