"""Distributed as-of join: for each left row, the single most recent right
row with the same key and right.ts <= left.ts.

Spark's built-ins have no ASOF join (DuckDB / kdb / Flink do); the naive
range-join (left.ts >= right.ts) explodes to O(|left| * |right|) per key
before taking max. This is the canonical shuffle-once formulation instead:

  tag both sides -> union -> ONE exchange on the key -> one
  within-partition sort -> last(carry, ignorenulls) over a running window

Right rows sort BEFORE left rows at equal timestamps, giving inclusive
``ts >= ts'`` semantics (DuckDB ASOF LEFT JOIN compatible). The carried
right columns travel in ONE struct, so every output column comes from the
same matched right row by construction. Cost at any scale: one shuffle +
one sort of |left| + |right| rows; per-row window state is a single
struct. A pathologically hot key is bounded by its partition's sort — the
standard mitigation (time-range salting with boundary replication) layers
on top without changing this operator's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_IS_Q = "__asof_is_q"
_CARRY = "__asof_carry"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    carry_cols: list[str],
    order_extra: str | None = None,
) -> DataFrame:
    """Return ``left`` columns plus ``carry_cols`` taken from the latest
    same-``key`` right row with ``right.ts <= left.ts`` (null when none).

    ``order_extra`` (a column present on both sides, e.g. an event id)
    makes the sort total when timestamps can collide; among equal-``ts``
    right rows the one ordered last wins, deterministically.
    """
    carry = F.struct(*[F.col(c) for c in carry_cols]).alias(_CARRY)
    rdf = right.select(F.col(key), F.col(ts), F.lit(0).alias(_IS_Q), carry,
                       *([F.col(order_extra)] if order_extra else []))
    carry_type = rdf.schema[_CARRY].dataType
    ldf = left.select(*left.columns, F.lit(1).alias(_IS_Q),
                      F.lit(None).cast(carry_type).alias(_CARRY))
    order = [ts, _IS_Q] + ([order_extra] if order_extra else [])
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        ldf.unionByName(rdf, allowMissingColumns=True)
        .withColumn(_CARRY, F.last(_CARRY, ignorenulls=True).over(w))
        .filter(F.col(_IS_Q) == 1)
    )
    return matched.select(
        *left.columns,
        *[F.col(f"{_CARRY}.{c}").alias(c) for c in carry_cols],
    )
