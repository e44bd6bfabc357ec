"""Stateful / windowed Structured Streaming operators.

Two scale-path patterns the batch engine's operators map onto when the
corpus is a stream (no analog in the batch-only reference — this is the
Spark-first extension for continuous ingestion):

* ``windowed_type_counts`` — watermark + tumbling-window aggregation of
  mention counts by ontology type (the streaming form of
  ``HighFrequencyUtils``'s evidence counts): late events within the
  watermark still land in their window; older ones are dropped
  deterministically.

* ``stateful_sessionize`` — ``applyInPandasWithState`` custom stateful
  operator: per-user session tracking with a gap timeout (the streaming
  form of the ``sessionize_events`` query). State = (session_start,
  last_ts, n_events); a session row is emitted when the gap expires or
  the state times out. This is the harness for any custom stateful
  operator (e.g. incremental per-document annotation state at 10^12-file
  scale).

  Timeouts are EVENT-TIME (watermark-driven), not processing-time: state
  expiry then depends only on the data, so a replay/backfill of the same
  input produces identical sessions (processing-time expiry is
  wall-clock-nondeterministic and, under ``trigger(availableNow=True)``,
  forces the drain to sit out the full wall-clock gap before it can
  terminate — a 30-min session gap meant a 30-min hang per drain).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long, closed boolean"
STATE_SCHEMA = "session_start double, last_ts double, n_events long"


def windowed_type_counts(mention_stream: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming mentions (with event_time column) -> per-window per-type
    counts; watermark bounds state and drops too-late rows."""
    return (
        mention_stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "type_id")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "type_id",
            "n_mentions",
        )
    )


def _sessionize_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator: extends the open session while gaps
    stay under SESSION_GAP_S, emits closed sessions otherwise; a state
    timeout (no events for the gap) closes the session too."""
    (user_id,) = key
    out = []

    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            out.append((user_id, start, last, n, True))
            state.remove()
    else:
        ts = []
        for pdf in pdfs:
            ts.extend(float(t) for t in pdf["ts_s"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        for t in ts:
            if last is not None and t - last > SESSION_GAP_S:
                out.append((user_id, start, last, n, True))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        # event-time expiry: the open session closes when the WATERMARK
        # passes last_ts + gap. Data-driven, so a replay emits identical
        # rows; never blocks an availableNow drain on wall clock.
        # Clamp to just past the current watermark: a late-but-admitted
        # event (within the watermark) can make last+gap fall BEHIND the
        # watermark, which Spark rejects (IllegalArgumentException) and
        # would kill the whole streaming query.
        timeout_ms = int((last + SESSION_GAP_S) * 1000)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
        # emit the open session's current shape (closed=False) so sinks can
        # show live sessions; the closed=True row supersedes it later
        out.append((user_id, start, last, n, False))

    yield pd.DataFrame(
        {
            "user_id": [r[0] for r in out],
            "session_start": [pd.Timestamp(r[1], unit="s") for r in out],
            "session_end": [pd.Timestamp(r[2], unit="s") for r in out],
            "n_events": [r[3] for r in out],
            "closed": [r[4] for r in out],
        }
    )


def stateful_sessionize(event_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """events(user_id, ts timestamp) stream -> session rows via
    applyInPandasWithState (EventTimeTimeout + watermark: deterministic
    state expiry, bounded state, replay-safe)."""
    prepared = event_stream.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("event_time"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).cast("double").alias("ts_s"),
    ).withWatermark("event_time", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
