"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (SURVEY.md §2.2 streaming row — the
"custom stateful operator" face the batch engine expresses with the
lag+cumsum window in ``relational.q_sessionize_events``).

Semantics are the batch twin's exactly: a session closes when the gap
to the next event is STRICTLY greater than ``gap_sec``; a session is
(user_id, first ts, last ts, n events).

Finalization is WATERMARK-DRIVEN (advisor r5, medium): a session is
emitted only once the event-time watermark strictly passes
``last_ts + gap_sec`` — before that, an on-time event arriving in a
later micro-batch could still merge into it (extend it at the right
edge, or bridge it with a neighbouring session). The round-5 version
emitted a session as soon as a later event closed its gap inside one
batch, which diverged from the batch twin whenever the watermark delay
exceeded the gap (an on-time out-of-order event could arrive for a
session already emitted, and was then wrongly merged backward into the
newer open session). Now state buffers ALL unfinalized sessions per
user and every micro-batch (or event-time timeout) re-runs the
textbook session-window algorithm:

- append each new event as a unit session, sort, and merge neighbours
  whose gap is <= gap_sec (one sweep — order-independent, so
  micro-batch boundaries and intra-batch ordering cannot change the
  result);
- emit exactly the sessions with ``last + gap < watermark`` (no future
  on-time event can reach them: every such event has ts >= watermark);
- keep the rest in state and set the event-time timeout to the
  earliest instant the oldest kept session can become final.

State per user is three parallel long arrays (epoch-µs starts/lasts +
counts), one entry per unfinalized session — bounded by
``watermark_delay / gap`` entries, never O(events). At scale this is
the same single hash exchange on user_id as the batch window, plus the
state store; skew = one hot user's events in one task, identical to
the batch sessionizer's skew shape.

Equivalence with the batch sessionizer over any fully-drained input —
including on-time out-of-order events that cross micro-batch
boundaries — is pinned by tests/test_streaming_and_media.py (the
original in-order drops + checkpoint-restart test, plus the
cross-batch backward-merge scenario the r5 operator got wrong).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# Parallel arrays of UNFINALIZED sessions (start_us, last_us, n) —
# epoch-µs longs rather than timestamps so the state row is
# timezone-proof; arrays rather than one open session because with
# watermark delay > gap several sessions per user can be simultaneously
# un-final (at most ceil(delay/gap) + 1 of them).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts_us", T.ArrayType(T.LongType())),
        T.StructField("lasts_us", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)


def events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-drop source of event rows (parquet files appearing in
    input_dir; Kafka at production scale)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )


def _merge_sessions(
    sessions: list[tuple[int, int, int]], gap_us: int
) -> list[tuple[int, int, int]]:
    """One sorted sweep merging neighbours with gap <= gap_us (strictly
    greater splits, like the batch twin). Pure + order-independent:
    importable without Spark for property tests."""
    merged: list[tuple[int, int, int]] = []
    for s in sorted(sessions):
        if merged and s[0] - merged[-1][1] <= gap_us:
            p = merged[-1]
            merged[-1] = (p[0], max(p[1], s[1]), p[2] + s[2])
        else:
            merged.append(s)
    return merged


def _session_fn(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            starts, lasts, ns = state.get
            sessions = list(zip(starts, lasts, ns))
        else:
            sessions = []

        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts in pdf["ts"]:
                    ts_us = ts.value // 1000  # pandas ns → µs
                    sessions.append((ts_us, ts_us, 1))
            sessions = _merge_sessions(sessions, gap_us)

        # a session is FINAL iff the watermark strictly passed
        # last + gap: every future on-time event has ts >= watermark,
        # and an event at ts can extend/bridge a session iff
        # ts - last <= gap (STRICT close ⇒ equality still merges)
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [s for s in sessions if s[1] + gap_us < wm_us]
        kept = [s for s in sessions if s[1] + gap_us >= wm_us]

        if kept:
            state.update(
                (
                    [s[0] for s in kept],
                    [s[1] for s in kept],
                    [s[2] for s in kept],
                )
            )
            # earliest instant the oldest kept session can become
            # final: watermark must exceed last + gap, so the first
            # whole-ms tick after it (always > current watermark since
            # the session was kept)
            t_ms = min(s[1] for s in kept) // 1000 + gap_sec * 1000 + 1
            state.setTimeoutTimestamp(t_ms)
        else:
            state.remove()

        closed.sort()
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id] * len(closed), dtype="int64"),
                "session_start": pd.to_datetime(
                    [c[0] for c in closed], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [c[1] for c in closed], unit="us"
                ),
                "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
            }
        )

    return fn


def streaming_sessionize(
    events: DataFrame, gap_sec: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Session stream: one output row per FINALIZED session (append
    mode) — finalized means the event-time watermark passed
    last + gap, so the emission is safe at ANY watermark-delay / gap
    ratio (delay > gap just buffers more sessions per user).

    Plan: one hash exchange on user_id into the stateful operator —
    the streaming analogue of the batch window's single shuffle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_sec),
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
