"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (SURVEY.md §2.2 streaming row — the
"custom stateful operator" face the batch engine expresses with the
lag+cumsum window in ``relational.q_sessionize_events``).

Semantics are the batch twin's exactly: a session closes when the gap
to the next event is STRICTLY greater than ``gap_sec``; a session is
(user_id, first ts, last ts, n events). The streaming form maintains
one open session per user in state and emits a session when

- a new event for the user arrives more than ``gap_sec`` after the
  open session's last event (gap close — same predicate as batch), or
- the event-time watermark passes ``last_ts + gap_sec`` (timeout
  close: no on-time event can extend the session anymore, so it is
  final — this is what makes the operator *streaming*-correct rather
  than only drain-correct).

State per user is three longs (epoch-µs start/last + count) — O(keys)
bounded by the timeout eviction, never O(events). At scale this is
the same single hash exchange on user_id as the batch window, plus
the state store; skew = one hot user's events in one task, identical
to the batch sessionizer's skew shape.

Equivalence with the batch sessionizer over any fully-drained input
is pinned by tests/test_streaming_and_media.py (stream output ==
batch ``sessionize_events`` rolled up to sessions).
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

# (session_start_us, last_ts_us, n_events) — epoch-µs longs rather
# than timestamps so the state row is timezone-proof and minimal.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
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


def _session_fn(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[int, int, int, int]] = []  # (uid, start, last, n)

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append((user_id, start_us, last_us, n))
            state.remove()
        else:
            chunks = list(pdfs)
            batch = (
                pd.concat(chunks, ignore_index=True)
                if chunks
                else pd.DataFrame(columns=["ts", "event_id"])
            )
            # within a micro-batch events arrive unordered; the batch
            # twin's window orders by (ts, event_id) — match it
            batch = batch.sort_values(["ts", "event_id"])
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = -1
                n = 0
            for ts in batch["ts"]:
                ts_us = ts.value // 1000  # pandas ns → µs
                if start_us < 0:
                    start_us, last_us, n = ts_us, ts_us, 1
                elif ts_us - last_us > gap_us:  # STRICT, like batch
                    closed.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = ts_us, ts_us, 1
                else:
                    # a cross-batch late (but on-time) event may
                    # predate the open session — session-window merge
                    # extends backward
                    start_us = min(start_us, ts_us)
                    last_us = max(last_us, ts_us)
                    n += 1
            if start_us >= 0:
                state.update((start_us, last_us, n))
                # final when the watermark passes last + gap: no
                # on-time event can extend this session anymore
                state.setTimeoutTimestamp(last_us // 1000 + gap_sec * 1000)

        yield pd.DataFrame(
            {
                "user_id": pd.Series([c[0] for c in closed], dtype="int64"),
                "session_start": pd.to_datetime(
                    [c[1] for c in closed], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [c[2] for c in closed], unit="us"
                ),
                "n_events": pd.Series([c[3] for c in closed], dtype="int64"),
            }
        )

    return fn


def streaming_sessionize(
    events: DataFrame, gap_sec: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Session stream: one output row per CLOSED session (append mode).

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
