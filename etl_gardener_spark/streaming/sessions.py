"""Custom stateful streaming operator: inactivity-gap sessionization with
``applyInPandasWithState``.

The batch twin is ``plans/queries.sessionize`` (lag + running-sum windows).
In streaming, session assembly needs *custom state* — a per-user open
session that survives across micro-batches and closes either on a 30-minute
inactivity gap inside the data or on an event-time timeout — which is
exactly the shape Spark's ``applyInPandasWithState`` exists for: grouped
state keyed by user, Arrow-batched UDF, watermark-driven timeouts.

Scale notes: state is O(active users), not O(events) — each user's state is
three scalars (start, last-seen, count). The grouping shuffle is the same
user_id exchange the batch twin pays; timeouts bound state growth so a
100 TB/day stream holds only the working set. Emission is append-mode
(closed sessions only), so downstream sinks get immutable rows —
the same write discipline as the warehouse's partition-grain appends.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SEC = 1800  # 30-minute inactivity gap, matching the batch sessionize

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"  # epoch microseconds (exact)


def _close_sessions(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open-session
    state; emit every session closed by a gap, keep the last one open."""
    (user_id,) = key
    gap_us = GAP_SEC * 1_000_000
    if state.hasTimedOut:
        # Watermark passed the open session's horizon: close and emit it.
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )
        return

    # pandas ns -> integer epoch microseconds (exact; float seconds would
    # round and break equality with the batch twin's min/max timestamps)
    ts = (
        pd.concat([pdf["ts"] for pdf in pdfs])
        .sort_values()
        .astype("int64")
        .to_numpy()
        // 1000
    )
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = int(ts[0]), int(ts[0]), 0

    closed: list[tuple[int, int, int]] = []
    for t in ts:
        t = int(t)
        if t - last > gap_us:
            closed.append((start, last, n))
            start, n = t, 0
        last = t
        n += 1
    state.update((start, last, n))
    # Event-time timeout: once the watermark passes last + gap, the open
    # session can never be extended — close it via the timeout branch.
    state.setTimeoutTimestamp((last + gap_us) // 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming sessionization: events (user_id, ts, ...) -> closed
    sessions (user_id, session_start, session_end, n_events).

    ``events`` must be a streaming DataFrame with an event-time ``ts``.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _close_sessions,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
