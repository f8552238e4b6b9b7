"""Streaming sessionization (applyInPandasWithState) vs the batch twin.

Every session the stream closes — whether by an in-data inactivity gap or
by event-time timeout — must match a session the batch sessionize query
computes, identically in (user_id, session_start, session_end, n_events).
The stream may close fewer (the final open session per user stays pending
until the watermark passes it), never different ones."""

from __future__ import annotations

import uuid

from etl_gardener_spark.plans import queries as Q
from etl_gardener_spark.streaming.events import read_events_stream
from etl_gardener_spark.streaming.sessions import sessionize_stream

SF = "/root/testdata/sf0.001"


def test_stream_sessions_match_batch(spark):
    events = read_events_stream(spark, SF)
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table(name).collect()
    }

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in Q.REGISTRY["sessionize"].fn(spark, SF).collect()
    }
    assert streamed, "stream closed no sessions"
    assert streamed <= batch
    # with the single-file source, all gap-closed sessions (those followed
    # by another session of the same user) must have been emitted
    by_user_last = {}
    for u, s, e, n in batch:
        if u not in by_user_last or s > by_user_last[u]:
            by_user_last[u] = s
    gap_closed = {t for t in batch if t[1] != by_user_last[t[0]]}
    assert gap_closed <= streamed
