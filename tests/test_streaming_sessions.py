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


def test_stream_sessionize_null_user_key_emits_null(spark, tmp_path):
    """A NULL user_id is one state group (Spark groups NULL keys); the
    emitted sessions must carry a NULL user_id — the np.full(int64) path
    silently turned the NaN key into INT64_MIN (differential-fuzz
    finding). The batch twin's window partitioner produces the same
    NULL-user sessions."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = {
        "event_id": list(range(6)),
        "ts": [
            t0, t0 + timedelta(minutes=5),          # null-user session 1
            t0 + timedelta(hours=3),                # null-user session 2
            t0 + timedelta(hours=6),                # watermark pusher
            t0 + timedelta(minutes=1), t0 + timedelta(hours=6, minutes=1),
        ],
        "user_id": [None, None, None, 1, 1, 1],
        "event_type": ["click"] * 6,
        "value": [1.0] * 6,
        "props": ["{}"] * 6,
    }
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    )
    pq.write_table(
        pa.Table.from_pydict(rows, schema=schema),
        str(tmp_path / "events.parquet"),
    )
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(read_events_stream(spark, str(tmp_path)))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name).collect()
    null_sessions = [r for r in out if r.user_id is None]
    assert null_sessions, "expected closed sessions for the NULL-user group"
    assert all(
        r.user_id is None and r.n_events > 0 for r in null_sessions
    )
    assert not any(
        r.user_id == -(2**63) for r in out
    ), "NaN key leaked through as INT64_MIN"
