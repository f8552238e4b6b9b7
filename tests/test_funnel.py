"""Property test: funnel_steps' chained earliest-qualifying-event semantics
against a per-row python reference on randomized event logs."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_gardener_spark.plans import queries as Q

STEPS = ["signup", "view", "click", "purchase"]
T0 = datetime(2024, 1, 1)


def _funnel_ref(events):
    """events: list of (user_id, event_type, ts_offset_seconds)."""
    by_user: dict[int, list[tuple[str, int]]] = {}
    for u, et, ts in events:
        by_user.setdefault(u, []).append((et, ts))
    counts = [0, 0, 0, 0]
    for evs in by_user.values():
        prev = None
        for i, step in enumerate(STEPS):
            cand = [
                ts
                for et, ts in evs
                if et == step and (prev is None or ts > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    return counts


def _funnel_spark(spark, events):
    rows = [
        (u, et, T0 + timedelta(seconds=ts)) for u, et, ts in events
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string, ts: timestamp")
    orig = Q.load_table
    try:
        Q.load_table = lambda s, d, t: df  # the query loads only events
        out = Q.REGISTRY["funnel_steps"].fn(spark, "ignored")
        return [
            r["users"]
            for r in sorted(out.collect(), key=lambda r: r["step"])
        ]
    finally:
        Q.load_table = orig


@settings(max_examples=6, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.sampled_from(STEPS + ["error"]),
            st.integers(0, 50),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_funnel_matches_reference(spark, events):
    # distinct ts per (user, type) not required: semantics use strict >
    assert _funnel_spark(spark, events) == _funnel_ref(events)
