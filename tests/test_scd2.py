"""operators/scd2.py — run-length SCD2 encoding and the incremental
batch-apply path. The load-bearing property: applying batches one day at
a time equals encoding the full history at once, for every shape of
change (continuation, flip, flip-back, new key, NULL attributes)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etl_gardener_spark.operators.scd2 import scd2_apply_batch, scd2_encode

COLS = ["user_id", "ts", "event_id", "k"]


def _obs(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), e, k) for (u, d, h, e, k) in rows],
        COLS,
    )


def _canon(df):
    rows = [
        (r.user_id, r.attr_value, r.valid_from, r.valid_to, r.is_current, r.n_obs)
        for r in df.collect()
    ]
    return sorted(rows, key=repr)


ROWS = [
    # user 1: k runs 5,5 | 7 | 5  (flip and flip-back)
    (1, 1, 1, 10, 5),
    (1, 1, 2, 11, 5),
    (1, 2, 3, 12, 7),
    (1, 3, 1, 13, 5),
    # user 2: constant attribute across all days
    (2, 1, 4, 20, 9),
    (2, 2, 5, 21, 9),
    (2, 3, 6, 22, 9),
    # user 3: appears only on day 3 (new key mid-history)
    (3, 3, 2, 30, 1),
    # user 4: NULL attribute then value (null-safe transition)
    (4, 1, 8, 40, None),
    (4, 2, 9, 41, 2),
]


def test_encode_periods_shape(spark):
    out = scd2_encode(_obs(spark, ROWS), "user_id", "k", "ts", "event_id")
    rows = {
        (r.user_id, r.attr_value, r.is_current): (r.n_obs, r.valid_to)
        for r in out.collect()
    }
    # user 1: three periods, open one is the flip-back to 5
    assert rows[(1, 5, False)][0] == 2
    assert rows[(1, 7, False)][0] == 1
    assert rows[(1, 5, True)] == (1, None)
    # user 2: one open period covering all three observations
    assert rows[(2, 9, True)][0] == 3
    # user 4: NULL attribute forms its own closed period
    assert rows[(4, None, False)][0] == 1 and rows[(4, 2, True)][0] == 1
    # exactly one open period per user
    opens = [r for r in out.collect() if r.is_current]
    assert sorted(r.user_id for r in opens) == [1, 2, 3, 4]


def test_apply_batches_equals_full_encode(spark):
    full = scd2_encode(_obs(spark, ROWS), "user_id", "k", "ts", "event_id")
    by_day = {d: [r for r in ROWS if r[1] == d] for d in (1, 2, 3)}
    periods = scd2_encode(
        _obs(spark, by_day[1]), "user_id", "k", "ts", "event_id"
    )
    for d in (2, 3):
        periods = scd2_apply_batch(
            periods, _obs(spark, by_day[d]), "user_id", "k", "ts", "event_id"
        )
    assert _canon(periods) == _canon(full)


def test_apply_batch_touches_only_batch_keys(spark):
    """Untouched keys' periods pass through an anti join — byte-identical
    rows, no re-encoding."""
    periods = scd2_encode(_obs(spark, ROWS), "user_id", "k", "ts", "event_id")
    batch = _obs(spark, [(1, 4, 1, 50, 7)])  # only user 1
    out = scd2_apply_batch(periods, batch, "user_id", "k", "ts", "event_id")
    before = [t for t in _canon(periods) if t[0] != 1]
    after = [t for t in _canon(out) if t[0] != 1]
    assert before == after
    # user 1's open period closed at the new observation; new open period k=7
    u1 = {(r.attr_value, r.is_current): r for r in out.filter(F.col("user_id") == 1).collect()}
    assert u1[(7, True)].n_obs == 1
    assert u1[(5, False)].valid_to == u1[(7, True)].valid_from


def test_apply_batch_null_key_stays_one_open_period(spark):
    """A NULL key is A KEY to the window encoder; the incremental apply's
    joins must treat it the same (eqNullSafe) — a plain equi-join would
    keep the old NULL-key open period AND re-encode the batch's NULL
    rows separately, yielding two concurrent open periods and breaking
    apply ≡ full-encode (differential-fuzz finding)."""
    schema = "user_id long, ts timestamp, event_id long, k long"

    def obs(rows):
        return spark.createDataFrame(
            [(u, datetime(2024, 1, d, h), e, k) for (u, d, h, e, k) in rows],
            schema,
        )

    null_rows = [(None, 1, 1, 90, 5), (None, 2, 2, 91, 5), (None, 3, 3, 92, 8)]
    full = scd2_encode(obs(null_rows), "user_id", "k", "ts", "event_id")
    periods = scd2_encode(obs(null_rows[:2]), "user_id", "k", "ts", "event_id")
    out = scd2_apply_batch(
        periods, obs(null_rows[2:]), "user_id", "k", "ts", "event_id"
    )
    assert _canon(out) == _canon(full)
    opens = [r for r in out.collect() if r.is_current]
    assert len(opens) == 1 and opens[0].attr_value == 8


def test_apply_batch_continuation_merges_counts(spark):
    """A batch continuing the open attribute extends the period: same
    valid_from, summed n_obs, still current."""
    periods = scd2_encode(
        _obs(spark, [(2, 1, 4, 20, 9), (2, 2, 5, 21, 9)]),
        "user_id", "k", "ts", "event_id",
    )
    out = scd2_apply_batch(
        periods, _obs(spark, [(2, 3, 6, 22, 9)]), "user_id", "k", "ts", "event_id"
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.attr_value, r.n_obs, r.is_current) == (9, 3, True)
    assert r.valid_from == datetime(2024, 1, 1, 4)


from hypothesis import given, settings, strategies as st

obs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key
        st.integers(min_value=1, max_value=60),   # ts offset minutes
        st.one_of(st.none(), st.integers(min_value=0, max_value=2)),  # attr
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=12, deadline=None)
@given(obs=obs_strategy, cut1=st.integers(0, 60), cut2=st.integers(0, 60))
def test_property_batch_apply_equals_full_encode(spark, obs, cut1, cut2):
    """For ANY observation stream and ANY time-ordered 3-way batch split,
    applying batches incrementally equals encoding the whole history —
    the invariant that makes the nightly SCD2 upsert restart-safe.
    Ties in (key, ts) get unique tie-break ids, matching the day
    pipeline's unique event ids."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("k", T.LongType()),
        ]
    )
    lo, hi = sorted((cut1, cut2))
    rows = []
    for i, (k, t, a) in enumerate(obs):
        rows.append((k, datetime(2024, 1, 1, t // 60, t % 60), i, a))
    full = scd2_encode(
        spark.createDataFrame(rows, schema), "user_id", "k", "ts", "event_id"
    )
    batches = [
        [r for r in rows if r[1].minute + 60 * r[1].hour <= lo],
        [r for r in rows if lo < r[1].minute + 60 * r[1].hour <= hi],
        [r for r in rows if r[1].minute + 60 * r[1].hour > hi],
    ]
    batches = [b for b in batches if b]
    periods = scd2_encode(
        spark.createDataFrame(batches[0], schema), "user_id", "k", "ts", "event_id"
    )
    for b in batches[1:]:
        periods = scd2_apply_batch(
            periods,
            spark.createDataFrame(b, schema),
            "user_id", "k", "ts", "event_id",
        )
    assert _canon(periods) == _canon(full)
