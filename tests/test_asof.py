"""As-of join edge cases: equal-time match, no-match NULLs, multiple right
rows per key, tie-break determinism, payload collision guard."""

from __future__ import annotations

from datetime import datetime

import pytest

from etl_gardener_spark.operators.asof import asof_join


def ts(h, m=0):
    return datetime(2024, 3, 1, h, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "A"), (2, ts(12), "B"), (3, ts(9), "C"), (4, ts(11), "D")],
        ["lid", "lt", "tag"],
    )
    right = spark.createDataFrame(
        [
            ("A", ts(9), 1.0),
            ("A", ts(10), 2.0),   # equal-time: must match lid=1
            ("A", ts(11), 3.0),   # later: never matched by lid=1
            ("B", ts(8), 4.0),
            ("C", ts(9, 30), 5.0),  # after lid=3 -> no match
        ],
        ["key", "rt", "val"],
    )
    return left, right.withColumnRenamed("key", "tag")


def test_asof_semantics(frames):
    left, right = frames
    out = {
        r.lid: (r.rt, r.val)
        for r in asof_join(
            left, right, on="tag", left_time="lt", right_time="rt",
            payload=["rt", "val"],
        ).collect()
    }
    assert out[1] == (ts(10), 2.0)   # equal time matches, latest wins
    assert out[2] == (ts(8), 4.0)
    assert out[3] == (None, None)    # only later right rows -> NULL
    assert out[4] == (None, None)    # key absent from right


def test_asof_null_payload_is_row_atomic(spark):
    """A matched right row whose payload field is NULL must read as NULL
    — never the previous right row's value for that column (the
    per-column last(ignorenulls) bug the struct carry fixes;
    differential-fuzz finding)."""
    left = spark.createDataFrame([(1, ts(12), "A")], ["lid", "lt", "tag"])
    right = spark.createDataFrame(
        [("A", ts(10), 7.0), ("A", ts(11), None)], ["tag", "rt", "val"]
    )
    (row,) = asof_join(
        left, right, on="tag", left_time="lt", right_time="rt",
        payload=["rt", "val"],
    ).collect()
    assert row.rt == ts(11) and row.val is None


def test_asof_null_keys_never_match(spark):
    """SQL equality semantics: a NULL-key left row matches nothing, and
    NULL-key right rows are invisible — the window partitioner must not
    pair them up as a NULL 'group' (differential-fuzz finding)."""
    left = spark.createDataFrame(
        [(1, ts(12), None)], "lid long, lt timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(None, ts(10), 7.0)], "tag string, rt timestamp, val double"
    )
    (row,) = asof_join(
        left, right, on="tag", left_time="lt", right_time="rt",
        payload=["val"],
    ).collect()
    assert row.val is None


def test_asof_payload_collision(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(
            left, right.withColumnRenamed("val", "tag2"),
            on="tag", left_time="lt", right_time="rt", payload=["rt", "tag"],
        )


def test_asof_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, ts(10), "K")], ["lid", "lt", "k"])
    right = spark.createDataFrame(
        [("K", ts(9), 1.0, 1), ("K", ts(9), 2.0, 2)], ["k", "rt", "val", "seq"]
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        payload=["val"], right_order="seq",
    ).collect()
    assert out[0].val == 2.0  # highest seq wins at equal (key, time)


from hypothesis import given, settings, strategies as st


asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key
        st.integers(min_value=0, max_value=100),  # minute offset
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(left_rows=asof_rows, right_rows=asof_rows)
def test_asof_matches_python_reference(spark, left_rows, right_rows):
    """Property: asof_join == the obvious per-row python scan (latest
    right at-or-before, ties by highest seq)."""
    from datetime import timedelta

    base = ts(10)
    left = [
        (i, k, base + timedelta(minutes=m))
        for i, (k, m) in enumerate(left_rows)
    ]
    right = [
        (k, base + timedelta(minutes=m), float(j), j)
        for j, (k, m) in enumerate(right_rows)
    ]
    ldf = spark.createDataFrame(left, ["lid", "k", "lt"])
    rdf = spark.createDataFrame(right, ["k", "rt", "val", "seq"])
    got = {
        r.lid: r.val
        for r in asof_join(
            ldf, rdf, on="k", left_time="lt", right_time="rt",
            payload=["val"], right_order="seq",
        ).collect()
    }
    for lid, k, lt in left:
        cands = [(rt, seq, val) for (rk, rt, val, seq) in right
                 if rk == k and rt <= lt]
        expect = max(cands)[2] if cands else None
        assert got[lid] == expect, (lid, k, lt, cands)


def test_grouped_merge_asof_equivalent(spark):
    """The Pandas-cogroup merge_asof form must agree with the
    union+window form on non-null payloads (the two formulations differ
    only in their treatment of NULLs inside matched right rows)."""
    from etl_gardener_spark.operators.asof import asof_join, asof_join_grouped
    from etl_gardener_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    kw = dict(
        on="user_id", left_time="ts", right_time="click_ts",
        payload=["click_ts", "click_value"],
    )
    a = {tuple(r) for r in asof_join(purchases, clicks, **kw).collect()}
    b = {tuple(r) for r in asof_join_grouped(purchases, clicks, **kw).collect()}
    assert a == b and len(a) > 0


def test_grouped_asof_forward_and_tolerance(spark):
    """direction='forward' matches the next right row at-or-after;
    tolerance bounds the match distance (outside -> NULL payload)."""
    from datetime import datetime

    from etl_gardener_spark.operators.asof import asof_join_grouped

    L = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 0), "l1"),
         (1, datetime(2024, 1, 1, 6, 0, 0), "l2")],
        ["k", "t", "tag"],
    )
    R = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 1, 0, 0), 10.0),
         (1, datetime(2024, 1, 1, 2, 0, 0), 20.0)],
        ["k", "rt", "pay"],
    )
    fwd = {
        r.tag: r.pay
        for r in asof_join_grouped(
            L, R, on="k", left_time="t", right_time="rt",
            payload=["pay"], direction="forward",
        ).collect()
    }
    assert fwd == {"l1": 10.0, "l2": None}  # nothing after 06:00

    tol = {
        r.tag: r.pay
        for r in asof_join_grouped(
            L, R, on="k", left_time="t", right_time="rt",
            payload=["pay"], tolerance_sec=3600.0,
        ).collect()
    }
    # backward within 1 h: l1 has nothing at-or-before; l2's latest right
    # row (02:00) is 4 h away -> outside tolerance
    assert tol == {"l1": None, "l2": None}

    near = {
        r.tag: r.pay
        for r in asof_join_grouped(
            L, R, on="k", left_time="t", right_time="rt",
            payload=["pay"], direction="nearest",
        ).collect()
    }
    assert near == {"l1": 10.0, "l2": 20.0}
