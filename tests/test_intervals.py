"""Bucketized interval joins on crafted rows: containment boundaries,
intervals spanning many buckets, exactly-once pair emission for overlaps,
left-mode empty intervals."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_gardener_spark.operators.intervals import (
    interval_overlap_join,
    interval_point_join,
)


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def test_interval_point_join_containment_and_boundaries(spark):
    intervals = spark.createDataFrame(
        [
            (1, "a", _ts(1), _ts(4)),       # spans 4 hourly buckets
            (1, "b", _ts(6), _ts(6, 30)),   # within one bucket
            (2, "c", _ts(1), _ts(2)),       # other key
        ],
        ["k", "iv", "start", "end"],
    )
    points = spark.createDataFrame(
        [
            (1, 10, _ts(1)),        # == start: included (closed)
            (1, 11, _ts(4)),        # == end: included (closed)
            (1, 12, _ts(2, 30)),    # inside, middle bucket
            (1, 13, _ts(5)),        # between intervals: no match
            (1, 14, _ts(6, 15)),    # inside b
            (2, 15, _ts(1, 30)),    # inside c (key 2)
            (1, 16, _ts(1, 30)),    # key 1, inside a only
        ],
        ["k", "pid", "pt"],
    )
    out = interval_point_join(
        intervals, points, on="k", start="start", end="end", ts="pt",
        bucket_seconds=3600,
    )
    got = sorted((r.iv, r.pid) for r in out.collect())
    assert got == [
        ("a", 10), ("a", 11), ("a", 12), ("a", 16), ("b", 14), ("c", 15)
    ]


def test_interval_point_join_left_keeps_empty_intervals(spark):
    intervals = spark.createDataFrame(
        [(1, "a", _ts(1), _ts(2)), (1, "b", _ts(8), _ts(9))],
        ["k", "iv", "start", "end"],
    )
    points = spark.createDataFrame([(1, 10, _ts(1, 30))], ["k", "pid", "pt"])
    out = interval_point_join(
        intervals, points, on="k", start="start", end="end", ts="pt",
        bucket_seconds=3600, how="left",
    )
    got = {r.iv: r.pid for r in out.collect()}
    assert got == {"a": 10, "b": None}
    counts = (
        out.groupBy("iv").agg(F.count("pid").alias("n")).collect()
    )
    assert {r.iv: r.n for r in counts} == {"a": 1, "b": 0}


def test_interval_overlap_join_exactly_once(spark):
    """A pair overlapping across MANY shared buckets must appear exactly
    once (meet-bucket emission), and closed-interval touching counts."""
    left = spark.createDataFrame(
        [(1, "L1", _ts(1), _ts(10)), (1, "L2", _ts(12), _ts(13))],
        ["k", "lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [
            (1, "R1", _ts(2), _ts(9)),    # nested in L1: 8 shared buckets
            (1, "R2", _ts(10), _ts(11)),  # touches L1 end exactly
            (1, "R3", _ts(13), _ts(14)),  # touches L2 end
            (1, "R4", _ts(15), _ts(16)),  # no overlap
            (2, "R5", _ts(1), _ts(10)),   # other key: no match
        ],
        ["k", "rid", "rs", "re"],
    )
    out = interval_overlap_join(
        left, right, on="k", l_start="ls", l_end="le",
        r_start="rs", r_end="re", bucket_seconds=3600,
    )
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    assert pairs == [("L1", "R1"), ("L1", "R2"), ("L2", "R3")]
