"""snapshot_diff (CDC) semantics on crafted snapshots: insert/update/
delete classification, null-safe column comparison, delete rows carrying
last-seen old values, multi-column keys, unchanged rows dropped."""

from __future__ import annotations

from etl_gardener_spark.operators.diff import snapshot_diff


def test_snapshot_diff_classification_and_values(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),   # will update value
            (3, "c", 30.0),   # will be deleted
            (4, None, 40.0),  # NULL -> value: update
            (5, "e", None),   # value -> NULL: update
            (6, "f", 60.0),   # unchanged
        ],
        ["id", "tag", "value"],
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),        # unchanged
            (2, "b", 21.0),
            (4, "d", 40.0),
            (5, "e", None),        # NULL == NULL: unchanged (null-safe)
            (6, "f", 60.0),
            (7, "g", 70.0),        # insert
        ],
        ["id", "tag", "value"],
    )
    out = {
        r.id: (r.change, r.tag, r.value)
        for r in snapshot_diff(old, new, keys=["id"]).collect()
    }
    assert out == {
        2: ("update", "b", 21.0),
        3: ("delete", "c", 30.0),  # carries old values
        4: ("update", "d", 40.0),
        7: ("insert", "g", 70.0),
    }


def test_snapshot_diff_composite_key(spark):
    old = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0), (2, "x", 3.0)],
        ["k1", "k2", "v"],
    )
    new = spark.createDataFrame(
        [(1, "x", 1.5), (2, "x", 3.0), (2, "y", 4.0)],
        ["k1", "k2", "v"],
    )
    out = {
        (r.k1, r.k2): (r.change, r.v)
        for r in snapshot_diff(old, new, keys=["k1", "k2"]).collect()
    }
    assert out == {
        (1, "x"): ("update", 1.5),
        (1, "y"): ("delete", 2.0),
        (2, "y"): ("insert", 4.0),
    }


def test_snapshot_diff_explicit_compare_subset(spark):
    """Columns outside compare_cols neither trigger updates nor appear."""
    old = spark.createDataFrame([(1, "a", 9.0)], ["id", "tag", "noise"])
    new = spark.createDataFrame([(1, "a", 5.0)], ["id", "tag", "noise"])
    assert (
        snapshot_diff(old, new, keys=["id"], compare_cols=["tag"]).count() == 0
    )
