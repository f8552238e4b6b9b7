"""snapshot_diff (CDC) semantics on crafted snapshots: insert/update/
delete classification, null-safe column comparison, delete rows carrying
last-seen old values, multi-column keys, unchanged rows dropped — plus
the apply_diff roundtrip property (hypothesis-generated snapshots)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_gardener_spark.operators.diff import apply_diff, snapshot_diff


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


# one row per key: (key, tag, value) with nullable tag/value exercises
# the null-safe comparisons; small key space forces overlap between the
# generated snapshots so all three change kinds appear.
_row = st.tuples(
    st.integers(min_value=0, max_value=7),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
    st.one_of(st.none(), st.sampled_from([0.0, 1.5, -3.25])),
)
_snapshot = st.lists(_row, max_size=8, unique_by=lambda r: r[0])


@settings(max_examples=12, deadline=None)
@given(old_rows=_snapshot, new_rows=_snapshot)
def test_apply_diff_roundtrip(spark, old_rows, new_rows):
    """apply_diff(old, snapshot_diff(old, new)) == new for arbitrary
    snapshots, including empty sides and null transitions."""
    schema = "id long, tag string, value double"
    old = spark.createDataFrame(old_rows, schema=schema)
    new = spark.createDataFrame(new_rows, schema=schema)
    delta = snapshot_diff(old, new, keys=["id"])
    rebuilt = apply_diff(old, delta, keys=["id"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_snapshot_diff_explicit_compare_subset(spark):
    """Columns outside compare_cols neither trigger updates nor appear."""
    old = spark.createDataFrame([(1, "a", 9.0)], ["id", "tag", "noise"])
    new = spark.createDataFrame([(1, "a", 5.0)], ["id", "tag", "noise"])
    assert (
        snapshot_diff(old, new, keys=["id"], compare_cols=["tag"]).count() == 0
    )


def test_snapshot_diff_feeds_scd2_incremental_apply(spark):
    """CDC -> SCD2 composition: the insert/update delta between two
    dimension snapshots, stamped with the new snapshot's load time, is
    exactly the observation batch scd2_apply_batch needs — and the
    incrementally maintained period table equals a full re-encode over
    the combined observation stream."""
    from pyspark.sql import functions as F

    from etl_gardener_spark.operators.scd2 import scd2_apply_batch, scd2_encode

    day1 = spark.createDataFrame(
        [(1, "bronze"), (2, "silver"), (3, "gold")], ["user_id", "tier"]
    )
    day2 = spark.createDataFrame(
        [(1, "bronze"), (2, "gold"), (4, "silver")], ["user_id", "tier"]
    )
    obs1 = day1.select(
        "user_id", F.lit(1).cast("long").alias("ts"),
        F.col("user_id").cast("long").alias("tie"), "tier"
    )
    delta = snapshot_diff(day1, day2, keys=["user_id"]).filter(
        F.col("change") != "delete"
    )
    obs2 = delta.select(
        "user_id", F.lit(2).cast("long").alias("ts"),
        F.col("user_id").cast("long").alias("tie"), "tier"
    )
    periods1 = scd2_encode(obs1, "user_id", "tier", "ts", "tie")
    incremental = scd2_apply_batch(periods1, obs2, "user_id", "tier", "ts", "tie")
    full = scd2_encode(obs1.unionByName(obs2), "user_id", "tier", "ts", "tie")
    assert sorted(map(tuple, incremental.collect())) == sorted(
        map(tuple, full.collect())
    )
    # the changed key got a closed bronze... silver->gold period pair
    rows = {
        (r.user_id, r.attr_value): (r.valid_from, r.valid_to, r.is_current)
        for r in incremental.collect()
    }
    assert rows[(2, "silver")] == (1, 2, False)
    assert rows[(2, "gold")] == (2, None, True)
    assert rows[(4, "silver")] == (2, None, True)
