"""Distributed global ranking (operators/rank.py): the range-partition +
broadcast-offset composition must equal the single-partition window
row_number exactly, the arithmetic NTILE must equal the SQL NTILE for
every (n, buckets) shape including n < buckets, and the plan must not
contain a single-partition exchange."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_gardener_spark.operators.rank import global_row_number, ntile_from_rank
from etl_gardener_spark.plans.explain import explain_str


def test_global_row_number_equals_window(spark):
    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)
    got = {
        r["id"]: r["rank"]
        for r in global_row_number(
            df, [F.col("v").desc(), F.col("id").asc()], num_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_row_number_plan_has_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "id long, v long"
    )
    out = global_row_number(
        df, [F.col("v").desc(), F.col("id").asc()], num_partitions=5
    )
    p = explain_str(out, "formatted")
    assert "SinglePartition" not in p, p[:1500]
    # the window partitions on the materialized range-partition id (the
    # range exchange itself sits behind the localCheckpoint that pins
    # identical boundaries for the offset job and the output read)
    assert "windowspecdefinition(__pid" in p


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=57),
    buckets=st.integers(min_value=1, max_value=12),
)
def test_ntile_from_rank_matches_sql_ntile(spark, n, buckets):
    df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "rank long")
    got = {
        r["rank"]: r["t"]
        for r in df.select(
            "rank",
            ntile_from_rank(F.col("rank"), F.lit(n).cast("long"), buckets).alias("t"),
        ).collect()
    }
    w = Window.orderBy("rank")
    want = {
        r["rank"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(buckets).over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_global_running_sum_equals_window(spark):
    from etl_gardener_spark.operators.rank import global_running_sum

    rows = [(i, (i * 13) % 29, (i * 7) % 11) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v long, amt long").repartition(6)
    got = {
        r["id"]: r["running_sum"]
        for r in global_running_sum(
            df,
            [F.col("v").desc(), F.col("id").asc()],
            "amt",
            num_partitions=5,
        ).collect()
    }
    w = (
        Window.orderBy(F.col("v").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["id"]: r["rs"]
        for r in df.withColumn("rs", F.sum("amt").over(w)).collect()
    }
    assert got == want
