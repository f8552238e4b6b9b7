"""Salted two-phase aggregation equals the direct aggregation on a
deliberately skewed dataset (one key holds ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_gardener_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    df = spark.range(10_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    direct = {
        (r.k,): (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("id").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k,): (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df,
            keys=["k"],
            aggs={
                "n": ("id", "count"),
                "s": ("v", "sum"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            salt_col="id",
            salt_buckets=8,
        ).collect()
    }
    assert salted == direct
    assert direct[("hot",)][0] == 9000


def test_salted_agg_rejects_non_decomposable(spark):
    df = spark.range(10).select("id", F.lit("a").alias("k"))
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"bad": ("id", "avg")}, salt_col="id")
