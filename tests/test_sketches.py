"""Mergeable-sketch semantics: weekly estimates from unioned daily HLL
sketches must agree with a direct weekly sketch and stay within the
configured error bound of the exact distinct count — the property that
makes pre-aggregated sketch tables safe at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gardener_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_merged_daily_equals_direct_weekly_and_bounds_error(spark):
    e = load_table(spark, SF, "events").select(
        F.to_date("ts").alias("date"),
        F.weekofyear(F.to_date("ts")).alias("week"),
        "user_id",
    )

    daily = e.groupBy("week", "date").agg(
        F.hll_sketch_agg("user_id", 14).alias("sketch")
    )
    merged = daily.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_merged")
    )
    direct = e.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("est_direct"),
        F.countDistinct("user_id").alias("exact"),
    )
    rows = {
        r["week"]: r
        for r in merged.join(direct, "week").collect()
    }
    assert len(rows) >= 4
    for week, r in rows.items():
        # union-of-dailies is the SAME sketch state as direct aggregation
        assert r["est_merged"] == r["est_direct"], (week, r)
        # lgK=14 -> relative standard error ~0.8%; allow 4 sigma
        assert abs(r["est_merged"] - r["exact"]) / r["exact"] < 0.033, (week, r)
