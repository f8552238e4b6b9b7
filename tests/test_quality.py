"""operators/quality.py — declarative DQ checks compile to the promised
plan shape (one aggregate for all row-local checks) and count violations
exactly, including NULL handling and duplicate accounting."""

from __future__ import annotations

import pytest

from etl_gardener_spark.operators.quality import (
    in_range,
    in_set,
    matches,
    not_null,
    ref_integrity,
    unique,
    validate,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 5.0, "x1"),
            (2, "b", 15.0, "x2"),   # out of range
            (3, None, 5.0, "x3"),   # null name
            (3, "c", 5.0, "bad"),   # dup id, regex miss
            (9, "z", None, "x4"),   # null value, orphan id
        ],
        ["id", "name", "v", "code"],
    )


def test_row_local_checks_single_pass(spark, df):
    rep = validate(
        df,
        [
            not_null("name"),
            in_range("v", 0, 10),
            in_set("name", ["a", "b", "c"]),
            matches("code", "^x[0-9]$"),
        ],
    )
    got = {r["check"]: (r["n_rows"], r["n_violations"], r["passed"]) for r in rep.collect()}
    assert got["not_null_name"] == (5, 1, False)
    # v=15 out of range + v=NULL counts as violation
    assert got["in_range_v"] == (5, 2, False)
    # name NULL counts as violation, 'z' not in set
    assert got["in_set_name"] == (5, 2, False)
    assert got["matches_code"] == (5, 1, False)
    # all four checks share one aggregate: exactly one scan of the relation
    # in the optimized logical plan (the AQE physical string repeats the
    # tree in its Initial Plan section, so count logically)
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1 and plan.count("Aggregate") == 1


def test_unique_counts_all_dup_rows(spark, df):
    rep = validate(df, [unique(["id"])])
    row = rep.collect()[0]
    # both rows of the duplicated id=3 count as violations
    assert (row["n_rows"], row["n_violations"], row["passed"]) == (5, 2, False)


def test_unique_passes_on_composite_key(spark, df):
    rep = validate(df, [unique(["id", "name"])])
    assert rep.collect()[0]["passed"] is True


def test_ref_integrity_orphans(spark, df):
    dim = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    rep = validate(df, [ref_integrity("id", dim, "k")])
    row = rep.collect()[0]
    assert (row["n_violations"], row["passed"]) == (1, False)


def test_all_green_report(spark, df):
    dim = spark.createDataFrame([(1,), (2,), (3,), (9,)], ["k"])
    rep = validate(
        df,
        [
            not_null("id"),
            in_range("id", 0, 100),
            unique(["code"]),
            ref_integrity("id", dim, "k"),
        ],
    )
    rows = rep.collect()
    assert len(rows) == 4 and all(r["passed"] for r in rows)


def test_unknown_kind_raises(spark, df):
    from etl_gardener_spark.operators.quality import Check

    with pytest.raises(ValueError):
        validate(df, [Check("bogus", "bogus")])


def test_split_by_expectations_dispositions(spark, df):
    from pyspark.sql import functions as F

    from etl_gardener_spark.operators.quality import split_by_expectations

    ann = split_by_expectations(df, [not_null("name"), in_range("v", 0, 10)])
    rows = {r["id"]: (r["dq_disposition"], list(r["dq_reasons"]))
            for r in ann.collect() if r["id"] != 3}
    assert rows[1] == ("accepted", [])
    assert rows[2] == ("quarantined", ["in_range_v"])
    assert rows[9] == ("quarantined", ["in_range_v"])  # null v violates range
    both = [r for r in ann.collect() if r["id"] == 3]
    reasons = sorted(tuple(r["dq_reasons"]) for r in both)
    assert reasons == [(), ("not_null_name",)]
    # nothing dropped, disposition covers every row
    assert ann.count() == df.count()
    assert ann.filter(F.col("dq_disposition").isNull()).count() == 0


def test_split_rejects_set_level_checks(spark, df):
    from etl_gardener_spark.operators.quality import split_by_expectations

    with pytest.raises(ValueError):
        split_by_expectations(df, [unique(["id"])])


def test_promote_with_quarantine_counts(spark, df, tmp_path):
    from pyspark.sql import functions as F

    from etl_gardener_spark.operators.quality import promote_with_quarantine
    from etl_gardener_spark.warehouse import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    batch = df.withColumn("date", F.lit("2024-01-01").cast("date"))
    stats = promote_with_quarantine(
        batch, [not_null("name"), in_range("v", 0, 10)], wh, "exp", "t"
    )
    assert stats == {"accepted": 2, "quarantined": 3}
    quar = wh.read(spark, "quarantine", "exp", "t")
    assert "dq_reason" in quar.columns
    assert set(r["dq_reason"] for r in quar.collect()) == {
        "not_null_name",
        "in_range_v",
    }
    acc = wh.read(spark, "raw", "exp", "t")
    assert "dq_reason" not in acc.columns and "dq_reasons" not in acc.columns

    # idempotent: re-promoting the same batch replaces its partitions,
    # never doubles them
    stats2 = promote_with_quarantine(
        batch, [not_null("name"), in_range("v", 0, 10)], wh, "exp", "t"
    )
    assert stats2 == {"accepted": 2, "quarantined": 3}
    assert wh.read(spark, "raw", "exp", "t").count() == 2
    assert wh.read(spark, "quarantine", "exp", "t").count() == 3

    # a FIXED batch (no violations) clears the day's stale quarantine
    # rows even though the quarantine frame is empty for that day
    fixed = batch.withColumn("name", F.coalesce("name", F.lit("ok"))).withColumn(
        "v", F.coalesce(F.least("v", F.lit(10.0)), F.lit(5.0))
    )
    stats3 = promote_with_quarantine(
        fixed, [not_null("name"), in_range("v", 0, 10)], wh, "exp", "t"
    )
    assert stats3 == {"accepted": 5, "quarantined": 0}
    assert wh.read(spark, "raw", "exp", "t").count() == 5
    assert not wh.partition_exists(
        spark, "quarantine", "exp", "t", batch.select("date").first()["date"]
    )


def test_profile_counts_nulls_distincts_minmax(spark):
    from etl_gardener_spark.operators.quality import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], ["x", "s"]
    )
    got = {r["column"]: r.asDict() for r in profile(df, exact_distinct=True).collect()}
    assert got["x"]["n_rows"] == 4 and got["x"]["n_null"] == 1
    assert got["x"]["n_distinct"] == 2  # nulls excluded from distinct
    assert got["x"]["min_value"] == "1" and got["x"]["max_value"] == "2"
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_value"] == "a" and got["s"]["max_value"] == "b"


def test_profile_single_scan_and_approx_mode(spark):
    from etl_gardener_spark.operators.quality import profile

    df = spark.range(0, 1000).withColumnRenamed("id", "x")
    out = profile(df, ["x"])  # approx mode
    row = out.collect()[0]
    assert row["n_rows"] == 1000 and row["n_null"] == 0
    assert abs(row["n_distinct"] - 1000) <= 30  # rsd 1%
    # approx mode must not plan an Expand (the exact-distinct multiplier)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_k_anonymity_violations(spark):
    from etl_gardener_spark.operators.quality import k_anonymity_violations

    rows = (
        [("a", "x", i) for i in range(5)]     # group of 5: safe at k=5
        + [("a", "y", 1), ("a", "y", 1)]       # group of 2: violation, homogeneous
        + [("b", "x", 1), ("b", "x", 2), ("b", "x", 3)]  # group of 3: violation
    )
    df = spark.createDataFrame(rows, ["q1", "q2", "s"])
    got = {
        (r["q1"], r["q2"]): (r["n"], r["n_sensitive"])
        for r in k_anonymity_violations(df, ["q1", "q2"], 5, "s").collect()
    }
    assert got == {("a", "y"): (2, 1), ("b", "x"): (3, 3)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_anonymity_violations(df, ["q1"], 1)
