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
