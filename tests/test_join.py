"""Annotation-join tests: reference Q2 semantics on nested fixtures and an
oracle check over the driver's orders/customer tables."""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import Row

from etl_gardener_spark.operators.join import join_annotate
from tests.conftest import SF_DIR, assert_matches_oracle


def _fact_rows():
    d = date(2024, 3, 1)
    return [
        Row(id="a", date=d, parser=Row(Time=datetime(2024, 3, 1, 1)), payload=1.0),
        Row(id="b", date=d, parser=Row(Time=datetime(2024, 3, 1, 2)), payload=2.0),
        Row(id="c", date=d, parser=Row(Time=datetime(2024, 3, 1, 3)), payload=3.0),
    ]


def _ann_rows():
    return [
        # annotation dated d-1 still matches (BETWEEN window handled upstream)
        Row(id="a", date=date(2024, 2, 29), parser=Row(Time=datetime(2024, 2, 29, 9)),
            client=Row(Geo=Row(CountryCode="US"))),
        Row(id="b", date=date(2024, 3, 1), parser=Row(Time=datetime(2024, 3, 1, 9)),
            client=Row(Geo=Row(CountryCode="DE"))),
        # no annotation for "c" -> NULL annotation columns
    ]


def test_join_column_order_and_left_semantics(spark):
    fact = spark.createDataFrame(_fact_rows())
    ann = spark.createDataFrame(_ann_rows())
    out = join_annotate(fact, ann, on="id", leading=["date", "parser"])
    # Reference order: id, date, parser, ann payload, fact payload (ops.go:250-251)
    assert out.columns == ["id", "date", "parser", "client", "payload"]
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 3
    assert rows["a"].client.Geo.CountryCode == "US"
    assert rows["b"].client.Geo.CountryCode == "DE"
    assert rows["c"].client is None  # left join preserves unannotated facts
    # ann's own date/parser were dropped; fact's survived
    assert rows["a"].date == date(2024, 3, 1)
    assert rows["a"].parser.Time == datetime(2024, 3, 1, 1)


def test_join_is_broadcast(spark):
    fact = spark.createDataFrame(_fact_rows())
    ann = spark.createDataFrame(_ann_rows())
    plan = join_annotate(fact, ann)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_join_against_duckdb_oracle(spark, duck):
    """orders ⟕ customer in the reference's shape vs DuckDB."""
    from etl_gardener_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    out = join_annotate(
        orders, customer, on="o_custkey", leading=["o_orderkey", "o_orderdate"]
    )
    assert_matches_oracle(
        out,
        duck,
        """
        SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
               c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment,
               o.o_orderstatus, o.o_totalprice, o.o_orderpriority
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        """,
    )
