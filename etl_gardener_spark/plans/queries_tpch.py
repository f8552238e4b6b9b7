"""TPC-H-shape analytic queries over the driver's star schema.

The reference's own SQL surface stops at dedup windows and one left join
(SURVEY.md §2.2) — these queries extend the engine across the classic
decision-support shapes (multi-way joins, semi/anti joins with non-equi
conditions, scalar-subquery thresholds, disjunctive pushdown, conditional
aggregation, grouping sets, global top-k) so a reference user gets a full
analytics surface, not just the gardener pipeline. Every query pairs with a
DuckDB oracle; aliases match on both sides (the driver's comparator sorts
columns by name before hashing).

Scale notes are per-query docstrings: dimension sides are broadcast, filters
sit before joins so they reach the parquet scan, and every aggregate is a
partial (map-side combine) before its one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gardener_spark.functions.exact import (
    floor_div_expr,
    micro_display,
    micro_sum,
    micro_sum_sql,
)
from etl_gardener_spark.plans.queries import query
from etl_gardener_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Multi-way joins + top-k
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(((2 * SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1e6 + 0.5) AS HUGEINT)) + 100) // (200) - (CASE WHEN (2 * SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1e6 + 0.5) AS HUGEINT)) + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1998-01-01' AND l_shipdate > DATE '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("analytics", "tpch", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of not-yet-shipped orders for one market
    segment, global top-10. The segment filter reaches the customer scan
    and that side broadcasts; orders⨝lineitem is the only shuffle pair.
    ORDER BY + LIMIT compiles to TakeOrderedAndProject — per-partition
    top-10 then a 10-row driver merge, never a global sort of the
    aggregate. Deterministic tiebreak (o_orderdate, l_orderkey) keeps the
    10-row set stable across engines."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            micro_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("__s")
        )
        .withColumn("revenue", micro_display("__s", 4))
        .drop("__s")
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q10_returned_revenue",
    """
    SELECT c_custkey, c_name,
           CAST(((2 * SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1e6 + 0.5) AS HUGEINT)) + 100) // (200) - (CASE WHEN (2 * SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1e6 + 0.5) AS HUGEINT)) + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 10000.0 AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("analytics", "tpch", "topk"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter. Four-way join where nation (25 rows) and the quarter-filtered
    orders side broadcast; lineitem is never shuffled before its returnflag
    filter. Aggregation keys include the customer attributes so no second
    join back to customer is needed."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            micro_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("__s")
        )
        .withColumn("revenue", micro_display("__s", 4))
        .drop("__s")
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q7_nation_pair_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(((2 * SUM(CAST(FLOOR((volume) * 1e6 + 0.5) AS HUGEINT)) + 100) // (200) - (CASE WHEN (2 * SUM(CAST(FLOOR((volume) * 1e6 + 0.5) AS HUGEINT)) + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 10000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("analytics", "tpch", "join"),
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    The disjunctive nation-pair predicate is applied AFTER the cheap
    broadcast joins attach both nation names; supplier/customer/nation all
    broadcast, so the only shuffle is lineitem⨝orders. At 100 TB the
    pair filter could instead pre-restrict supplier/customer to the two
    nations before the fact joins (semi-push of the disjunction) —
    expressed here via the two small broadcast dims already carrying only
    the needed keys."""
    n = load_table(spark, sf_dir, "nation")
    pair = n.filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(pair.select(F.col("n_nationkey").alias("sk"),
                                    F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(pair.select(F.col("n_nationkey").alias("ck"),
                                    F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .select("c_custkey", "cust_nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            micro_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("__s")
        )
        .withColumn("revenue", micro_display("__s", 4))
        .drop("__s")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins with extra conditions, scalar-subquery thresholds
# ---------------------------------------------------------------------------


@query(
    "q4_late_ship_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 7 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("analytics", "tpch", "semijoin"),
)
def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped more than a
    week after order date, counted per priority. The EXISTS compiles to a
    LEFT SEMI join whose condition mixes the equi key with a non-equi
    timestamp comparison — Spark keeps the equi part as the shuffle key
    and evaluates the residual inside the join, so no cartesian blow-up.
    Semi join emits each order at most once (no post-dedup needed)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o["o_orderkey"] == l["l_orderkey"]) & (
        l["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


@query(
    "q11_part_concentration",
    """
    WITH pv AS (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS part_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, part_qty FROM pv
    WHERE part_qty * 1250 > (SELECT SUM(part_qty) FROM pv)
    """,
    tags=("analytics", "tpch", "scalar-subquery"),
)
def q11_part_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding more than 0.1% of total shipped
    quantity. The global total is a second aggregate over the SAME
    per-part aggregate (not a second scan of lineitem) broadcast back as a
    1-row cross join. Integer arithmetic (`part_qty * 1250 > total`)
    keeps the threshold comparison exact on both engines — a float
    fraction would make boundary rows engine-dependent."""
    l = load_table(spark, sf_dir, "lineitem")
    pv = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("part_qty")
    )
    total = pv.agg(F.sum("part_qty").alias("total_qty"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("part_qty") * 1250 > F.col("total_qty"))
        .select("l_partkey", "part_qty")
    )


@query(
    "q22_idle_rich_segments",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE)
             / 1e6 / CAST(COUNT(*) AS DOUBLE) AS a
      FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(((2 * SUM(CAST(FLOOR((c_acctbal) * 1e6 + 0.5) AS HUGEINT)) + 100) // (200) - (CASE WHEN (2 * SUM(CAST(FLOOR((c_acctbal) * 1e6 + 0.5) AS HUGEINT)) + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 10000.0 AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2001-01-01')
    GROUP BY c_mktsegment
    """,
    tags=("analytics", "tpch", "antijoin", "scalar-subquery"),
)
def q22_idle_rich_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers dormant in 2001,
    rolled up by segment. The scalar AVG broadcasts as a 1-row cross
    join; NOT EXISTS is a left-anti join whose build side is orders
    pre-filtered by date and projected to the key column — the anti
    join shuffles only qualifying keys, not whole orders rows."""
    c = load_table(spark, sf_dir, "customer")
    # exact-operand threshold: micro-unit sum and count are exact
    # integers, so the computed average is the SAME double in both
    # engines and the > cut keeps identical rows even at boundaries
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.expr(
            "cast(sum(cast(floor(c_acctbal * 1e6 + 0.5) as decimal(38,0)))"
            " as double) / 1e6 / cast(count(*) as double)"
        ).alias("avg_bal")
    )
    okeys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(okeys, c["c_custkey"] == okeys["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            micro_sum(F.col("c_acctbal")).alias("__s"),
        )
        .select(
            "c_mktsegment", "numcust", micro_display("__s", 4).alias("totacctbal")
        )
    )


@query(
    "top_supplier_per_nation",
    """
    SELECT n_name, s_name, s_acctbal
    FROM supplier s JOIN nation n ON s_nationkey = n_nationkey
    WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    """,
    tags=("analytics", "tpch", "window"),
)
def top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-max shape: the supplier(s) with the highest
    balance in each nation. The correlated subquery is decorrelated into
    a MAX window over s_nationkey — one shuffle of supplier instead of a
    self-join — then the 25-row nation dim broadcasts on. Ties keep all
    rows, matching the correlated-equality semantics."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    best = s.withColumn("max_bal", F.max("s_acctbal").over(w)).filter(
        F.col("s_acctbal") == F.col("max_bal")
    )
    return best.join(
        F.broadcast(n), best["s_nationkey"] == n["n_nationkey"]
    ).select("n_name", "s_name", "s_acctbal")


# ---------------------------------------------------------------------------
# Outer-join aggregates, conditional aggregation, distinct counting
# ---------------------------------------------------------------------------


@query(
    "q13_order_count_distribution",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    tags=("analytics", "tpch", "outer-join"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of non-final order counts per
    customer, zeros included. The status predicate lives on the join's
    inner side (filter-before-join ≡ predicate in LEFT JOIN ... ON), so
    unmatched customers survive with COUNT(o_orderkey)=0 — COUNT of a
    column skips the NULLs an outer join fabricates. Second aggregate
    (count-of-counts) is tiny; both aggregates are partial-first."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@query(
    "q14_promo_revenue_pct",
    """
    SELECT FLOOR(100.0
                 * (CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                      THEN CAST(FLOOR((l_extendedprice * (1 - l_discount))
                                      * 1e6 + 0.5) AS HUGEINT)
                      ELSE 0 END) AS DOUBLE)
                    / CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount))
                                          * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE))
                 * 1e4 + 0.5) / 1e4 AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= DATE '1997-06-01' AND l_shipdate < DATE '1997-07-01'
    """,
    tags=("analytics", "tpch", "conditional-agg"),
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from ECONOMY-type
    parts. Conditional aggregation — one pass computes both the CASE'd
    numerator and the unconditional denominator (no second join), with
    part broadcast and the month filter pushed to the lineitem scan."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev_micro = F.floor(rev * 1e6 + F.lit(0.5)).cast("decimal(38,0)")
    zero38 = F.lit(0).cast("decimal(38,0)")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .agg(
            F.sum(
                F.when(F.col("p_type") == "ECONOMY", rev_micro).otherwise(zero38)
            ).alias("__num"),
            F.sum(rev_micro).alias("__den"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .select(
            (
                F.expr(
                    "floor(100.0 * (cast(__num as double)"
                    " / cast(__den as double)) * 1e4 + 0.5)"
                )
                / 1e4
            ).alias("promo_pct"),
            "n_lines",
        )
    )


@query(
    "q16_brand_supplier_cnt",
    """
    SELECT p_brand, p_type, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#23' AND p_type NOT IN ('ECONOMY', 'STANDARD')
      AND p_size IN (1, 4, 7, 10, 14, 23, 25, 45)
    GROUP BY p_brand, p_type
    """,
    tags=("analytics", "tpch", "distinct"),
)
def q16_brand_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each surviving
    (brand, type) after NOT-IN / IN-list part filters. The filters are
    applied to the 2k-row part dim BEFORE broadcast, so the fact side
    joins against only qualifying parts; COUNT(DISTINCT) expands to
    Spark's two-phase distinct aggregate (partial dedup per partition,
    then merge) — no global row shuffle of duplicates."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#23")
            & (~F.col("p_type").isin("ECONOMY", "STANDARD"))
            & (F.col("p_size").isin(1, 4, 7, 10, 14, 23, 25, 45))
        )
        .select("p_partkey", "p_brand", "p_type")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(((2 * SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1e6 + 0.5) AS HUGEINT)) + 100) // (200) - (CASE WHEN (2 * SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1e6 + 0.5) AS HUGEINT)) + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("analytics", "tpch", "disjunctive"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    bundles. Catalyst extracts the common-prefix constraints of the
    disjunction: the part side is pre-filtered to the union of qualifying
    brands/sizes before broadcast, and the quantity bounds (1..30 overall)
    push to the lineitem scan, so the residual OR runs on a fraction of
    each table rather than the joined output of the full tables."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        j.filter(cond)
        .agg(
            micro_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("__s"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .select(
            micro_display("__s", 4).alias("revenue"),
            "n_lines",
        )
    )


@query(
    "orders_grouping_sets",
    """
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(((2 * SUM(CAST(FLOOR((o_totalprice) * 1e6 + 0.5) AS HUGEINT)) + 10000) // (20000) - (CASE WHEN (2 * SUM(CAST(FLOOR((o_totalprice) * 1e6 + 0.5) AS HUGEINT)) + 10000) % (20000) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("analytics", "agg", "grouping-sets"),
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the two single-dimension rollups plus the
    grand total, WITHOUT the (status, priority) cross cells a CUBE would
    add. One Expand node replicates each row once per grouping set into a
    single hash aggregate: one scan, one shuffle, three granularities."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [[F.col("o_orderstatus")], [F.col("o_orderpriority")], []],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            micro_sum(F.col("o_totalprice")).alias("__s"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "n_orders",
            micro_display("__s", 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Array higher-order functions / text entropy (LLM-pipeline adjacent)
# ---------------------------------------------------------------------------


@query(
    "emb_vector_norms",
    """
    SELECT vec_id,
           ROUND(sqrt(list_aggregate(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')), 6
           ) AS l2_norm,
           ROUND(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS vmin,
           ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vmax,
           CAST(len(embedding) AS BIGINT) AS dim
    FROM embeddings
    """,
    tags=("llm", "array", "higher-order"),
)
def emb_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions entirely JVM-side: per-vector L2 norm
    via transform+aggregate, min/max elements, dimensionality. No UDF, no
    explode — the lambda runs inside codegen per row, so a 100 TB
    embedding table needs zero Python workers and zero shuffles (narrow
    map-only plan). Floats are cast to double BEFORE squaring on both
    engines so the products agree bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.size("embedding").cast("long").alias("dim"),
    )


@query(
    "doc_token_entropy",
    """
    WITH toks AS (
      SELECT lang, lower(tok) AS tok FROM (
        SELECT lang, unnest(string_split_regex(text, '[^a-zA-Z0-9]+')) AS tok
        FROM documents) t
      WHERE tok <> ''),
    freq AS (SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY lang, tok),
    tot AS (SELECT lang, SUM(c) AS n FROM freq GROUP BY lang)
    SELECT f.lang,
           ROUND(-SUM((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 6)
             AS token_entropy,
           CAST(MAX(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab
    FROM freq f JOIN tot USING (lang)
    GROUP BY f.lang
    """,
    tags=("llm", "text", "entropy"),
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token Shannon entropy per language — the
    diversity/degeneracy signal a training-data pipeline tracks next to
    [[doc_quality_score]]-style per-doc filters. Tokenize (split+explode,
    JVM-side), per-(lang,token) counts, then entropy from the count
    vector. The expensive explode+count aggregates BEFORE the tiny
    per-lang totals broadcast back — the heavy shuffle is on (lang,token),
    never on raw tokens twice."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "lang",
            F.explode(F.split(F.col("text"), "[^a-zA-Z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("lang", F.lower("tok").alias("tok"))
    )
    freq = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("lang").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        freq.join(F.broadcast(tot), "lang")
        .groupBy("lang")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("token_entropy"),
            F.max("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated subqueries (decorrelated), HAVING-joins, market share
# ---------------------------------------------------------------------------


@query(
    "q15_top_revenue_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           ROUND(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("analytics", "tpch", "scalar-subquery"),
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the highest revenue in one
    quarter. The view's MAX is a second aggregate over the SAME per-supplier
    aggregate, broadcast back as a 1-row cross join — lineitem is scanned
    once. Revenue accumulates in DECIMAL so the max-equality predicate is
    exact: a double sum's fold order could make `rev = max(rev)` true for
    different suppliers on different engines. Ties keep all rows, matching
    the correlated-equality semantics."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("total_revenue")
    )
    best = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 4).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "q17_small_quantity_part_revenue",
    """
    SELECT CAST(((2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                          * 10000 AS HUGEINT) + 7) // (14)
                 - (CASE WHEN (2 * CAST(SUM(CAST(l_extendedprice
                               AS DECIMAL(18,4))) * 10000 AS HUGEINT) + 7)
                              % (14) < 0
                    THEN 1 ELSE 0 END)) AS DOUBLE) / 10000.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    tags=("analytics", "tpch", "correlated-subquery"),
)
def q17_small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost if below-20%-of-average-quantity
    orders for one brand's parts were not filled. The correlated per-part
    AVG decorrelates into an AVG window over l_partkey — one shuffle of
    the (brand-filtered) lineitem slice, no self-join and no second scan.
    The brand filter is applied to the 2k-row part dim BEFORE broadcast,
    and restricting the window input to qualifying parts is sound because
    the correlated average is per-part over all of that part's lines.
    l_quantity is integral, so the windowed AVG (exact integer sum /
    count) is fold-order-independent; the revenue total accumulates in
    DECIMAL."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#2")
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .withColumn("part_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg(
            F.expr(
                "cast(sum(cast(l_extendedprice as decimal(18,4))) * 10000"
                " as bigint)"
            ).alias("__e4"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .select(
            (F.expr("((2 * __e4 + 7) div (14) - (case when (2 * __e4 + 7) % (14) < 0 then 1 else 0 end))").cast("double") / 10000.0).alias(
                "avg_yearly"
            ),
            "n_lines",
        )
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("analytics", "tpch", "semijoin", "having"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders exceed 300 units.
    The IN-with-HAVING subquery decorrelates to a LEFT SEMI join against
    the per-order quantity aggregate — and since the outer query re-groups
    by order anyway, the aggregate is computed ONCE and semi-joined back
    to itself (keys only), never rescanning lineitem. l_quantity is
    integral so the >300 threshold is exact on both engines. The heavy
    hitters surviving the filter are few, so the customer join broadcasts
    the filtered aggregate, not the other way around."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per_order = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    big = per_order.filter(F.col("qty") > 300)
    return (
        o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("qty").cast("double"), 2).alias("total_qty"),
        )
    )


@query(
    "q9_product_profit",
    """
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
           CAST(((2 * CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) * 10000 AS HUGEINT) + 100)
                 // (200)
                 - (CASE WHEN (2 * CAST(SUM(CAST(l_extendedprice
                               * (1 - l_discount) AS DECIMAL(18,4)))
                               * 10000 AS HUGEINT) + 100) % (200) < 0
                    THEN 1 ELSE 0 END)) AS DOUBLE) / 100.0 AS profit
    FROM lineitem, part, supplier, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND s_nationkey = n_nationkey AND p_name LIKE '%widget%'
    GROUP BY n_name, EXTRACT(year FROM l_shipdate)
    """,
    tags=("analytics", "tpch", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product line by supplier nation and
    year (testdata has no partsupp, so profit = discounted revenue). The
    LIKE filter prunes the part dim to ~13% BEFORE broadcast, so the fact
    side discards non-matching lines in the scan stage; supplier and
    nation broadcast too — zero shuffles until the final (nation, year)
    aggregate, whose partials combine map-side. DECIMAL accumulation
    keeps the cent-rounding deterministic across fold orders."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(
            F.expr(
                "cast(sum(cast(l_extendedprice * (1 - l_discount)"
                " as decimal(18,4))) * 10000 as bigint)"
            ).alias("__e4")
        )
        .select(
            "nation",
            "o_year",
            (F.expr("((2 * __e4 + 100) div (200) - (case when (2 * __e4 + 100) % (200) < 0 then 1 else 0 end))").cast("double") / 100.0).alias(
                "profit"
            ),
        )
    )


@query(
    "q8_market_share",
    """
    WITH all_sales AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem, orders, customer, supplier, part, nation n1, nation n2,
           region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n1.n_nationkey
        AND p_type = 'ECONOMY')
    SELECT o_year,
           FLOOR((CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)
                       AS DOUBLE)
                  / CAST(SUM(volume) AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
    tags=("analytics", "tpch", "conditional-agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part volume sold into
    ASIA customers, per order year. One pass computes the CASE'd
    numerator and unconditional denominator together (no second join);
    part/supplier/customer-nation-region all broadcast, so the only
    shuffle pair is lineitem⨝orders. Both sums accumulate in DECIMAL and
    the share is a single double division of exact values — the ratio is
    bit-identical on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
                    F.col("n_nationkey").alias("cnk")
                )
            ),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        s["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(supp_nation), l["l_suppkey"] == F.col("s_suppkey"))
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(asia_cust), o["o_custkey"] == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(zero)
            ).alias("__num"),
            F.sum("volume").alias("__den"),
        )
        .select(
            "o_year",
            (
                F.expr(
                    "floor((cast(__num as double) / cast(__den as double))"
                    " * 1e6 + 0.5)"
                )
                / 1e6
            ).alias("mkt_share"),
        )
    )


@query(
    "q5_local_supplier_volume",
    """
    WITH agg AS (
      SELECT n.n_name AS nation,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_e4
      FROM customer c, orders o, lineitem l, supplier s, nation n, region r
      WHERE c.c_custkey = o.o_custkey
        AND l.l_orderkey = o.o_orderkey
        AND l.l_suppkey = s.s_suppkey
        AND c.c_nationkey = s.s_nationkey
        AND s.s_nationkey = n.n_nationkey
        AND n.n_regionkey = r.r_regionkey
        AND r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n.n_name
    )
    SELECT nation,
           CAST(((2 * rev_e4 + 100) // (200) - (CASE WHEN (2 * rev_e4 + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 100.0 AS revenue
    FROM agg
    """,
    tags=("analytics", "tpch", "join"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue from local (customer-nation == supplier-nation)
    supply chains in one region and year, per nation.

    Plan: region->nation is a two-row broadcast chain pruned before
    anything big moves; the date filter reaches the orders parquet scan.
    customer and supplier both broadcast (dims), so the only shuffle pair
    is orders⨝lineitem on orderkey — the same co-partitioning a bucketed
    warehouse would give for free. The c_nationkey = s_nationkey equality
    rides the row after both broadcast joins as a cheap filter rather
    than a join key, which avoids a second shuffle of the fact.

    Money math: per-term DECIMAL(18,4) cast, exact decimal sum, half-up
    cent rounding in integer `div` (both engines truncate), final double
    — bit-identical across engines (see brand_revenue)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation")
        .agg(
            F.expr(
                "cast(sum(cast(l_extendedprice * (1 - l_discount)"
                " as decimal(18,4))) * 10000 as bigint)"
            ).alias("_rev_e4")
        )
        .select(
            "nation",
            (F.expr("((2 * _rev_e4 + 100) div (200) - (case when (2 * _rev_e4 + 100) % (200) < 0 then 1 else 0 end))").cast("double") / 100.0).alias(
                "revenue"
            ),
        )
    )


@query(
    "q6_forecast_revenue",
    """
    WITH agg AS (
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                  * 10000 AS BIGINT) AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    )
    SELECT CAST(((2 * rev_e4 + 100) // (200) - (CASE WHEN (2 * rev_e4 + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 100.0 AS revenue
    FROM agg
    """,
    tags=("analytics", "tpch", "filter-agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate, the canonical pushdown
    probe. All three predicates (ship year, discount band, quantity cap)
    are simple comparisons on scan columns, so they compile into
    PushedFilters on the parquet scan and the whole query reads only four
    columns. One partial aggregate per partition, one single-row exchange
    — at 100 TB this is scan-bandwidth-bound, exactly as it should be.
    The discount literals 0.05/0.07 parse to the same doubles in both
    engines, so the band keeps identical rows; the sum itself is exact
    decimal with integer cent-rounding (see brand_revenue)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                "cast(sum(cast(l_extendedprice * l_discount"
                " as decimal(18,4))) * 10000 as bigint)"
            ).alias("_rev_e4")
        )
        .select(
            (F.expr("((2 * _rev_e4 + 100) div (200) - (case when (2 * _rev_e4 + 100) % (200) < 0 then 1 else 0 end))").cast("double") / 100.0).alias(
                "revenue"
            )
        )
    )


@query(
    "supplier_league_table",
    """
    WITH rev AS (
      SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_e4
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3)
    SELECT s_suppkey, s_name, nation,
           CAST(((2 * rev_e4 + 100) // (200) - (CASE WHEN (2 * rev_e4 + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 100.0 AS revenue,
           CAST(RANK() OVER (ORDER BY rev_e4 DESC) AS BIGINT) AS global_rank,
           CAST(RANK() OVER (PARTITION BY nation ORDER BY rev_e4 DESC)
                AS BIGINT) AS nation_rank
    FROM rev
    """,
    tags=("analytics", "window", "rank", "league"),
)
def supplier_league_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue league table: exact DECIMAL revenue per supplier
    with BOTH a global rank and a within-nation rank (two window
    partitionings over the one small per-supplier aggregate — the fact
    table shuffles once for the groupBy, never for the windows). Revenue
    rounding uses the integer half-up kernel shared with brand_revenue
    (the only double-rounding portable across engines); ranks order by
    the EXACT integer revenue, so ties are principled, not
    float-accidental."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .agg(
            F.expr(
                "cast(sum(cast(l_extendedprice * (1 - l_discount)"
                " as decimal(18,4))) * 10000 as bigint)"
            ).alias("rev_e4")
        )
    )
    wg = Window.orderBy(F.col("rev_e4").desc())
    wn = Window.partitionBy("nation").orderBy(F.col("rev_e4").desc())
    return rev.select(
        "s_suppkey",
        "s_name",
        "nation",
        (F.expr("((2 * rev_e4 + 100) div (200) - (case when (2 * rev_e4 + 100) % (200) < 0 then 1 else 0 end))").cast("double") / 100.0).alias(
            "revenue"
        ),
        F.rank().over(wg).cast("long").alias("global_rank"),
        F.rank().over(wn).cast("long").alias("nation_rank"),
    )


@query(
    "order_gap_percentiles_by_segment",
    """
    WITH gaps AS (
      SELECT c.c_mktsegment AS segment,
             datediff('day',
                      LAG(o.o_orderdate) OVER (
                        PARTITION BY o.o_custkey
                        ORDER BY o.o_orderdate, o.o_orderkey),
                      o.o_orderdate) AS gap_days
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    SELECT segment,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_days, 0.5), 4) AS p50,
           ROUND(quantile_cont(gap_days, 0.9), 4) AS p90
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY segment
    """,
    tags=("analytics", "window", "percentile", "recency"),
)
def order_gap_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence by market segment: exact interpolated
    p50/p90 of the days between a customer's consecutive orders. The lag
    window shuffles on custkey once; the per-segment exact percentile
    runs over the small gap set (percentile_approx is the declared swap
    at 100 TB, same policy as ship_lag_percentiles)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(gap_days, 0.9)"), 4).alias("p90"),
    )


@query(
    "discount_band_effectiveness",
    """
    SELECT CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(((2 * CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) + 100)
                 // (200)
                 - (CASE WHEN (2 * CAST(SUM(CAST(l_extendedprice
                               * (1 - l_discount) AS DECIMAL(18,4)))
                               * 10000 AS BIGINT) + 100) % (200) < 0
                    THEN 1 ELSE 0 END)) AS DOUBLE) / 100.0 AS revenue
    FROM lineitem
    GROUP BY 1
    """,
    tags=("analytics", "agg", "pricing"),
)
def discount_band_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and volume by discount tier (whole-percent bands): the
    price-ladder readout behind markdown decisions. Quantities sum as
    integers and revenue accumulates in DECIMAL with the shared integer
    half-up rounding kernel, so every cell is exact and engine-portable;
    the band key uses FLOOR(x*100 + 0.5), identical IEEE ops on both
    engines, never a double ROUND. One map-side-combined aggregate to
    ~11 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_discount") * 100 + 0.5)
            .cast("long")
            .alias("discount_pct")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"),
            (
                F.expr(
                    floor_div_expr(
                        "2 * cast(sum(cast(l_extendedprice * (1 - l_discount)"
                        " as decimal(18,4))) * 10000 as bigint) + 100",
                        "200",
                    )
                ).cast("double")
                / 100.0
            ).alias("revenue"),
        )
    )


@query(
    "order_basket_size_distribution",
    """
    WITH per AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey)
    SELECT n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(((2 * COUNT(*) * 10000 + (SELECT COUNT(*) FROM per))
                 // (2 * (SELECT COUNT(*) FROM per))
                 - (CASE WHEN (2 * COUNT(*) * 10000
                           + (SELECT COUNT(*) FROM per))
                              % (2 * (SELECT COUNT(*) FROM per)) < 0
                    THEN 1 ELSE 0 END)) AS DOUBLE) / 10000.0
             AS share
    FROM per GROUP BY n_lines
    """,
    tags=("analytics", "distribution", "basket"),
)
def order_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: how many line items orders carry — the
    shape retail capacity planning reads. Two keyed aggregates (per-order
    count, then the tiny size histogram) with the denominator broadcast
    as a one-row aggregate; every cell is an exact integer ratio rounded
    through the portable (2x + d) div 2d kernel."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    tot = per.agg(F.count(F.lit(1)).cast("long").alias("t"))
    return (
        per.groupBy("n_lines")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_lines",
            "n_orders",
            # exact half-up integer ratio kernel — ROUND(n/t, 4) is the
            # repr-midpoint hazard (functions/exact.py)
            (
                F.expr("((2 * n_orders * 10000 + t) div (2 * t) - (case when (2 * n_orders * 10000 + t) % (2 * t) < 0 then 1 else 0 end))").cast("double")
                / 10000.0
            ).alias("share"),
        )
    )


@query(
    "revenue_cohorts",
    """
    WITH first_order AS (
      SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey),
    monthly AS (
      SELECT o.o_custkey, f.cohort_month,
             date_trunc('month', o.o_orderdate) AS month,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) * 10000
                  AS BIGINT) AS rev_e4
      FROM orders o JOIN first_order f USING (o_custkey)
      GROUP BY 1, 2, 3)
    SELECT CAST(cohort_month AS DATE) AS cohort_month,
           CAST((EXTRACT(year FROM month) - EXTRACT(year FROM cohort_month))
                * 12
                + (EXTRACT(month FROM month)
                   - EXTRACT(month FROM cohort_month)) AS BIGINT)
             AS months_since,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(((2 * SUM(rev_e4) + 100) // (200) - (CASE WHEN (2 * SUM(rev_e4) + 100) % (200) < 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 100.0 AS revenue
    FROM monthly
    GROUP BY cohort_month, months_since
    """,
    tags=("analytics", "cohort", "revenue", "finance"),
)
def revenue_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue cohort matrix (the finance twin of the user retention
    matrix): customers cohorted by first-order month; each cell is the
    cohort's DECIMAL-exact revenue N months later — the table an NDR /
    LTV model is read off. The first-order dimension broadcasts; revenue
    sums stay integer-e4 until the final shared half-up rounding kernel;
    month arithmetic is exact integer year*12+month on both engines."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    monthly = (
        o.join(F.broadcast(first), "o_custkey")
        .groupBy(
            "o_custkey",
            "cohort_month",
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(
            F.expr(
                "cast(sum(cast(o_totalprice as decimal(18,4))) * 10000"
                " as bigint)"
            ).alias("rev_e4")
        )
    )
    months_since = (
        (F.year("month") - F.year("cohort_month")) * 12
        + (F.month("month") - F.month("cohort_month"))
    ).cast("long")
    return (
        monthly.groupBy(
            F.col("cohort_month").cast("date").alias("cohort_month"),
            months_since.alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            (
                F.expr("((2 * sum(rev_e4) + 100) div (200) - (case when (2 * sum(rev_e4) + 100) % (200) < 0 then 1 else 0 end))").cast("double")
                / 100.0
            ).alias("revenue"),
        )
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
    tags=("analytics", "tpch", "exists", "anti-join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the double correlated EXISTS / NOT EXISTS:
    suppliers who were the SOLE late shipper on a finalized multi-supplier
    order. 'Late' adapts to this schema's columns (no commit/receipt
    dates): shipped more than 60 days after the order date.

    Plan: the EXISTS becomes a LEFT SEMI join (another supplier touched
    the order), the NOT EXISTS a LEFT ANTI join against the late-lines
    relation (another supplier was ALSO late) — both equi-joins on
    l_orderkey with the supplier-inequality as a residual condition, so
    at 100 TB each is one hash shuffle on the order key, no correlated
    re-execution per row (Catalyst decorrelates the same way; stated
    here because the reference's engine would run the subquery per
    row). Supplier dim broadcasts into the final count."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    l1 = (
        late.join(
            l2,
            (late.l_orderkey == l2.k2) & (late.l_suppkey != l2.s2),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.k3) & (F.col("l_suppkey") != l3.s3),
            "leftanti",
        )
    )
    return (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@query(
    "q20_majority_share_suppliers",
    """
    WITH sp AS (
      SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2),
    pt AS (SELECT l_partkey, SUM(qty) AS total FROM sp GROUP BY 1),
    big AS (
      SELECT DISTINCT sp.l_suppkey
      FROM sp
      JOIN pt ON pt.l_partkey = sp.l_partkey
      JOIN part p ON p.p_partkey = sp.l_partkey AND p.p_name LIKE '%bolt%'
      WHERE 2 * sp.qty > pt.total)
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM big)
    """,
    tags=("analytics", "tpch", "semi-join"),
)
def q20_majority_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — the nested semi-join chain: European suppliers
    who shipped the MAJORITY of some 'bolt' part's 1996 volume (the
    availqty predicate adapts to this schema: 2·supplier_qty >
    part_total, an exact integer compare — no float threshold at the
    boundary).

    Plan: two stacked keyed aggregates (supplier-part, then part) on the
    date-pruned fact — the part total REUSES the first aggregate rather
    than rescanning lineitem — a broadcast part-name filter, and the
    final IN as a LEFT SEMI join into the (tiny) supplier dim. Nothing
    rescans the fact twice and the only wide shuffle is the first
    aggregate's."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty")
    )
    pt = sp.groupBy("l_partkey").agg(F.sum("qty").alias("total"))
    big = (
        sp.join(pt, "l_partkey")
        .join(F.broadcast(p), sp.l_partkey == p.p_partkey)
        .filter(2 * F.col("qty") > F.col("total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(big, s.s_suppkey == big.l_suppkey, "leftsemi")
        .select("s_name", F.col("n_name").alias("nation"))
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2),
    eur AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
    SELECT e.s_name, e.s_acctbal, e.n_name AS nation,
           p.p_partkey, p.p_brand, ps.cost
    FROM part p
    JOIN ps ON ps.partkey = p.p_partkey
    JOIN eur e ON e.s_suppkey = ps.suppkey
    WHERE p.p_size = 11 AND p.p_type = 'ECONOMY'
      AND ps.cost = (SELECT MIN(ps2.cost)
                     FROM ps ps2 JOIN eur e2 ON e2.s_suppkey = ps2.suppkey
                     WHERE ps2.partkey = p.p_partkey)
    """,
    tags=("analytics", "tpch", "correlated-subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the correlated min-cost-supplier subquery. This
    schema has no partsupp table, so supply cost derives from shipment
    history: per (part, supplier) the minimum observed unit price
    (l_extendedprice / l_quantity — one deterministic IEEE division,
    identical on both engines; MIN over identical doubles is exact, no
    sum ever forms). For size-11 ECONOMY parts, emit the European
    supplier(s) achieving the part's minimum cost.

    Plan: the correlated scalar subquery decorrelates into a per-part
    MIN aggregate joined back on (partkey, cost) equality — exact
    double equality of values produced by the same expression, so no
    epsilon. All dims broadcast; the only wide work is the one
    (part, supplier) aggregate over the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 11) & (F.col("p_type") == "ECONOMY")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # The min-cost subquery is PER PART, so the (part, supplier)
    # aggregate only needs lineitem rows of qualifying parts — push the
    # part predicate below the wide shuffle as a broadcast SEMI join
    # (the selective-dimension pushdown classic q2 plans hinge on; the
    # oracle aggregates all parts first and filters after, which is
    # equal per part but would shuffle the whole fact at 100 TB).
    li_q = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "leftsemi",
    )
    ps = li_q.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pse = ps.join(eur, ps.suppkey == eur.s_suppkey)
    mins = pse.groupBy("partkey").agg(F.min("cost").alias("mincost"))
    return (
        pse.join(mins, "partkey")
        .filter(F.col("cost") == F.col("mincost"))
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .select(
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_brand",
            "cost",
        )
    )
