"""Behavioral-analytics and warehouse-hygiene operators over the
events/orders/embeddings tables: rolling distinct windows, sequence
transitions, concentration (Pareto) stats, global heavy hitters,
fulfillment-lag percentiles, RFM segmentation, z-score and MAD anomaly
gates, expectation-gated quarantine promotion, int8 embedding
quantization, native session windows, SCD2 dimension builds (full and
incremental), sliding-window rollups, period-over-period growth,
market-basket affinity, relative-rank cuts, grouping-id rollups,
bucketed co-located joins, and a correlated-LATERAL SQL-API entry.

These extend the reference's daily-batch surface (SURVEY.md §2.2 has no
aggregates at all) with the session/user-level rollups a production
events pipeline runs next to the gardener stages. Every query pairs with
a DuckDB oracle; deterministic tie-breaks and exact (integer / DECIMAL)
accumulation keep both engines hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gardener_spark.functions.localrel import local_df

from etl_gardener_spark.functions.exact import micro_display, micro_sum, micro_sum_sql
from etl_gardener_spark.plans.queries import query
from etl_gardener_spark.sources.tables import load_table


@query(
    "rolling_7d_active_users",
    """
    WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d AS day FROM daily)
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM days JOIN daily ON daily.d BETWEEN day - INTERVAL 6 DAY AND day
    GROUP BY day
    """,
    tags=("analytics", "rolling", "distinct"),
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per observed day (WAU). The oracle's
    range self-join is quadratic in days x users; the Spark plan uses the
    contribution-explode pattern instead: dedupe to (day, user) first —
    the only pass over raw events — then each pair contributes to at most
    7 window days via an explode of a 7-element sequence, and a distinct
    count per day finishes it. Work scales with |daily actives| x 7, not
    with |events| x window, and there is no range join anywhere — this is
    the shape that survives 100 TB of events. The spine join keeps only
    observed days so both engines report the same domain."""
    e = load_table(spark, sf_dir, "events")
    daily = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = daily.select(F.col("d").alias("day")).distinct()
    contrib = daily.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )


@query(
    "event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    cnt AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cnt
    """,
    tags=("analytics", "window", "sequence"),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event streams: for
    each (from_type, to_type), the count of consecutive occurrences and
    the row-normalized transition probability. One LEAD window (the same
    user_id shuffle sessionization pays) then a tiny |types|² aggregate;
    the probability normalizer is a window over that aggregate, never a
    second pass over events. Counts are integers, so p is a division of
    exact values — engine-identical. Tie-break (ts, event_id) makes the
    successor relation deterministic under equal timestamps."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    cnt = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    norm = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(norm), 6).alias("p"),
    )


@query(
    "revenue_pareto",
    """
    WITH cust_rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
             SUM(rev) OVER () AS total_rev,
             ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rnk,
             COUNT(*) OVER () AS n_cust
      FROM cust_rev)
    SELECT CAST(MIN(rnk) AS BIGINT) AS customers_to_80pct,
           CAST(MAX(n_cust) AS BIGINT) AS total_customers,
           ROUND(CAST(MIN(rnk) AS DOUBLE) / MAX(n_cust), 6) AS pareto_fraction
    FROM ranked
    WHERE cum_rev >= CAST(0.8 AS DECIMAL(2,1)) * total_rev
    """,
    tags=("analytics", "window", "concentration"),
)
def revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: how many top customers cover 80% of total
    order revenue (the Pareto point). The heavy input collapses to one
    row per customer BEFORE any ordering, so the global cumulative-sum
    window runs over |customers| rows — 4-5 orders of magnitude below the
    fact table; at extreme customer cardinality the same prefix-sum
    decomposes into range-partitioned partials + broadcast offsets, with
    identical semantics — implemented as operators/rank.global_running_sum
    (window-equality pinned in tests/test_rank.py). Revenue accumulates in DECIMAL end-to-end, so
    the 80% threshold comparison is exact arithmetic on both engines —
    a double cumsum could flip the boundary customer."""
    o = load_table(spark, sf_dir, "orders")
    cust_rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev")
    )
    order_w = Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
    everything = Window.partitionBy()
    ranked = cust_rev.select(
        "rev",
        F.sum("rev").over(order_w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_rev"
        ),
        F.sum("rev").over(everything).alias("total_rev"),
        F.row_number().over(order_w).alias("rnk"),
        F.count(F.lit(1)).over(everything).alias("n_cust"),
    )
    return (
        ranked.filter(
            F.col("cum_rev") >= F.lit("0.8").cast("decimal(2,1)") * F.col("total_rev")
        )
        .agg(
            F.min("rnk").cast("long").alias("customers_to_80pct"),
            F.max("n_cust").cast("long").alias("total_customers"),
            F.round(
                F.min("rnk").cast("double") / F.max("n_cust"), 6
            ).alias("pareto_fraction"),
        )
    )


@query(
    "heavy_hitter_terms",
    """
    WITH toks AS (
      SELECT lower(unnest(string_split_regex(text, '[^a-zA-Z0-9]+'))) AS tok
      FROM documents),
    f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks
          WHERE tok <> '' GROUP BY tok)
    SELECT tok, n FROM f ORDER BY n DESC, tok LIMIT 20
    """,
    tags=("llm", "text", "topk"),
)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 tokens by corpus frequency — the exact heavy-hitters
    pass a pipeline runs before stopword/boilerplate decisions. Explode +
    count is one shuffle with map-side combine (token cardinality, not
    token occurrences, crosses the wire); ORDER BY + LIMIT compiles to
    TakeOrderedAndProject — each partition keeps a 20-row heap and the
    driver merges heaps, so there is no global sort of the vocabulary.
    Deterministic tie-break on the token string."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split(F.col("text"), "[^a-zA-Z0-9]+")).alias("tok"))
        .filter(F.col("tok") != "")
        .select(F.lower("tok").alias("tok"))
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


@query(
    "ship_lag_percentiles",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(quantile_cont(lag_days, 0.50), 4) AS p50,
           ROUND(quantile_cont(lag_days, 0.90), 4) AS p90,
           ROUND(quantile_cont(lag_days, 0.99), 4) AS p99
    FROM (
      SELECT o_orderpriority,
             CAST(epoch_us(l_shipdate) - epoch_us(o_orderdate) AS DOUBLE)
               / 86400000000.0 AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
    GROUP BY o_orderpriority
    """,
    tags=("analytics", "percentile", "join"),
)
def ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority: exact
    interpolated percentiles (Spark `percentile` ≡ DuckDB quantile_cont)
    of the ship lag in days. The lag is derived from exact integer
    microsecond epochs divided once into double — identical on both
    engines. Exact percentiles sort within each of the 5 priority groups;
    at 100 TB the swap is `percentile_approx` (KLL-style mergeable
    summaries, map-side combined) at a declared error bound."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag_days = (
        (F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate")).cast("double")
        / 86400000000.0
    )
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority", lag_days.alias("lag_days")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(F.percentile("lag_days", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("lag_days", F.lit(0.90)), 4).alias("p90"),
        F.round(F.percentile("lag_days", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "dq_quarantine_promotion",
    """
    WITH ann AS (
      SELECT event_type,
             COALESCE(array_to_string(list_filter([
               CASE WHEN value IS NULL OR value < 0 OR value > 200
                    THEN 'in_range_value' END,
               CASE WHEN event_type IS NULL OR event_type NOT IN
                         ('click','view','purchase','error')
                    THEN 'in_set_event_type' END
             ], x -> x IS NOT NULL), ','), '') AS dq_reason
      FROM events)
    SELECT CASE WHEN dq_reason = '' THEN 'accepted'
                ELSE 'quarantined' END AS disposition,
           dq_reason, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM ann GROUP BY 1, 2, 3
    """,
    tags=("parity", "warehouse", "quality"),
)
def dq_quarantine_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-gated partition promotion: rows violating declarative
    row-local checks (value in [0,200], event_type in the allowed set)
    are diverted to a quarantine tier carrying their violation reasons;
    accepted rows promote clean. The verified result is BOTH tiers read
    back from parquet, so the gate covers the split projection (zero
    extra shuffles — the disposition is computed on the write's own
    scan), the audit column, and the round trip. Nothing is dropped:
    accepted + quarantined = input, and a fixed batch re-promotes
    idempotently (operators/quality.py)."""
    import tempfile as _tf

    from etl_gardener_spark.operators.quality import (
        in_range,
        in_set,
        promote_with_quarantine,
    )
    from etl_gardener_spark.warehouse import Warehouse

    import shutil as _sh

    root = _tf.mkdtemp(prefix="etl_gardener_spark_dqgate_")
    wh = Warehouse(root)
    e = load_table(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    checks = [
        in_range("value", 0, 200),
        in_set("event_type", ["click", "view", "purchase", "error"]),
    ]
    promote_with_quarantine(e, checks, wh, "exp", "events")
    acc = (
        wh.read(spark, "raw", "exp", "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.lit("accepted").alias("disposition"),
            F.lit("").alias("dq_reason"),
            "event_type",
            "n",
        )
    )
    quar = (
        wh.read(spark, "quarantine", "exp", "events")
        .groupBy("event_type", "dq_reason")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.lit("quarantined").alias("disposition"),
            "dq_reason",
            "event_type",
            "n",
        )
    )
    out = acc.unionByName(quar)
    result = local_df(spark, out.collect(), schema=out.schema)
    _sh.rmtree(root, ignore_errors=True)
    return result


@query(
    "value_outliers_by_type",
    """
    WITH s AS (
      -- VARCHAR route: DuckDB's direct DECIMAL->DOUBLE cast is up to
      -- 1 ulp off once the scaled integer exceeds 2^53; the string
      -- round-trip is correctly rounded like Spark's Decimal->double
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sxx
      FROM events WHERE value IS NOT NULL GROUP BY event_type),
    st AS (
      SELECT event_type, n, sx / n AS mean,
             sqrt((sxx - sx * sx / n) / (n - 1)) AS std
      FROM s)
    SELECT e.event_type, MAX(st.n) AS n,
           FLOOR(MAX(st.mean) * 1e6 + 0.5) / 1e6 AS mean_value,
           FLOOR(MAX(st.std) * 1e6 + 0.5) / 1e6 AS std_value,
           CAST(SUM(CASE WHEN ABS(e.value - st.mean) > 3 * st.std
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN st USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
    tags=("analytics", "anomaly", "agg"),
)
def value_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event_type — the drift/anomaly gate a
    pipeline runs on incoming value distributions. Two-pass shape chosen
    for scale: pass 1 computes per-type sufficient statistics (exact
    DECIMAL sums, so mean/std are fold-order-independent doubles); the
    5-row stats relation broadcasts back onto the second scan for the
    |z| > 3 count. The alternative — a window over partition-by-type —
    would funnel each type's entire volume through one partition; the
    broadcast-stats join keeps both passes fully parallel. All per-row
    arithmetic is identical double math on identical inputs in both
    engines."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(38,12)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
        # (oracle mirrors these casts through VARCHAR: DuckDB's direct
        # decimal->double is not correctly rounded past 2^53)
    )
    st = s.select(
        "event_type",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    return (
        e.join(F.broadcast(st), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            # engine-portable floor kernel, not ROUND: at large magnitudes
            # a mean of exact decimals can land on a 6-dp repr midpoint
            (F.floor(F.max("mean") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "mean_value"
            ),
            (F.floor(F.max("std") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "std_value"
            ),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@query(
    "emb_quantize_int8",
    """
    WITH prep AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
      FROM embeddings),
    stats AS (
      SELECT vec_id, xd,
             list_aggregate(xd, 'min') AS vmin,
             list_aggregate(xd, 'max') AS vmax
      FROM prep),
    spans AS (
      SELECT vec_id, xd, vmin,
             CASE WHEN vmax > vmin THEN vmax - vmin ELSE 1.0 END AS span
      FROM stats)
    SELECT vec_id,
           CAST(len(xd) AS BIGINT) AS dim,
           CAST(list_aggregate(list_transform(xd,
                x -> LEAST(FLOOR(((x - vmin) / span) * 256), 255)),
                'sum') AS BIGINT) AS code_sum,
           ROUND(list_aggregate(list_transform(xd,
                x -> ABS(x - (vmin + (LEAST(FLOOR(((x - vmin) / span) * 256),
                                            255) * span) / 255))),
                'sum') / len(xd), 9) AS mean_abs_err
    FROM spans
    """,
    tags=("llm", "embedding", "quantize"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector scalar quantization to int8 codes — the storage path
    that makes a 100 TB float32 vector store a 25 TB int8 one: each
    vector maps to min/span + 256-bucket codes, and the reported
    mean-absolute reconstruction error is the quality gate for switching
    ANN search to the compressed representation. Entirely JVM-side array
    lambdas (transform/aggregate) in one narrow map-only plan: no UDF,
    no shuffle, no Python. FLOOR bucketing (not round) keeps the code
    assignment deterministic across engines; all arithmetic is identical
    double expressions on both sides."""
    e = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    prep = e.select("vec_id", xd.alias("xd"))
    stats = prep.select(
        "vec_id",
        "xd",
        F.array_min("xd").alias("vmin"),
        F.array_max("xd").alias("vmax"),
    )
    spans = stats.select(
        "vec_id",
        "xd",
        "vmin",
        F.when(F.col("vmax") > F.col("vmin"), F.col("vmax") - F.col("vmin"))
        .otherwise(F.lit(1.0))
        .alias("span"),
    )
    vmin, span = F.col("vmin"), F.col("span")
    code = lambda x: F.least(F.floor(((x - vmin) / span) * 256), F.lit(255))
    err = lambda x: F.abs(x - (vmin + (code(x) * span) / 255))
    return spans.select(
        "vec_id",
        F.size("xd").cast("long").alias("dim"),
        F.aggregate(
            F.transform(F.col("xd"), code),
            F.lit(0).cast("long"),
            lambda acc, c: acc + c,
        )
        .cast("long")
        .alias("code_sum"),
        F.round(
            F.aggregate(
                F.transform(F.col("xd"), err),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size("xd"),
            9,
        ).alias("mean_abs_err"),
    )


@query(
    "customer_rfm_segments",
    """
    WITH mx AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
    rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', MAX(o_orderdate), MAX(mx.max_d)) AS BIGINT)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
      FROM orders, mx GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
      FROM rfm)
    SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY r, f, m
    """,
    tags=("analytics", "window", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile scores for recency / frequency /
    monetary per customer, rolled up to segment sizes. The fact table
    collapses to one row per customer first; each quartile score then
    comes from the DISTRIBUTED exact ranking (operators/rank
    global_row_number + arithmetic NTILE) under its own total order —
    three range-partitioned rank passes, zero single-partition windows,
    so the segmentation survives 1e9-customer cardinality. Monetary
    accumulates in DECIMAL and every order carries a custkey tie-break,
    so quartile boundaries are identical across engines."""
    from etl_gardener_spark.parallel import run_jobs
    from etl_gardener_spark.operators.rank import (
        global_row_number,
        ntile_from_rank,
    )

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("max_d"))
    rfm = (
        o.join(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("max_d"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("monetary"),
        )
        # three independent rank passes read this — one materialization
        .localCheckpoint(eager=True)
    )
    n_tot = rfm.count()  # same count the former broadcast column carried

    def _tile(name: str, key: str, order) -> DataFrame:
        # NARROW pass: each global rank shuffles only (custkey, key) —
        # a third of the former width, which chained all three passes
        # over the full widening relation (guide §2.3: project before
        # the exchange); the quartile arithmetic is unchanged.
        ranked = global_row_number(
            rfm.select("o_custkey", key), order, out_col="__rn"
        )
        return ranked.select(
            "o_custkey",
            ntile_from_rank(
                F.col("__rn"), F.lit(n_tot).cast("long"), 4
            ).alias(name),
        )

    # the three passes are independent chains (each ends in
    # global_row_number's per-partition-count collect) — overlap them
    # (guide §2.6); custkey is unique per pass, so the equi-joins below
    # recompose exactly the former per-customer (r, f, m) triple
    tiles = run_jobs([
        lambda: _tile("r", "recency_days",
                      [F.asc("recency_days"), F.asc("o_custkey")]),
        lambda: _tile("f", "frequency",
                      [F.desc("frequency"), F.asc("o_custkey")]),
        lambda: _tile("m", "monetary",
                      [F.desc("monetary"), F.asc("o_custkey")]),
    ])
    scored = tiles[0].join(tiles[1], "o_custkey").join(tiles[2], "o_custkey")
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@query(
    "session_window_rollup",
    f"""
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {micro_sum_sql("value", 2)} AS session_value
    FROM sess GROUP BY user_id, sid
    """,
    tags=("analytics", "sessionize", "native-window"),
)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window aggregate — one
    groupBy(session_window(ts, gap), user_id), no lag/cumsum window pair:
    the aggregate merges overlapping per-event windows as it combines
    partials, so it map-side-combines like any hash aggregate and is the
    same operator Structured Streaming uses for streaming sessions (one
    code path, two execution modes). Boundary semantics: session_window
    starts a NEW session when the inter-event gap equals the gap exactly,
    while the lag-based oracle extends; the testdata's microsecond
    timestamps produce no exact-1800s gaps, so both agree (and
    [[sessionize]] pins the lag-based formulation). session_value
    routes through the exact micro-unit kernel (functions/exact.py) —
    order-free and engine-portable at every midpoint."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            micro_sum(F.col("value")).alias("__s"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            micro_display("__s", 2).alias("session_value"),
        )
    )


@query(
    "scd2_user_attribute",
    """
    WITH obs AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id, k,
             CASE WHEN k IS DISTINCT FROM LAG(k) OVER w THEN 1 ELSE 0 END
               AS changed
      FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      SELECT user_id, ts, k,
             SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged),
    periods AS (
      SELECT user_id, run_id, MIN(k) AS attr_value,
             MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM runs GROUP BY user_id, run_id)
    SELECT user_id, attr_value, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, run_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, run_id)
             IS NULL AS is_current,
           n_obs
    FROM periods
    """,
    tags=("analytics", "scd2", "window"),
)
def scd2_user_attribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from an event stream: each
    user's observed attribute (props.k) is run-length encoded into
    validity periods [valid_from, valid_to) with an is_current flag —
    the MERGE-free SCD2 emulation (change-flag LAG → run-id running sum
    → period aggregate → LEAD for the closing edge, operators/scd2.py).
    Every window shares the one user_id shuffle; null-safe comparison
    makes NULL attribute transitions well-defined on both engines. The
    incremental path — new days re-encode only the users present in the
    batch against their open periods — is scd2_apply_batch, pinned
    equivalent to this full encode in tests/test_scd2.py."""
    from etl_gardener_spark.operators.scd2 import scd2_encode

    e = load_table(spark, sf_dir, "events")
    obs = e.select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return scd2_encode(obs, "user_id", "k", "ts", "event_id")


@query(
    "sliding_1h_15m_rollup",
    f"""
    WITH expanded AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15 * k)
               AS win_start
      FROM events, unnest([0, 1, 2, 3]) AS t(k))
    SELECT win_start, event_type, CAST(COUNT(*) AS BIGINT) AS n,
           {micro_sum_sql("value", 2)} AS total_value
    FROM expanded GROUP BY 1, 2
    """,
    tags=("analytics", "window", "sliding"),
)
def sliding_1h_15m_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rollup (1-hour windows every 15 minutes) via
    F.window's native slide support: each event lands in exactly 4
    overlapping windows, which Spark expands with one Generate before
    the hash aggregate — same plan shape the streaming twin would
    incrementalize. The oracle mirrors the expansion arithmetically
    (time_bucket minus k*15min; DuckDB's 2000-01-01 bucket origin is
    15-minute-commensurate with Spark's 1970 epoch, so the grids
    coincide). Value totals route through the exact micro-unit kernel
    (functions/exact.py) — this query and its streaming twin were the
    last money aggregates on a ROUND-of-decimal-SUM display, the form
    form whose midpoint behavior is engine-version-dependent (r5 driver
    failure of the twin); counts are exact."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            micro_sum(F.col("value")).alias("__s"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            micro_display("__s", 2).alias("total_value"),
        )
    )


@query(
    "nation_yoy_revenue_growth",
    """
    WITH yearly AS (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY 1, 2)
    SELECT nation, yr,
           ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
           ROUND(CAST(rev AS DOUBLE)
                 / CAST(LAG(rev) OVER (PARTITION BY nation ORDER BY yr)
                        AS DOUBLE) - 1, 6) AS yoy_growth
    FROM yearly
    """,
    tags=("analytics", "window", "period-over-period"),
)
def nation_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation — the
    period-over-period reporting pattern: aggregate to the (nation, year)
    grain first (DECIMAL-exact sums), then one LAG window over that tiny
    relation computes the growth ratio; the fact table is scanned once
    and the window ranks |nations| x |years| rows, never orders. First
    year per nation reports NULL growth (no prior period), identically
    in both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yearly = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    return yearly.select(
        "nation",
        "yr",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.lag("rev").over(w).cast("double") - 1,
            6,
        ).alias("yoy_growth"),
    )


_LATERAL_SQL = """
SELECT n.n_name AS nation, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal, c_custkey FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""


@query(
    "lateral_top2_per_nation",
    "SELECT nation, c_name, c_acctbal FROM (" + _LATERAL_SQL + ") q",
    tags=("analytics", "sql-api", "lateral"),
)
def lateral_top2_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by balance per nation expressed through the SQL
    API as a correlated LATERAL subquery with ORDER BY + LIMIT — the
    identical SQL text runs on both engines, and Spark decorrelates it
    into the same windowed top-k plan the DataFrame API's
    [[topk_per_group]] produces (one shuffle, per-group limit). Included
    to pin the engine's spark.sql surface: registry queries are
    otherwise DataFrame-built, but a reference user's SQL runs as-is."""
    from etl_gardener_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL).select("nation", "c_name", "c_acctbal")


@query(
    "top_percentile_orders",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice) AS pr
      FROM orders)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_top,
           ROUND(MIN(o_totalprice), 2) AS threshold_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM ranked WHERE pr >= 0.99
    GROUP BY o_orderpriority
    """,
    tags=("analytics", "window", "percent-rank"),
)
def top_percentile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1%-by-price orders per priority via PERCENT_RANK — the
    relative-rank window family (percent_rank/cume_dist) the ranking
    suite otherwise lacks. percent_rank is tie-stable (equal prices
    share a rank, no tie-break needed), so the >= 0.99 cut is
    deterministic on both engines; the per-priority window shuffles
    orders once and the output is a 5-row summary. The rank threshold
    1.0*(n-1) arithmetic is exact integer-derived division — identical
    across engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pr"),
    )
    return (
        ranked.filter(F.col("pr") >= 0.99)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_top"),
            F.round(F.min("o_totalprice"), 2).alias("threshold_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "value_mad_by_type",
    """
    WITH med AS (
      SELECT event_type, median(value) AS med_value
      FROM events WHERE value IS NOT NULL GROUP BY event_type),
    dev AS (
      SELECT e.event_type, med.med_value,
             ABS(e.value - med.med_value) AS adev
      FROM events e JOIN med USING (event_type)
      WHERE e.value IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(med_value), 6) AS median_value,
           ROUND(median(adev), 6) AS mad
    FROM dev GROUP BY event_type
    """,
    tags=("analytics", "robust-stats", "percentile"),
)
def value_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event_type — the robust dispersion
    gauge that, unlike [[value_outliers_by_type]]'s mean/std, a few
    extreme values cannot drag. Same two-pass broadcast-stats shape:
    pass 1 computes each type's exact median (interpolated, Spark
    `median` ≡ DuckDB `median` on doubles), the 5-row relation
    broadcasts onto pass 2's deviation scan, and a second exact median
    finishes. Exact medians sort within each small group; at 100 TB both
    passes swap to `percentile_approx` at a declared error bound."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = e.groupBy("event_type").agg(F.median("value").alias("med_value"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_value",
        F.abs(F.col("value") - F.col("med_value")).alias("adev"),
    )
    return dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.max("med_value"), 6).alias("median_value"),
        F.round(F.median("adev"), 6).alias("mad"),
    )


@query(
    "bucketed_cohort_join",
    f"""
    WITH dim AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id)
    SELECT d.cohort_day, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {micro_sum_sql("e.value", 2)} AS total_value
    FROM events e JOIN dim d USING (user_id)
    GROUP BY d.cohort_day, e.event_type
    """,
    tags=("analytics", "bucketing", "join"),
)
def bucketed_cohort_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort enrichment join executed over BUCKETED tables: both
    sides are written bucket-sorted on user_id once, and the join then
    plans with ZERO hash exchanges — the shuffle is paid at write time,
    which is the economics for a fact table joined on the same key by
    every downstream query (tests/test_bucketing.py pins the
    exchange-free plan; this entry pins the RESULTS through the bucketed
    write + catalog read path against the plain-join oracle). At 100 TB
    the bucket count scales to target-file-size x cluster parallelism;
    32 here."""
    import tempfile as _tf

    from etl_gardener_spark.warehouse import Warehouse

    import shutil as _sh

    root = _tf.mkdtemp(prefix="etl_gardener_spark_bucketed_")
    wh = Warehouse(root)
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.to_date("ts").alias("d")
    )
    dim = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    tf_name = wh.save_bucketed(e, "raw", "bexp", "events", ["user_id"], 32)
    td_name = wh.save_bucketed(dim, "raw", "bexp", "cohorts", ["user_id"], 32)
    out = (
        spark.table(tf_name)
        .join(spark.table(td_name), "user_id")
        .groupBy("cohort_day", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            micro_sum(F.col("value")).alias("__s"),
        )
        .select(
            "cohort_day",
            "event_type",
            "n",
            micro_display("__s", 2).alias("total_value"),
        )
    )
    # Materialize before dropping the scratch tables: the result is tiny
    # (cohorts x types) and the bucketed copy of events must not outlive
    # the query (repeated bench runs would otherwise accrete a full
    # events copy per invocation in /tmp).
    result = local_df(spark, out.collect(), schema=out.schema)
    for t in (tf_name, td_name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    _sh.rmtree(root, ignore_errors=True)
    return result


@query(
    "event_type_affinity",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
    per_type AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ut
                 GROUP BY event_type)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both,
           ROUND(CAST(COUNT(*) AS DOUBLE) * MAX(n.n_users)
                 / (MAX(pa.n_t) * MAX(pb.n_t)), 6) AS lift
    FROM ut a
    JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    JOIN per_type pa ON pa.event_type = a.event_type
    JOIN per_type pb ON pb.event_type = b.event_type
    CROSS JOIN n
    GROUP BY a.event_type, b.event_type
    """,
    tags=("analytics", "cooccurrence", "join"),
)
def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between event types: for each type pair,
    how many users do both, and the lift (observed co-occurrence over
    the independence expectation). The self-join runs on the DEDUPED
    (user, type) relation — at most |users| x |types| rows, many orders
    below raw events — and the per-type totals broadcast back, so raw
    events are scanned once for the distinct. All inputs to lift are
    exact integers; the single double expression is engine-identical.
    This is the audience-overlap primitive behind recommendation
    co-visitation at 100 TB, where the same plan runs on (user, item)
    with the item dimension bucketed."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    n_users = e.select(F.countDistinct("user_id").alias("n_users"))
    per_type = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    a = ut.alias("a")
    b = ut.alias("b")
    pa = per_type.select(
        F.col("event_type").alias("ta"), F.col("n_t").alias("n_a")
    )
    pb = per_type.select(
        F.col("event_type").alias("tb"), F.col("n_t").alias("n_b")
    )
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .join(F.broadcast(pa), F.col("type_a") == F.col("ta"))
        .join(F.broadcast(pb), F.col("type_b") == F.col("tb"))
        .join(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "scd2_incremental_apply",
    """
    WITH obs AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id, k,
             CASE WHEN k IS DISTINCT FROM LAG(k) OVER w THEN 1 ELSE 0 END
               AS changed
      FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      SELECT user_id, ts, k,
             SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged),
    periods AS (
      SELECT user_id, run_id, MIN(k) AS attr_value,
             MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM runs GROUP BY user_id, run_id)
    SELECT user_id, attr_value, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, run_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, run_id)
             IS NULL AS is_current,
           n_obs
    FROM periods
    """,
    tags=("analytics", "scd2", "incremental"),
)
def scd2_incremental_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL SCD2 path under the full-encode oracle: history
    is split at a mid-range day boundary, the first half encoded, and
    the second half folded in with scd2_apply_batch (untouched keys via
    one broadcast anti join; affected keys re-encode open period +
    batch). The oracle is the same full-history SQL as
    [[scd2_user_attribute]] — so the driver's hash gate itself proves
    apply-per-batch ≡ encode-all-at-once on real data, not just on the
    unit tests' crafted streams."""
    from etl_gardener_spark.operators.scd2 import scd2_apply_batch, scd2_encode

    e = load_table(spark, sf_dir, "events")
    obs = e.select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    # split at the range midpoint — both halves non-empty for any span
    lo, hi = obs.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    ).first()
    from datetime import date as _date, timedelta

    if lo is None:  # empty input: nothing to split, nothing to encode
        lo = hi = _date(1970, 1, 1)
    cut = lo + timedelta(days=(hi - lo).days // 2) if hi > lo else lo
    first = obs.filter(F.to_date("ts") <= F.lit(cut.isoformat()).cast("date"))
    second = obs.filter(F.to_date("ts") > F.lit(cut.isoformat()).cast("date"))
    periods = scd2_encode(first, "user_id", "k", "ts", "event_id")
    return scd2_apply_batch(periods, second, "user_id", "k", "ts", "event_id")


@query(
    "rollup_grouping_id",
    """
    SELECT COALESCE(o_orderstatus, '?') AS status,
           COALESCE(o_orderpriority, '?') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
             AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("analytics", "agg", "rollup", "grouping-id"),
)
def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with an explicit grouping id: gid distinguishes a NULL
    grouping slot that means 'subtotal' (grouping()=1) from a NULL that
    is real data — the disambiguation COALESCE-labeling alone cannot
    give when the dimension domain could itself contain the label.
    gid ∈ {0 detail, 1 per-status subtotal, 3 grand total}; both engines
    compute it as grouping(status)*2 + grouping(priority) over one
    Expand pass of the scan. Sums accumulate in DECIMAL."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("long")
            .alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"),
                2,
            ).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("?")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("?")).alias("priority"),
            "gid",
            "n_orders",
            "total",
        )
    )


@query(
    "snapshot_diff_events",
    """
    WITH old AS (
      SELECT event_id, ts, user_id, event_type, value FROM events
      WHERE CAST(ts AS DATE) <= DATE '2024-01-20'),
    new AS (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'error' THEN value + 1.0 ELSE value END
               AS value
      FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-06')
    SELECT CASE WHEN o.event_id IS NULL THEN 'insert'
                WHEN n.event_id IS NULL THEN 'delete'
                ELSE 'update' END AS change,
           COALESCE(n.event_id, o.event_id) AS event_id,
           CASE WHEN n.event_id IS NULL THEN o.ts ELSE n.ts END AS ts,
           CASE WHEN n.event_id IS NULL THEN o.user_id ELSE n.user_id END
             AS user_id,
           CASE WHEN n.event_id IS NULL THEN o.event_type ELSE n.event_type END
             AS event_type,
           CASE WHEN n.event_id IS NULL THEN o.value ELSE n.value END AS value
    FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
    WHERE o.event_id IS NULL OR n.event_id IS NULL
       OR o.ts IS DISTINCT FROM n.ts
       OR o.user_id IS DISTINCT FROM n.user_id
       OR o.event_type IS DISTINCT FROM n.event_type
       OR o.value IS DISTINCT FROM n.value
    """,
    tags=("analytics", "cdc", "diff"),
)
def snapshot_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC (operators/diff.snapshot_diff): two versions of
    the events table — the new load drops the first five days, adds ten
    new ones, and corrects every error event's value — produce a delta of
    insert/update/delete rows keyed by event_id. One full-outer shuffle
    join, row-local null-safe change classification; deletes carry the
    last-seen old values. The value correction is an exact double add
    (+1.0), deterministic across engines — no rounding anywhere."""
    from etl_gardener_spark.operators.diff import snapshot_diff

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    old = e.filter(F.to_date("ts") <= F.lit("2024-01-20"))
    new = e.filter(F.to_date("ts") >= F.lit("2024-01-06")).withColumn(
        "value",
        F.when(F.col("event_type") == "error", F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    return snapshot_diff(
        old, new, keys=["event_id"], compare_cols=["ts", "user_id", "event_type", "value"]
    )


@query(
    "snapshot_apply_roundtrip",
    """
    SELECT event_id, ts, user_id, event_type,
           CASE WHEN event_type = 'error' THEN value + 1.0 ELSE value END
             AS value
    FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-06'
    """,
    tags=("analytics", "cdc", "diff"),
)
def snapshot_apply_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC roundtrip, driver-verified: apply_diff replays the delta from
    [[snapshot_diff_events]] onto the old snapshot and must reproduce the
    new snapshot EXACTLY — the oracle is simply the new snapshot's
    definition, so the hash gate proves delta-shipping loses nothing.
    One full-outer join (diff) + one anti join + union (apply)."""
    from etl_gardener_spark.operators.diff import apply_diff, snapshot_diff

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    old = e.filter(F.to_date("ts") <= F.lit("2024-01-20"))
    new = e.filter(F.to_date("ts") >= F.lit("2024-01-06")).withColumn(
        "value",
        F.when(F.col("event_type") == "error", F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    delta = snapshot_diff(
        old, new, keys=["event_id"],
        compare_cols=["ts", "user_id", "event_type", "value"],
    )
    return apply_diff(old, delta, keys=["event_id"])


@query(
    "session_error_counts",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps
    ), sessions AS (
      SELECT user_id, session_id,
             MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM sess GROUP BY user_id, session_id
    )
    SELECT s.user_id, s.session_id, s.session_start, s.session_end,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_errors
    FROM sessions s LEFT JOIN events e
      ON e.user_id = s.user_id AND e.event_type = 'error'
     AND e.ts >= s.session_start AND e.ts <= s.session_end
    GROUP BY 1, 2, 3, 4
    """,
    tags=("analytics", "interval", "join"),
)
def session_error_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (operators/intervals.interval_point_join):
    error events counted inside each session's [start, end] bounds. The
    operator bucketizes time so containment is an equi-join on
    (user_id, hour-bucket) with the range predicate as a codegen'd
    residual — no per-key interval x point cross product; the oracle is
    the naive range join. Sessions come from the same microsecond-exact
    sessionization as [[sessionize]]."""
    from etl_gardener_spark.operators.intervals import interval_point_join
    from etl_gardener_spark.plans.queries import sessionize

    sessions = sessionize(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    errors = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("user_id", F.col("ts").alias("err_ts"),
                F.col("event_id").alias("err_id"))
    )
    joined = interval_point_join(
        sessions,
        errors,
        on="user_id",
        start="session_start",
        end="session_end",
        ts="err_ts",
        bucket_seconds=3600,
        how="left",
    )
    return joined.groupBy(
        "user_id", "session_id", "session_start", "session_end"
    ).agg(F.count("err_id").cast("long").alias("n_errors"))


@query(
    "retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
      GROUP BY user_id),
    cohorts AS (
      SELECT user_id, date_trunc('week', first_day) AS cohort_week
      FROM first_seen),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS week
      FROM events),
    joined AS (
      SELECT c.cohort_week,
             CAST(datediff('day', c.cohort_week, a.week) // 7 AS BIGINT)
               AS weeks_since,
             a.user_id
      FROM cohorts c JOIN activity a USING (user_id)),
    sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM cohorts GROUP BY cohort_week)
    SELECT CAST(j.cohort_week AS DATE) AS cohort_week, j.weeks_since,
           CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_active,
           s.cohort_size,
           ROUND(CAST(COUNT(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size, 4)
             AS retention
    FROM joined j JOIN sizes s USING (cohort_week)
    GROUP BY j.cohort_week, j.weeks_since, s.cohort_size
    """,
    tags=("analytics", "retention", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic retention matrix: users cohorted by first-seen ISO
    week; each cell = share of the cohort active N weeks later. Three
    keyed aggregates (first-seen, weekly activity, cell counts) — the
    cohort dimension joins broadcast (|cohorts| rows), the fact never
    shuffles twice on the same key. Retention is an exact integer ratio
    rounded at 4 dp on both engines."""
    e = load_table(spark, sf_dir, "events")
    first_seen = (
        e.select("user_id", F.to_date("ts").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("first_day"))
    )
    cohorts = first_seen.select(
        "user_id", F.date_trunc("week", "first_day").cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).cast("date").alias("week")
    ).distinct()
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    joined = cohorts.join(activity, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("long")
        .alias("weeks_since"),
        "user_id",
    )
    return (
        joined.groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "weeks_since",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


@query(
    "dau_mau_stickiness",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM du),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d),
    mau AS (
      SELECT days.d, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS mau
      FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 29 DAY AND days.d
      GROUP BY days.d)
    SELECT dau.d AS date, dau.dau, mau.mau,
           ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 4) AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    """,
    tags=("analytics", "retention"),
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day. The 30-day rolling distinct uses the
    contribution-explode shape (each (user, day) contributes to the next
    30 days, then one countDistinct per day) — linear in daily actives,
    no 30-way range self-join; the oracle mirrors with an interval join.
    Exact integer ratio, rounded at 4 dp."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    days = du.select("d").distinct()
    contrib = du.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 29))).alias(
            "w_day"
        ),
        "user_id",
    )
    mau = (
        contrib.join(F.broadcast(days), contrib.w_day == days.d)
        .groupBy("w_day")
        .agg(F.countDistinct("user_id").cast("long").alias("mau"))
    )
    return (
        dau.join(mau, dau.d == mau.w_day)
        .select(
            F.col("d").alias("date"),
            "dau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 4).alias(
                "stickiness"
            ),
        )
    )


@query(
    "dq_referential_integrity",
    """
    SELECT 'lineitem_orphans' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders_childless',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                   WHERE l.l_orderkey = o.o_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_unknown_customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    """,
    tags=("quality", "integrity"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphaned facts (lineitem
    rows whose order is missing), childless orders, and orders pointing
    at unknown customers — each an ANTI join projected to its key before
    the join, so only keys cross the wire (the decorrelated NOT EXISTS
    shape the TPC-H queries pin). Small sides broadcast; output is the
    3-row violation report a DQ gate thresholds on."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def count_anti(left, lkey, right, rkey):
        return (
            left.select(F.col(lkey))
            .join(
                F.broadcast(right.select(F.col(rkey)).distinct()),
                F.col(lkey) == F.col(rkey),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )

    checks = [
        ("lineitem_orphans", count_anti(li, "l_orderkey", o, "o_orderkey")),
        ("orders_childless", count_anti(o, "o_orderkey", li, "l_orderkey")),
        ("orders_unknown_customer", count_anti(o, "o_custkey", c, "c_custkey")),
    ]
    out = None
    for name, df in checks:
        row = df.select(F.lit(name).alias("check_name"), "n_violations")
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "props_key_census",
    """
    WITH keys AS (
      SELECT unnest(json_keys(props)) AS key FROM events
      WHERE props IS NOT NULL)
    SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM events WHERE props IS NOT NULL), 4)
             AS presence
    FROM keys GROUP BY key
    """,
    tags=("quality", "schema-drift", "json"),
)
def props_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift census for the semi-structured column: which JSON keys
    appear in events.props and how often — the report that catches a
    producer silently adding/renaming fields. One explode of parsed keys
    + one keyed aggregate; the denominator joins as a broadcast scalar."""
    e = load_table(spark, sf_dir, "events")
    nn = e.filter(F.col("props").isNotNull())
    total = nn.agg(F.count(F.lit(1)).cast("double").alias("__tot"))
    keys = nn.select(
        F.explode(
            F.map_keys(
                F.from_json(F.col("props"), "map<string,string>")
            )
        ).alias("key")
    )
    return (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__tot"), 4).alias("presence"),
        )
    )


@query(
    "top_event_paths",
    """
    WITH paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path ASC) AS BIGINT)
             AS rank
    FROM paths GROUP BY path QUALIFY rank <= 20
    """,
    tags=("analytics", "paths", "sequence"),
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-journey path analysis: each user's complete ordered
    event-type sequence rendered as a path string, then the 20 most
    common journeys. Order inside the path is pinned by the explicit
    (ts, event_id) sort key inside array_sort — never by partition
    arrival. One user-keyed aggregate plus a tiny distinct-path top-k."""
    e = load_table(spark, sf_dir, "events")
    paths = (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    w = Window.orderBy(F.col("n_users").desc(), F.col("path").asc())
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
    )


@query(
    "debounce_events",
    """
    SELECT event_id, ts, user_id, event_type, value FROM (
      SELECT event_id, ts, user_id, event_type, value,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events) t
    WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 300000000
    """,
    tags=("analytics", "dedup", "debounce"),
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: drop events repeated by the same (user, type)
    within 5 minutes of the previous KEPT-OR-DROPPED occurrence (simple
    lag-gap form — the stateless one-window variant; the stateful
    anchor-based variant is the streaming sessionizer's job). Gap math in
    integer microseconds on both engines (the sessionize lesson). One
    key exchange."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return (
        e.withColumn("__gap", gap)
        .filter(F.col("__gap").isNull() | (F.col("__gap") > 300_000_000))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "top_orders_with_ties",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 0) AS o_totalprice,
             CAST(RANK() OVER (PARTITION BY o_custkey
                               ORDER BY ROUND(o_totalprice, 0) DESC) AS BIGINT)
               AS rk
      FROM orders) t WHERE rk <= 2
    """,
    tags=("analytics", "window", "rank"),
)
def top_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK()-with-ties top-k (vs topk_per_group's ROW_NUMBER): price
    rounded to whole units so ties actually occur, and tied orders are
    ALL kept — the gap-rank semantics. rank<=k still qualifies for
    WindowGroupLimit's bounded per-key heap."""
    o = load_table(spark, sf_dir, "orders")
    rounded = F.round(F.col("o_totalprice"), 0)
    w = Window.partitionBy("o_custkey").orderBy(rounded.desc())
    return (
        o.select("o_custkey", "o_orderkey", rounded.alias("o_totalprice"))
        .withColumn("rk", F.rank().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
    )


@query(
    "hourly_seasonal_anomalies",
    """
    WITH hourly AS (
      SELECT CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS hod, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3),
    season AS (
      SELECT hod, event_type, AVG(n) AS mu, STDDEV_POP(n) AS sigma,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM hourly GROUP BY hod, event_type)
    SELECT h.d AS date, CAST(h.hod AS BIGINT) AS hour, h.event_type, h.n,
           ROUND((h.n - s.mu) / s.sigma, 4) AS z
    FROM hourly h JOIN season s USING (hod, event_type)
    WHERE s.n_days >= 7 AND s.sigma > 0
      AND ABS(ROUND((h.n - s.mu) / s.sigma, 4)) > 3
    """,
    tags=("analytics", "anomaly", "seasonal"),
)
def hourly_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly gate: each (day, hour, type) count scored against
    the baseline of ITS OWN hour-of-day x type bucket (mean ± 3 sigma) —
    the seasonality-aware refinement of the global z-score gate
    (value_outliers_by_type). The seasonal profile is a tiny aggregate
    (24 x |types| rows) broadcast back onto the hourly counts; buckets
    with under a week of history or zero variance are excluded rather
    than scored against a meaningless baseline."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.to_date("ts").alias("d"),
            F.hour("ts").alias("hod"),
            "event_type",
        )
        .groupBy("d", "hod", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    season = hourly.groupBy("hod", "event_type").agg(
        F.avg("n").alias("mu"),
        F.stddev_pop("n").alias("sigma"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    # membership decided on the 4-dp ROUNDED z (the display value) so
    # fold-order noise in the double mu/sigma can't flip boundary rows
    # between engines (same discipline as emb_norm_outliers).
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(season), ["hod", "event_type"])
        .filter(
            (F.col("n_days") >= 7)
            & (F.col("sigma") > 0)
            & (F.abs(F.round(z, 4)) > 3)
        )
        .select(
            F.col("d").alias("date"),
            F.col("hod").cast("long").alias("hour"),
            "event_type",
            "n",
            F.round(z, 4).alias("z"),
        )
    )


@query(
    "session_conversion_rate",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_type,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps
    ), per AS (
      SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM sess GROUP BY user_id, session_id
    )
    SELECT LEAST(CAST(n_events AS BIGINT), 10) AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 4)
             AS conversion_rate
    FROM per GROUP BY 1
    """,
    tags=("analytics", "sessionize", "funnel"),
)
def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate by session size: the sessionizer (same
    microsecond-gap windows as [[sessionize]]) feeds a per-session
    converted flag, bucketed by event count (capped at 10+) — the
    engagement-vs-conversion curve every growth team asks for. All
    windows share one user_id exchange; the bucket aggregate is tiny."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    per = (
        e.withColumn("__new", new_session)
        .withColumn("session_id", F.sum("__new").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    return (
        per.groupBy(
            F.least(F.col("n_events"), F.lit(10)).cast("long").alias("size_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .select(
            "size_bucket",
            "n_sessions",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double") / F.col("n_sessions"), 4
            ).alias("conversion_rate"),
        )
    )


@query(
    "weekly_mixture_drift",
    """
    WITH weekly AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS week, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT week, CAST(SUM(n) AS BIGINT) AS tot FROM weekly GROUP BY week),
    dense AS (
      SELECT t.week, ty.event_type, COALESCE(w.n, 0) AS n, t.tot
      FROM tot t
      CROSS JOIN (SELECT DISTINCT event_type FROM events) ty
      LEFT JOIN weekly w ON w.week = t.week AND w.event_type = ty.event_type),
    lagged AS (
      SELECT week, event_type, n, tot,
             LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
             LAG(tot) OVER (PARTITION BY event_type ORDER BY week)
               AS prev_tot
      FROM dense)
    SELECT CAST(week AS DATE) AS week,
           ROUND(CAST(SUM(ABS(n * prev_tot - prev_n * tot)) AS DOUBLE)
                 / (2.0 * ANY_VALUE(tot) * ANY_VALUE(prev_tot)), 6)
             AS tv_distance,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM lagged WHERE prev_n IS NOT NULL
    GROUP BY week
    """,
    tags=("analytics", "monitoring", "drift"),
)
def weekly_mixture_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus/mixture drift monitor: week-over-week total-variation
    distance between event-type share distributions — the alarm that a
    producer's mix shifted (new bot, dropped source). The (week x type)
    grid is densified (absent types count 0) so LAG always reads the
    immediately-previous week, and the half-L1 is computed over a COMMON
    denominator as an exact integer-numerator sum — fold-order-free, one
    double division per week (the sessionize representation lesson).
    Generalizes directly to the documents table's source mix."""
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.select(
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
            "event_type",
        )
        .groupBy("week", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = weekly.groupBy("week").agg(F.sum("n").cast("long").alias("tot"))
    types = e.select("event_type").distinct()
    dense = (
        tot.crossJoin(F.broadcast(types))
        .join(weekly, ["week", "event_type"], "left")
        .select(
            "week", "event_type", F.coalesce("n", F.lit(0)).alias("n"), "tot"
        )
    )
    w = Window.partitionBy("event_type").orderBy("week")
    lagged = dense.withColumn("prev_n", F.lag("n").over(w)).withColumn(
        "prev_tot", F.lag("tot").over(w)
    )
    return (
        lagged.filter(F.col("prev_n").isNotNull())
        .groupBy("week")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("n") * F.col("prev_tot")
                        - F.col("prev_n") * F.col("tot")
                    )
                ).cast("double")
                / (
                    F.lit(2.0)
                    * F.first("tot").cast("double")
                    * F.first("prev_tot").cast("double")
                ),
                6,
            ).alias("tv_distance"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
        )
    )


@query(
    "events_dow_hour_heatmap",
    """
    SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR((CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e6 / CAST(COUNT(value) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS avg_value
    FROM events GROUP BY 1, 2
    """,
    tags=("analytics", "seasonality"),
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour activity heatmap — the seasonality profile the
    anomaly gate's baseline (hourly_seasonal_anomalies) summarizes. One
    map-side-combined aggregate to a 168-cell grid; AVG over doubles is
    fold-order-sensitive in the last ulp so it is rounded at 4 dp (well
    above ulp noise for these magnitudes, the repo-wide float policy).
    Day numbering is ISO (1=Monday) on BOTH engines — Spark's default
    dayofweek() is Sunday-1 while DuckDB's is Sunday-0, so the portable
    pair is weekday()+1 vs isodow()."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            (F.weekday(F.to_date("ts")) + 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.expr(
                "floor((cast(sum(cast(floor(value * 1e6 + 0.5)"
                " as decimal(38,0))) as double) / 1e6"
                " / cast(count(value) as double)) * 1e4 + 0.5)"
            )
            / 1e4
            ).alias("avg_value"),
        )
    )


@query(
    "error_streaks",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
             CASE WHEN (event_type = 'error')
                       <> COALESCE(LAG(event_type = 'error') OVER w, FALSE)
                  THEN 1 ELSE 0 END AS flip
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      SELECT user_id, ts, is_err,
             SUM(flip) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged),
    streaks AS (
      SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS len,
             MIN(ts) AS started
      FROM runs WHERE is_err = 1 GROUP BY user_id, run_id)
    SELECT user_id, len, started
    FROM streaks WHERE len >= 3
    """,
    tags=("analytics", "window", "streaks", "anomaly"),
)
def error_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-error streak detection per user (run-length encoding
    of the error flag: flip-flag LAG -> run-id cumsum -> run aggregate,
    the same one-exchange window discipline as SCD2): streaks of 3+ are
    the client-on-fire signal a reliability alert keys on. The flip
    comparison COALESCEs the first row so both engines agree a leading
    run starts a flip."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_err = (F.col("event_type") == "error").cast("int")
    prev = F.lag(F.col("event_type") == "error").over(w)
    flip = F.when(
        (F.col("event_type") == "error") != F.coalesce(prev, F.lit(False)), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    runs = (
        e.withColumn("is_err", is_err)
        .withColumn("flip", flip)
        .withColumn("run_id", F.sum("flip").over(run))
    )
    return (
        runs.filter(F.col("is_err") == 1)
        .groupBy("user_id", "run_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("len"),
            F.min("ts").alias("started"),
        )
        .filter(F.col("len") >= 3)
        .select("user_id", "len", "started")
    )


@query(
    "dq_benford_value",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(value AS DOUBLE) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM events WHERE value >= 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM digits)
    SELECT d.digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.total), 4)
             AS obs_share,
           ROUND(log10(1.0 + 1.0 / d.digit), 4) AS benford_share
    FROM digits d CROSS JOIN tot t
    GROUP BY d.digit
    """,
    tags=("quality", "benford", "fraud"),
)
def dq_benford_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the value column: observed first-significant-
    digit shares next to the Benford expectation log10(1 + 1/d) — the
    classic organic-vs-fabricated screen for numeric columns (a synthetic
    uniform distribution fails it loudly, which is itself the point: the
    report SHOWS the generator's signature). Restricted to value >= 1 so
    the leading character IS the first significant digit on both engines'
    double-to-string renderings. One map-side-combined 9-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    digits = (
        e.filter(F.col("value") >= 1)
        .select(
            F.substring(F.col("value").cast("double").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
    )
    tot = digits.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 4).alias(
                "obs_share"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias(
                "benford_share"
            ),
        )
    )


@query(
    "ab_variant_conversion",
    """
    WITH assign AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 2 = 0 THEN 'control' ELSE 'treatment' END
               AS variant
      FROM (SELECT DISTINCT user_id FROM events)),
    outcome AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id)
    SELECT a.variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(o.converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(o.converted) AS DOUBLE) / COUNT(*), 4)
             AS conversion_rate,
           CAST(SUM(o.n_events) AS BIGINT) AS total_events
    FROM assign a JOIN outcome o USING (user_id)
    GROUP BY a.variant
    """,
    tags=("analytics", "experiment", "ab-test"),
)
def ab_variant_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically bucketed into
    control/treatment by the same md5 hash the split machinery uses
    (stable assignment across sessions and reruns — the property an
    experiment platform cannot live without), then per-variant conversion
    and exposure. Assignment is a narrow projection over the distinct-user
    set; outcomes are one user-keyed aggregate."""
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 2
    )
    assign = users.select(
        "user_id",
        F.when(bucket == 0, "control").otherwise("treatment").alias("variant"),
    )
    outcome = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        assign.join(outcome, "user_id")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.round(
                F.sum("converted").cast("double") / F.count(F.lit(1)), 4
            ).alias("conversion_rate"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
    )


@query(
    "user_hour_entropy",
    """
    WITH hourly AS (
      SELECT user_id, EXTRACT(hour FROM ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS nh
      FROM events GROUP BY 1, 2),
    per AS (
      SELECT user_id,
             CAST(SUM(nh) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(nh * ln(CAST(nh AS DOUBLE)) * 1000000.0
                                 + 0.5) AS BIGINT)) AS BIGINT) AS s_e6
      FROM hourly GROUP BY user_id)
    SELECT user_id, n,
           ROUND(ln(CAST(n AS DOUBLE))
                 - (CAST(s_e6 AS DOUBLE) / 1000000.0) / n, 4)
             AS hour_entropy,
           (ln(CAST(n AS DOUBLE))
            - (CAST(s_e6 AS DOUBLE) / 1000000.0) / n) > 3.0 AS too_uniform
    FROM per WHERE n >= 48
    """,
    tags=("analytics", "anomaly", "bot", "entropy"),
)
def user_hour_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot screen via activity-hour entropy: humans are diurnal (entropy
    well below the uniform bound ln 24 ~ 3.18), schedulers and bots are
    flat. Entropy decomposes as ln(n) - (1/n) * sum(n_h * ln(n_h)) so the
    only order-sensitive sum is over per-hour terms — each term is
    fixed-point-scaled to integer micros and summed EXACTLY (the repo's
    fold-order discipline), leaving one double expression per user.
    Users need >= 48 events for the estimate to mean anything; flagged =
    entropy above 3.0 nats."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select("user_id", F.hour("ts").alias("h"))
        .groupBy("user_id", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("nh"))
    )
    term_e6 = F.floor(
        F.col("nh") * F.log(F.col("nh").cast("double")) * 1e6 + 0.5
    ).cast("long")
    per = hourly.groupBy("user_id").agg(
        F.sum("nh").cast("long").alias("n"),
        F.sum(term_e6).cast("long").alias("s_e6"),
    )
    ent = F.log(F.col("n").cast("double")) - (
        F.col("s_e6").cast("double") / 1e6
    ) / F.col("n")
    return (
        per.filter(F.col("n") >= 48)
        .select(
            "user_id",
            "n",
            F.round(ent, 4).alias("hour_entropy"),
            (ent > 3.0).alias("too_uniform"),
        )
    )


_QSKETCH_ACC = 200  # percentile_approx accuracy: rank error <= n/ACC


@query(
    "ship_lag_quantile_sketch",
    f"""
    WITH t AS (
      SELECT o_orderpriority,
             CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate))
                  // 86400000000 AS BIGINT) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    r AS (
      SELECT o_orderpriority, lag_days,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY lag_days) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM t)
    SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN lag_days END) AS BIGINT) AS exact_p50,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                         THEN lag_days END) AS BIGINT) AS exact_p95,
           TRUE AS p50_ok, TRUE AS p95_ok
    FROM r GROUP BY o_orderpriority
    """,
    tags=("analytics", "percentile", "sketch", "bound-check"),
)
def ship_lag_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile certification — the third re-aggregatable
    summary family next to HLL distincts and mergeable histograms:
    ``percentile_approx`` (Spark's Greenwald-Khanna variant, mergeable
    map-side, the 100 TB replacement for exact sorts) carries a
    PUBLISHED guarantee of rank error <= n/accuracy. The query computes
    the approx p50/p95 of the integer ship-lag days per order priority
    AND the exact values at the guarantee's rank window edges, then
    emits ``p50_ok`` / ``p95_ok`` = approx lies between the values at
    ranks ceil(q*n) -/+ ceil(n/accuracy) — the oracle pins the exact
    sides (discrete rank-based percentiles of integer lags: engine-exact)
    and constant-TRUE flags, so a hash mismatch means the sketch broke
    its contract. Integer day lags keep every compared value exact."""
    from pyspark.sql import Window

    acc = _QSKETCH_ACC
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.expr(
        "(unix_micros(l_shipdate) - unix_micros(o_orderdate))"
        " div 86400000000"
    ).cast("long")
    t = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority", lag.alias("lag_days")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("lag_days")
    wn = Window.partitionBy("o_orderpriority")
    r = t.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    err = F.ceil(F.col("n") / acc)

    def at_rank(rank_expr):
        return F.max(F.when(F.col("rn") == rank_expr, F.col("lag_days")))

    def q_cols(q: float, name: str):
        target = F.ceil(q * F.col("n"))
        lo = F.greatest(F.lit(1), target - err)
        hi = F.least(F.col("n"), target + err)
        return {
            f"exact_{name}": at_rank(target).cast("long"),
            f"__lo_{name}": at_rank(lo),
            f"__hi_{name}": at_rank(hi),
        }

    c50, c95 = q_cols(0.5, "p50"), q_cols(0.95, "p95")
    agg = r.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_lines"),
        c50["exact_p50"].alias("exact_p50"),
        c95["exact_p95"].alias("exact_p95"),
        c50["__lo_p50"].alias("__lo50"),
        c50["__hi_p50"].alias("__hi50"),
        c95["__lo_p95"].alias("__lo95"),
        c95["__hi_p95"].alias("__hi95"),
        F.percentile_approx("lag_days", 0.5, acc).alias("__a50"),
        F.percentile_approx("lag_days", 0.95, acc).alias("__a95"),
    )
    return agg.select(
        "o_orderpriority",
        "n_lines",
        "exact_p50",
        "exact_p95",
        (
            (F.col("__a50") >= F.col("__lo50"))
            & (F.col("__a50") <= F.col("__hi50"))
        ).alias("p50_ok"),
        (
            (F.col("__a95") >= F.col("__lo95"))
            & (F.col("__a95") <= F.col("__hi95"))
        ).alias("p95_ok"),
    )


_CMS_ROWS = 4
_CMS_W = 512


def _cms_pos_sql(r: int) -> str:
    """DuckDB mirror of the Spark CMS bucket kernel for hash row ``r``
    (the playbook's portable md5 bucket: first 8 hex chars as int64)."""
    return (
        f"('0x' || substr(md5('cms{r}:' || CAST(user_id AS VARCHAR)), 1, 8))"
        f"::BIGINT % {_CMS_W}"
    )


@query(
    "weekly_user_cms_rollup",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, r.i AS r,
             {'CASE r.i ' + ' '.join(f'WHEN {r} THEN ' + _cms_pos_sql(r) for r in range(_CMS_ROWS)) + ' END'} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events, range({_CMS_ROWS}) r(i)
      GROUP BY 1, 2, 3),
    weekly AS (
      SELECT CAST(date_trunc('week', d) AS DATE) AS week, r, bucket,
             CAST(SUM(n) AS BIGINT) AS n
      FROM daily GROUP BY 1, 2, 3),
    exact AS (
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
             user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY 1, 2),
    top AS (
      SELECT week, user_id, exact_n,
             CAST(ROW_NUMBER() OVER (PARTITION BY week
                  ORDER BY exact_n DESC, user_id ASC NULLS LAST)
                  AS BIGINT) AS rnk
      FROM exact QUALIFY rnk <= 10),
    probe AS (
      SELECT t.week, t.user_id, t.exact_n, t.rnk, r.i AS r,
             {'CASE r.i ' + ' '.join(f'WHEN {r} THEN ' + _cms_pos_sql(r) for r in range(_CMS_ROWS)) + ' END'} AS bucket
      FROM top t, range({_CMS_ROWS}) r(i)),
    est AS (
      SELECT p.week, p.user_id, p.exact_n, p.rnk,
             CAST(MIN(w.n) AS BIGINT) AS cms_n
      FROM probe p JOIN weekly w
        ON p.week = w.week AND p.r = w.r AND p.bucket = w.bucket
      GROUP BY 1, 2, 3, 4)
    SELECT week, user_id, rnk, exact_n, cms_n,
           CAST(cms_n - exact_n AS BIGINT) AS overcount,
           cms_n >= exact_n AS overestimate_ok
    FROM est
    """,
    tags=("analytics", "sketch", "rollup", "heavy-hitter"),
)
def weekly_user_cms_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch weekly rollup — the FOURTH re-aggregatable
    summary family, completing the sketch suite next to HLL distincts
    ([[weekly_users_sketch_rollup]]), mergeable histograms
    ([[weekly_value_histogram_rollup]]) and GK quantiles
    ([[ship_lag_quantile_sketch]]): per-day 4x512 CMS matrices of
    per-user event counts MERGE to weekly by cell-wise sum — at 100 TB
    the weekly/monthly ladder reads |days| x 2048 cells, never the
    event stream — and the weekly top-10 users (exact count, id
    tie-break) are then estimated off the merged sketch alone. The CMS
    invariant est >= exact (hash collisions only ever ADD) is emitted
    as a constant-TRUE ``overestimate_ok`` flag, and ``overcount`` is
    itself deterministic (md5-derived bucket functions, no RNG), so the
    whole row set is bit-exact against the oracle. All counts are
    integers; the only windows are the per-week top-10 (WindowGroupLimit
    heap) and nothing else ranks globally."""
    e = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.to_date("ts")).cast("date").alias("week")

    def bucket(r: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"cms{r}:"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    rows_arr = F.array(
        *[
            F.struct(F.lit(r).cast("long").alias("r"), bucket(r).alias("bucket"))
            for r in range(_CMS_ROWS)
        ]
    )
    daily = (
        e.select(F.to_date("ts").alias("d"), F.explode(rows_arr).alias("rb"))
        .groupBy("d", "rb.r", "rb.bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    weekly = (
        daily.groupBy(
            F.date_trunc("week", "d").cast("date").alias("week"), "r", "bucket"
        )
        .agg(F.sum("n").cast("long").alias("n"))
    )
    exact = e.groupBy(week, "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    # asc_nulls_last pins the tie-break for a NULL user_id group: Spark
    # ASC defaults NULLS FIRST, DuckDB NULLS LAST (differential-fuzz
    # finding, seed 1)
    w = Window.partitionBy("week").orderBy(
        F.col("exact_n").desc(), F.col("user_id").asc_nulls_last()
    )
    top = (
        exact.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
    )
    probe = top.select(
        "week", "user_id", "exact_n", "rnk", F.explode(rows_arr).alias("rb")
    ).select("week", "user_id", "exact_n", "rnk", "rb.r", "rb.bucket")
    est = (
        probe.join(weekly, ["week", "r", "bucket"])
        .groupBy("week", "user_id", "exact_n", "rnk")
        .agg(F.min("n").cast("long").alias("cms_n"))
    )
    return est.select(
        "week",
        "user_id",
        "rnk",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).cast("long").alias("overcount"),
        (F.col("cms_n") >= F.col("exact_n")).alias("overestimate_ok"),
    )
