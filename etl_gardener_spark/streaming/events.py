"""Structured Streaming over the events table: tumbling-window rollup with
watermarked event time.

The reference has no streaming (daily batch only); this is the extension
path for the same pipeline when data arrives continuously. The streaming
query is the exact twin of the batch ``hourly_rollup`` plan — same grouping,
same aggregates — demonstrating the batch/streaming unification Spark's
incrementalized execution gives: one logical plan, two execution modes.

Production shape: ``readStream`` from a file source or Kafka, 10-minute
watermark bounding state for late data, ``append`` mode into a partitioned
sink via ``foreachBatch`` (which would reuse ``Warehouse.
overwrite_partitions`` for exactly-once day-partition writes). For
deterministic local verification we drive the stream to completion with
``processAllAvailable`` over the static parquet file and collect from a
memory sink.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_gardener_spark.functions.localrel import local_df
from pyspark.sql import types as T

# Streaming needs an explicit schema. The testdata's ts column has shipped
# as both TIMESTAMP(NANOS) (read as raw long, then converted — see
# sources/tables.py) and plain tz-naive micros; `read_events_stream` probes
# the parquet footer and adapts.
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_EVENTS_TS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over `<sf_dir>/events.parquet` with `ts` normalized to
    TimestampType, whatever unit the file stores.

    The file streaming source wants a directory; we point it at the scale
    directory and glob-filter to the events file. The footer probe is one
    driver-side metadata read — free at any scale.
    """
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    ts_type = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    if not pat.is_timestamp(ts_type):
        raise TypeError(
            f"events.parquet ts column is {ts_type}, expected a parquet "
            "timestamp logical type (ns or us); cannot normalize to "
            "Spark TimestampType"
        )
    if ts_type.unit == "ns":
        # Scope the legacy conf to the source DEFINITION: the parquet
        # relation captures its read config at .load(), so the session
        # value can be restored immediately — drains stay correct (pinned
        # by tests/test_streaming_ingest.py::test_nanos_conf_restored)
        # and the conf no longer leaks into later batch work.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, "false")
        spark.conf.set(key, "true")
        try:
            raw = (
                spark.readStream.schema(_EVENTS_RAW_SCHEMA)
                .format("parquet")
                .option("pathGlobFilter", "events.parquet")
                .load(sf_dir)
            )
        finally:
            spark.conf.set(key, prev)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(_EVENTS_TS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw


def hourly_agg(events: DataFrame) -> DataFrame:
    """The windowed aggregation, shared by stream and batch: tumbling
    1-hour event-time windows per event_type. Value totals use the exact
    micro-unit kernel (functions/exact.py) — micro-batch boundaries
    re-associate the sum through state-store merges, which a double SUM
    answers differently per trigger schedule while the decimal sum is
    order-free."""
    from etl_gardener_spark.functions.exact import micro_display, micro_sum

    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            micro_sum(F.col("value")).alias("__s"),
        )
        .select(
            "win",
            "event_type",
            "n",
            micro_display("__s", 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the hourly rollup as a real streaming query over the events
    parquet (file micro-batches), drain it, and return the result."""
    events = read_events_stream(spark, sf_dir)
    agg = hourly_agg(events)

    from etl_gardener_spark.streaming.state import state_store_partitions

    name = f"hourly_rollup_{uuid.uuid4().hex[:8]}"
    with state_store_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Materialize before the in-memory sink table goes away.
    out = spark.table(name)
    result = local_df(spark, out.collect(), schema=out.schema)
    return result


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched per micro-batch with a
    static dimension (each user's cohort day, computed once in batch from
    the warehouse), then aggregated per (cohort_day, event_type).

    This is the streaming twin of ``cohort_retention``'s join: the static
    side is loaded once, broadcast into every micro-batch (no stream-side
    shuffle for the join), and re-resolved per batch so a slowly-changing
    dimension picks up updates between batches. State is bounded by
    |cohorts| x |event types| regardless of stream volume.
    """
    from etl_gardener_spark.sources.tables import load_table

    cohorts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
    )
    from etl_gardener_spark.functions.exact import micro_display, micro_sum

    events = read_events_stream(spark, sf_dir)
    agg = (
        events.join(F.broadcast(cohorts), "user_id")
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

    from etl_gardener_spark.streaming.state import state_store_partitions

    name = f"enrich_{uuid.uuid4().hex[:8]}"
    # Size shuffle partitions to the STATE volume (|cohorts| x |types|),
    # not the session's 32-way scan parallelism: every complete-mode
    # micro-batch opens/commits one state store per shuffle partition,
    # and at this state size the per-store fixed cost dominates —
    # measured 27 task-seconds of stage time at 32 partitions vs ~7 at 8
    # (bench round 5).
    with state_store_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return local_df(spark, out.collect(), schema=out.schema)


def stream_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases joined to the clicks that
    preceded them by at most one hour, both sides arriving as streams.

    The hard part of stream-stream joins is state retention — either side
    must buffer rows until the other side can no longer match them. The
    watermark (10 min) plus the time-interval condition bound that state:
    a click older than (purchase watermark - 1 h) can never match again
    and is evicted, so state is O(1 hour of clicks) per key regardless of
    stream length. Inner-join matches emit as soon as both rows are
    present; the watermark only drives cleanup.
    """
    def _side(event_type: str, prefix: str) -> DataFrame:
        raw = read_events_stream(spark, sf_dir)
        return (
            raw.filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "10 minutes")
        )

    p, c = _side("purchase", "purchase"), _side("click", "click")
    joined = p.join(
        c,
        (F.col("purchase_user") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    ).select(
        F.col("purchase_id"), F.col("click_id"), F.col("purchase_user").alias("user_id")
    )

    # Stream-stream joins keep FOUR state stores per shuffle partition
    # (keyed + key-with-index per side), so state-volume sizing matters
    # most here.
    from etl_gardener_spark.streaming.state import state_store_partitions

    name = f"attrib_{uuid.uuid4().hex[:8]}"
    with state_store_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return local_df(spark, out.collect(), schema=out.schema)


def stream_dedup_vs_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming decontamination / incremental dedup against a PERSISTED
    key store: the event stream left-anti joins a static relation of
    already-seen (user_id, event_type) keys (here: every combination
    observed through Jan 3, computed once in batch from the warehouse),
    emitting ONLY events whose key the corpus has never seen.

    This is the streaming twin of the batch incremental dedup operators
    (neardup.incremental_minhash_dedup): the store side is loaded once
    and broadcast into every micro-batch — no stream-side shuffle, no
    streaming state at all (the anti join is stateless row filtering,
    unlike dropDuplicatesWithinWatermark whose state grows with the key
    working set). At 100 TB the store arrives bucketed/broadcast and
    per-batch cost stays O(batch).
    """
    from etl_gardener_spark.sources.tables import load_table

    seen = (
        load_table(spark, sf_dir, "events")
        .filter(F.to_date("ts") <= F.lit("2024-01-03"))
        .select("user_id", "event_type")
        .distinct()
    )
    events = read_events_stream(spark, sf_dir)
    novel = events.join(
        F.broadcast(seen), ["user_id", "event_type"], "left_anti"
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")

    name = f"novel_{uuid.uuid4().hex[:8]}"
    q = (
        novel.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return local_df(spark, out.collect(), schema=out.schema)
