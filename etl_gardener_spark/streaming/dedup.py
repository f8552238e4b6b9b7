"""Streaming deduplication over the events stream: state-bounded
dropDuplicatesWithinWatermark on a (date, user_id, event_type) key.

The batch dedup family (operators/dedup.py) rewrites a finished day
partition; this is the same idempotence contract for data that arrives
continuously — emit each key once as it first appears, with the dedup
state BOUNDED by the watermark instead of growing forever. Keys include
the event date, so the state the store must retain is only the keys whose
day can still receive late events; once the watermark passes a day, its
keys are evicted and the day is sealed (the streaming twin of "the
partition is complete, dedup it" in the reference's state machine).

Local verification drives the stream to completion over the static parquet
and compares against SELECT DISTINCT — exact here because all events fit
one micro-batch; in production the watermark bound is the correctness
contract (an event later than the watermark may re-emit its key, the same
late-data caveat every watermarked operator carries).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_gardener_spark.functions.localrel import local_df

from etl_gardener_spark.streaming.events import read_events_stream


def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run streaming dedup over the events parquet (file micro-batches),
    drain it, and return the distinct (date, user_id, event_type) keys."""
    events = read_events_stream(spark, sf_dir)
    deduped = (
        events.withColumn("date", F.to_date("ts"))
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["date", "user_id", "event_type"])
        .select("date", "user_id", "event_type")
    )
    from etl_gardener_spark.streaming.state import state_store_partitions

    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with state_store_partitions(spark):
        q = (
            deduped.writeStream.outputMode("append")
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
