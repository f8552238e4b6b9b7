"""Structured Streaming operators (extension surface — the reference is
daily-batch only, SURVEY.md §2.2 'Streaming-only operators: absent')."""

from etl_gardener_spark.streaming.events import stream_hourly_rollup
from etl_gardener_spark.streaming.ingest import (
    jsonl_ingest_with_dlq,
    read_documents_stream,
    scrub_split_to_parquet,
    scrub_split_transform,
)
from etl_gardener_spark.streaming.state import state_store_partitions

__all__ = [
    "stream_hourly_rollup",
    "state_store_partitions",
    "read_documents_stream",
    "scrub_split_transform",
    "scrub_split_to_parquet",
    "jsonl_ingest_with_dlq",
]
