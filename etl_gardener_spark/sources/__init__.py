"""Sources: JSONL landing loads and object-store prefix probes."""

from etl_gardener_spark.sources.jsonl import read_jsonl, write_jsonl, LoadStats
from etl_gardener_spark.sources.listing import has_files, prefix_stats, ObjectStat

__all__ = [
    "read_jsonl",
    "write_jsonl",
    "LoadStats",
    "has_files",
    "prefix_stats",
    "ObjectStat",
]
