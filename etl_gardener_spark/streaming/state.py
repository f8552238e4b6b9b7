"""State-store sizing for stateful streaming queries."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def state_store_partitions(spark: SparkSession, n: int = 8):
    """Size stateful-query shuffle partitions to the STATE volume, not the
    session's scan parallelism. Every stateful operator opens/commits one
    state store per shuffle partition per micro-batch (stream-stream joins
    open four), so at small-to-medium state the per-batch fixed cost is
    stores × partitions and fewer stores win; at real stream scale this is
    the knob to re-raise. The streaming query binds the partition count at
    .start(), so the previous value is restored immediately after.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
