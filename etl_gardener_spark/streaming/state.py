"""State-store sizing for stateful streaming queries."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def state_store_partitions(spark: SparkSession, n: int = 4):
    """Size stateful-query shuffle partitions to the STATE volume, not the
    session's scan parallelism. Every stateful operator opens/commits one
    state store per shuffle partition per micro-batch (stream-stream joins
    open four), so at small-to-medium state the per-batch fixed cost is
    stores × partitions and fewer stores win; at real stream scale this is
    the knob to re-raise. The streaming query binds the partition count at
    .start(), so the previous value is restored immediately after.

    Default 4, from the r8 sessionize A/B at sf0.1 (task-s / wall-s,
    identical output): 2 stores 8.6/5.4, 4 stores 9.5/3.4, 8 stores
    13.4/2.7 — fewer stores trade wall for task-time, and ~8.5 task-s
    is the measured FLOOR regardless (the JVM cpu is 0.7 s; the rest is
    applyInPandasWithState python-worker group processing, which the
    store count cannot touch). Batch count is 2 at any setting — one
    data micro-batch plus one event-time-timeout finalize batch, so
    there is no per-source-file empty-batch overhead to reclaim.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
