"""Distributed exact global ranking.

A bare ``Window.orderBy(...)`` (no PARTITION BY) funnels the whole
relation through ONE task — fine for the post-aggregate reports in this
repo whose input is an entity-sized relation, fatal for a 1e9-entity
ranking at 100 TB. This module provides the exact scale path:

  1. ``repartitionByRange`` on the full (unique) sort key — Spark's
     RangePartitioner samples boundaries so partition i holds keys
     strictly before partition i+1 under the total order;
  2. ``sortWithinPartitions`` + per-partition ``row_number`` (the window
     partitions on ``spark_partition_id()``, so every task ranks only
     its own slice);
  3. per-partition row counts (one tiny aggregate, |partitions| rows)
     turned into broadcast cumulative offsets and added back.

Two jobs, no single-task stage, exact global ranks. The sort key MUST
be a total order (include a unique tiebreaker column) — otherwise ties
straddling a range boundary would interleave and the composition above
would be nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an exact 1-based global ``row_number`` under ``order_cols``
    (which must define a TOTAL order) without a single-partition window.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # the per-partition window is cheap (data already sorted) and never
    # crosses tasks; localCheckpoint pins the partitioning so the count
    # job below sees the same __pid assignment as the ranked output
    ranged = ranged.localCheckpoint(eager=False)
    counts = sorted(
        (r["__pid"], r["c"])
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )  # |partitions| rows — O(cluster), not O(data)
    offsets = {}
    acc = 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    off_expr = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for pid_off in offsets.items()
                for x in pid_off
            ]
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.withColumn(
            out_col, (F.row_number().over(w) + off_expr).cast("long")
        )
        .drop("__pid")
    )


def ntile_from_rank(rank: Column, n_rows: Column, buckets: int) -> Column:
    """SQL NTILE(buckets) computed arithmetically from an exact global
    rank and the total row count — integer math only, so it composes
    with :func:`global_row_number` without any further window. NTILE
    semantics: the first ``n_rows % buckets`` tiles hold
    ``n_rows div buckets + 1`` rows, the rest one fewer."""
    small = (n_rows / buckets).cast("long")  # floor for positive ints
    extras = n_rows - small * buckets
    boundary = extras * (small + 1)
    in_big = rank <= boundary
    # greatest(small, 1): when n_rows < buckets every row is in a "big"
    # tile (boundary == n_rows), so the otherwise-branch divisor is
    # never used — the clamp just keeps the unevaluated branch legal
    return (
        F.when(in_big, ((rank - 1) / (small + 1)).cast("long") + 1)
        .otherwise(
            extras
            + ((rank - 1 - boundary) / F.greatest(small, F.lit(1)))
            .cast("long")
            + 1
        )
        .cast("long")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running SUM of ``value_col`` under the total order
    ``order_cols`` — same range-partition + broadcast-offset composition
    as :func:`global_row_number`, with per-partition VALUE totals as the
    offsets. The building block for Pareto/cumulative-share reports over
    entity dimensions too large for a single-partition window.

    Exactness: offsets are per-partition SUMs, so ``value_col`` should
    be integer or decimal for fold-order-free results (the repo's
    fixed-point discipline); double values would make partition totals
    reassociation-sensitive.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = sorted(
        (r["__pid"], r["s"])
        for r in ranged.groupBy("__pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )
    offsets = {}
    acc = 0
    for pid, s in totals:
        offsets[pid] = acc
        acc += s or 0
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        ),
        F.col("__pid"),
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ranged.withColumn(
        out_col, F.sum(value_col).over(w) + off_expr
    ).drop("__pid")
