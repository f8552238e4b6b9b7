"""Bucketized interval joins — point-in-interval and interval-overlap.

Temporal containment/overlap is the other join Spark's zoo lacks (next to
as-of, operators/asof.py): "which events fall inside each session",
"which maintenance windows overlap which outages". The naive formulation
is an equi-join on the entity key with a range residual — fine when keys
are selective, catastrophic when a key's intervals x points product is
large (per-key cross product).

The scalable formulation here **bucketizes time** so the join is a pure
equi-join on (key, bucket):

- intervals explode to the buckets they cover (``sequence`` of bucket
  ids — JVM codegen, no Python);
- points live in exactly ONE bucket, so a point meets an interval in at
  most one bucket and containment needs no dedup;
- interval-interval pairs can share many buckets, so the pair is emitted
  only in the LATER of the two start buckets ("meet bucket" trick) —
  uniqueness by construction, still no dedup shuffle.

Cost: |points| + sum(interval spans)/bucket rows through one equi-join.
The bucket width trades replication (long intervals cover many buckets)
against join selectivity (wide buckets put unrelated rows together);
pick it near the median interval length. The residual range predicate
rides the join as a codegen'd filter, so wrong-bucket collisions cost a
comparison, never an output row.

Reference framing: the reference's annotation join (cloud/bq/ops.go
join template) matches rows within a date window; these operators are
that shape generalized to arbitrary intervals at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, width_sec: int):
    # integer micros div keeps the bucket math exact (no double rounding)
    return (F.unix_micros(col) / F.lit(1_000_000 * width_sec)).cast("long")


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    on: str,
    start: str,
    end: str,
    ts: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval of the same key containing it
    (``start <= ts <= end``, closed ends). Returns interval columns plus
    the point's columns (minus its key).

    ``how='inner'`` drops empty intervals; ``'left'`` keeps them with
    NULL point columns (aggregate counts then COALESCE to 0). Column
    names of the two sides (other than ``on``) must be disjoint; with
    ``'left'``, (on, start, end) must identify intervals uniquely.
    """
    b_int = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(_bucket(F.col(start), bucket_seconds),
                       _bucket(F.col(end), bucket_seconds))
        ),
    )
    pt_cols = [c for c in points.columns if c != on]
    b_pts = points.withColumn("__b", _bucket(F.col(ts), bucket_seconds)).select(
        F.col(on).alias("__pk"), F.col("__b").alias("__pb"), *pt_cols
    )
    joined = b_int.join(
        b_pts,
        (F.col(on) == F.col("__pk"))
        & (F.col("__b") == F.col("__pb"))
        & (F.col(ts) >= F.col(start))
        & (F.col(ts) <= F.col(end)),
        "inner",
    ).drop("__b", "__pb", "__pk")
    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        empty = (
            intervals.join(
                matched.select(on, start, end).distinct(),
                [on, start, end],
                "left_anti",
            )
        )
        for c in pt_cols:
            empty = empty.withColumn(c, F.lit(None).cast(dict(joined.dtypes)[c]))
        return matched.unionByName(empty)
    raise ValueError(f"how must be 'inner' or 'left', got {how!r}")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Pairs of overlapping intervals per key (closed-interval overlap:
    ``l_start <= r_end AND r_start <= l_end``). Each qualifying pair is
    emitted exactly once — in the later of the two start buckets, which
    both sides necessarily cover — so no distinct pass is needed.
    """
    lb = left.withColumn(
        "__b",
        F.explode(
            F.sequence(_bucket(F.col(l_start), bucket_seconds),
                       _bucket(F.col(l_end), bucket_seconds))
        ),
    )
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(_bucket(F.col(r_start), bucket_seconds),
                       _bucket(F.col(r_end), bucket_seconds))
        ),
    ).select(
        F.col(on).alias("__rk"),
        F.col("__b").alias("__rb"),
        *[c for c in right.columns if c != on],
    )
    meet = F.greatest(
        _bucket(F.col(l_start), bucket_seconds),
        _bucket(F.col(r_start), bucket_seconds),
    )
    return (
        lb.join(
            rb,
            (F.col(on) == F.col("__rk"))
            & (F.col("__b") == F.col("__rb"))
            & (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end)),
            "inner",
        )
        .filter(F.col("__b") == meet)
        .drop("__b", "__rb", "__rk")
    )
