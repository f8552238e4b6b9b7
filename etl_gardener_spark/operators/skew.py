"""Skew mitigation: salted two-phase aggregation.

A hash aggregation shuffles every row of a hot key to one reducer; at
100 TB a handful of heavy hitters (one event_type, one user) can pin a
single task for hours. Salting splits each key into ``salt_buckets``
sub-keys for a partial aggregate (fan-out bounded by the bucket count),
then merges the partials in a second, tiny aggregation — the classic
two-phase rewrite. AQE's skew-join splitting covers joins; aggregation
skew is handled here because Spark's partial/final aggregation already
combines map-side, which is usually enough — salting matters when the
DISTINCT-ish state per key (e.g. collect-like aggs) or the reducer-side
merge itself is the bottleneck.

The salt is deterministic (hash of a stable column mod buckets, never
rand()) so reruns of an idempotent pipeline stage produce identical
partials and plans stay reproducible.

Supported merge semantics: count / sum / min / max (the decomposable
aggregates); avg is derived as sum/count by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "count": F.sum,  # counts add up
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def salted_agg(
    df: DataFrame,
    keys: list[str | Column],
    aggs: dict[str, tuple[str, str]],
    salt_col: str | Column,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name -> (input_col, fn) with fn in
    {count, sum, min, max}. ``salt_col``: any stable column whose hash
    spreads the hot key's rows (e.g. the row id).
    """
    for name, (_, fn) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{name}: non-decomposable agg {fn!r}")
    salt = F.pmod(F.xxhash64(salt_col), F.lit(salt_buckets)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            _PARTIAL[fn](col).alias(f"__p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"__p_{name}").alias(name)
            for name, (_, fn) in aggs.items()
        ]
    )
