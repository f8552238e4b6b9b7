"""Snapshot diff (change data capture between two table versions).

The reference pipeline rebuilds day partitions wholesale (WriteTruncate,
cloud/bq/ops.go:104-150); a consumer that wants *what changed* between two
loads of the same partition has to diff snapshots. This operator computes
that delta — the primitive that turns full-rebuild pipelines into
incremental ones (feed the delta to SCD2 apply, rollup refresh, or a
downstream sink instead of reprocessing the partition).

Scale shape: ONE full-outer shuffle join on the key columns — both sides
hash-partition once, change classification and column comparison are
row-local codegen'd expressions on the joined row (null-safe equality per
compared column; no second pass, no window). At 100 TB the join is the
floor cost of any diff; everything else rides it. If both snapshots are
written bucketed by the key (warehouse.write_bucketed), the exchange
disappears entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Delta between two snapshots keyed by ``keys``: one row per changed
    key with ``change`` in ('insert', 'update', 'delete').

    - insert: key only in ``new`` — row carries the new values;
    - delete: key only in ``old`` — row carries the last-seen old values;
    - update: key in both with any ``compare_cols`` difference
      (null-safe: NULL -> value and value -> NULL count as changes) —
      row carries the new values.

    Unchanged keys are dropped. ``compare_cols`` defaults to every
    common non-key column. Keys must be unique per snapshot (it is a
    snapshot diff, not a multiset diff).
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    compare_cols = list(compare_cols)

    # Rename per side rather than alias: both snapshots usually derive
    # from the same source frame (two filters of one table), and Spark's
    # ambiguous-self-join analysis rejects attribute references that
    # resolve to shared lineage. Renamed columns are unambiguous always.
    cols = keys + compare_cols
    o = old.select([F.col(c).alias(f"__o_{c}") for c in cols])
    n = new.select([F.col(c).alias(f"__n_{c}") for c in cols])
    oc = lambda c: F.col(f"__o_{c}")  # noqa: E731
    nc = lambda c: F.col(f"__n_{c}")  # noqa: E731
    cond = [oc(k).eqNullSafe(nc(k)) for k in keys]
    joined = o.join(n, cond, "full_outer")

    # Presence tests on key columns: a full-outer miss leaves the whole
    # side NULL, so a side is present iff ANY of its key columns is
    # non-null (isNotNull never yields NULL, so OR is safe).
    in_old = F.lit(False)
    in_new = F.lit(False)
    for k in keys:
        in_old = in_old | oc(k).isNotNull()
        in_new = in_new | nc(k).isNotNull()
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~oc(c).eqNullSafe(nc(c))

    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    out_cols = [change.alias(CHANGE_COL)]
    for k in keys:
        out_cols.append(F.coalesce(nc(k), oc(k)).alias(k))
    for c in compare_cols:
        # deletes carry the last-seen old values; inserts/updates the new
        out_cols.append(F.when(~in_new, oc(c)).otherwise(nc(c)).alias(c))
    return joined.select(*out_cols).filter(F.col(CHANGE_COL).isNotNull())


def apply_diff(
    old: DataFrame, delta: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Replay a ``snapshot_diff`` delta onto the old snapshot,
    reconstructing the new one: changed keys (any kind) leave the old
    relation via ONE anti join, then insert/update rows come back in with
    their new values. ``apply_diff(old, snapshot_diff(old, new, keys),
    keys)`` equals ``new`` on the diffed columns (pinned by the roundtrip
    property test) — the consumer-side contract that makes shipping
    deltas instead of snapshots safe.

    Scale shape: anti join + union — the anti join shuffles only the
    delta's keys against old (broadcast when the delta is small, the
    common case), never a full-outer of two snapshots.
    """
    keys = list(keys)
    touched = delta.select(keys)
    kept = old.select(delta.drop(CHANGE_COL).columns).join(
        touched, keys, "left_anti"
    )
    incoming = delta.filter(F.col(CHANGE_COL) != "delete").drop(CHANGE_COL)
    return kept.unionByName(incoming)
