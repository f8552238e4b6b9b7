"""Type-2 slowly-changing dimensions from observation streams.

``scd2_encode`` run-length encodes per-key attribute observations into
validity periods — the MERGE-free SCD2 build (change-flag LAG → run-id
running sum → period aggregate → LEAD for the closing edge), all on one
key shuffle. ``scd2_apply_batch`` is the incremental path a 100 TB
pipeline actually runs: a new (later) batch of observations touches only
the keys it contains — untouched keys' periods are carried over with an
anti join (never re-encoded, never re-shuffled), and each affected key's
OPEN period is replayed as one weighted pseudo-observation in front of
the batch, so continuation vs change falls out of the same encoder.
Apply-per-batch is provably equivalent to encoding everything at once
(tests/test_scd2.py pins the equivalence), which is what makes the
nightly upsert idempotent and restart-safe.

The reference has no dimension management (its join consumes an
externally-built annotation table, cloud/bq/ops.go:234-253); this is the
extension that builds such tables from raw observations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PERIOD_COLS = ("attr_value", "valid_from", "valid_to", "is_current", "n_obs")


def scd2_encode(
    obs: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Run-length encode observations into SCD2 periods.

    Input: one row per observation ``(key, ts, tie, attr[, weight])``.
    Output: ``(key, attr_value, valid_from, valid_to, is_current,
    n_obs)`` with half-open validity ``[valid_from, valid_to)`` and
    ``valid_to IS NULL`` on each key's open period.

    ``weight_col`` (default: constant 1) feeds ``n_obs`` — the seam
    ``scd2_apply_batch`` uses to carry an open period's observation
    count through its pseudo-observation. All three windows share the
    single ``key_col`` exchange; ``eqNullSafe`` makes NULL-attribute
    transitions well-defined.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    weight = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    flagged = obs.withColumn(
        "__chg",
        F.when(~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w)), 1).otherwise(0),
    ).withColumn("__w", weight)
    runs = flagged.withColumn(
        "__run", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    periods = runs.groupBy(key_col, "__run").agg(
        F.min(attr_col).alias("attr_value"),
        F.min(ts_col).alias("valid_from"),
        F.sum("__w").cast("long").alias("n_obs"),
    )
    # __run tie-breaks the close window: two consecutive runs can share a
    # valid_from (equal-ts observations with different attrs), and
    # ordering by valid_from alone would assign valid_to/is_current
    # nondeterministically between them.
    close = Window.partitionBy(key_col).orderBy("valid_from", "__run")
    return periods.select(
        key_col,
        "attr_value",
        "valid_from",
        F.lead("valid_from").over(close).alias("valid_to"),
        F.lead("valid_from").over(close).isNull().alias("is_current"),
        "n_obs",
    )


def scd2_apply_batch(
    periods: DataFrame,
    batch_obs: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Incrementally fold a NEW batch of observations into an existing
    SCD2 period table; returns the updated period table.

    Precondition (day-partition semantics): every batch observation's
    ``ts`` is >= the affected key's open-period ``valid_from`` — batches
    arrive in day order, exactly the warehouse's append discipline.

    Cost model: untouched keys pass through ONE anti join (no window, no
    re-encode — at 100 TB this is the whole point: the dimension table
    is large, the daily batch's key set is small and broadcastable);
    affected keys re-encode only ``open period + batch`` rows. Closed
    historical periods of affected keys are carried verbatim — their
    edges cannot change because the batch is later than all of them.
    Replaying the open period as a single pseudo-observation weighted by
    its ``n_obs`` makes continuation (same attr: run merges, count adds)
    and change (new attr: period closes at the first differing
    observation) fall out of ``scd2_encode`` with no case analysis.
    """
    # eqNullSafe, not an equi-join on the column name: scd2_encode's
    # window partitioner treats a NULL key as A KEY (one partition), so
    # the apply path must too — a plain equi-join would route a NULL-key
    # open period to `untouched` AND re-encode the batch's NULL-key rows
    # separately, yielding two concurrent open periods for the same key
    # and breaking apply ≡ full-encode (differential-fuzz finding, seed 1).
    affected = batch_obs.select(key_col).distinct()
    cond = periods[key_col].eqNullSafe(affected[key_col])
    untouched = periods.join(F.broadcast(affected), cond, "left_anti")
    aff_periods = periods.join(F.broadcast(affected), cond, "left_semi")
    closed = aff_periods.filter(~F.col("is_current"))
    open_pseudo = aff_periods.filter(F.col("is_current")).select(
        F.col(key_col),
        F.col("valid_from").alias(ts_col),
        F.lit(None).cast("long").alias(tie_col),
        F.col("attr_value").alias(attr_col),
        F.col("n_obs").alias("__w"),
    )
    batch = batch_obs.select(
        key_col, ts_col, F.col(tie_col).cast("long").alias(tie_col), attr_col
    ).withColumn("__w", F.lit(1).cast("long"))
    # NULL tie sorts first: the pseudo-observation precedes any batch row
    # at the same timestamp, preserving the open period's precedence.
    re_encoded = scd2_encode(
        open_pseudo.unionByName(batch),
        key_col,
        attr_col,
        ts_col,
        tie_col,
        weight_col="__w",
    )
    return untouched.unionByName(closed).unionByName(re_encoded)
