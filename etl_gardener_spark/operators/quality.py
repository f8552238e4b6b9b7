"""Declarative data-quality validation over warehouse tables.

The reference's only data-quality surface is load-error tolerance ("No such
field:" warnings, ops/actions.go:215-225) and job-statistics counters; a
production pipeline gates partition promotion (tmp → raw) on explicit
checks. This module provides that gate as a declarative check list compiled
into ONE aggregate pass per table (plus one extra pass per uniqueness /
referential check, which need their own keyed shuffles).

Check kinds:

* ``not_null(col)``            — no NULLs in ``col``
* ``in_range(col, lo, hi)``    — values within [lo, hi]
* ``in_set(col, values)``      — values drawn from an allowed set
* ``matches(col, regex)``      — strings match an anchored regex
* ``unique(cols)``             — no duplicate key tuples
* ``ref_integrity(col, dim_df, dim_col)`` — every value exists in the dim

Scale notes (100 TB): all row-local checks (not_null / in_range / in_set /
matches) compile to conditional-count expressions inside a single
map-combined aggregate — one scan, zero shuffles, O(checks) columns of
state. ``unique`` is one groupBy on the key (the same shuffle a dedup
would do); ``ref_integrity`` is a left-anti join against the (broadcast)
dimension key set. Nothing collects rows to the driver; the violation
REPORT is O(#checks) rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declarative expectation; ``kind`` drives compilation."""

    name: str
    kind: str
    col: str | None = None
    lo: object = None
    hi: object = None
    values: tuple = ()
    regex: str | None = None
    cols: tuple = ()
    dim: DataFrame | None = None
    dim_col: str | None = None


def not_null(col: str, name: str | None = None) -> Check:
    return Check(name or f"not_null_{col}", "not_null", col=col)


def in_range(col: str, lo, hi, name: str | None = None) -> Check:
    return Check(name or f"in_range_{col}", "in_range", col=col, lo=lo, hi=hi)


def in_set(col: str, values: Sequence, name: str | None = None) -> Check:
    return Check(name or f"in_set_{col}", "in_set", col=col, values=tuple(values))


def matches(col: str, regex: str, name: str | None = None) -> Check:
    return Check(name or f"matches_{col}", "matches", col=col, regex=regex)


def unique(cols: Sequence[str], name: str | None = None) -> Check:
    return Check(name or "unique_" + "_".join(cols), "unique", cols=tuple(cols))


def ref_integrity(
    col: str, dim: DataFrame, dim_col: str, name: str | None = None
) -> Check:
    return Check(
        name or f"ref_{col}", "ref_integrity", col=col, dim=dim, dim_col=dim_col
    )


def _violation_expr(c: Check):
    """Row-local violation predicate for single-pass checks."""
    col = F.col(c.col)
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "in_range":
        # NULL never satisfies the range; count it as a violation so a
        # check list without an explicit not_null still surfaces gaps.
        return ~col.between(F.lit(c.lo), F.lit(c.hi)) | col.isNull()
    if c.kind == "in_set":
        return ~col.isin(list(c.values)) | col.isNull()
    if c.kind == "matches":
        return ~col.rlike(c.regex) | col.isNull()
    raise ValueError(f"not a row-local check: {c.kind}")


def validate(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Compile ``checks`` against ``df`` and return the violation report:
    one row per check — ``(check, kind, n_rows, n_violations, pass)``.

    All row-local checks share ONE aggregate over ONE scan; each unique /
    referential check adds exactly one more job (keyed aggregate or
    anti-join count). The report is unioned driver-side from per-check
    1-row aggregates (O(#checks) rows — never row data).
    """
    local = [c for c in checks if c.kind in ("not_null", "in_range", "in_set", "matches")]
    uniques = [c for c in checks if c.kind == "unique"]
    refs = [c for c in checks if c.kind == "ref_integrity"]
    unknown = [c for c in checks if c.kind not in
               ("not_null", "in_range", "in_set", "matches", "unique", "ref_integrity")]
    if unknown:
        raise ValueError(f"unknown check kinds: {[c.kind for c in unknown]}")

    reports: list[DataFrame] = []
    spark = df.sparkSession

    if local:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(F.when(_violation_expr(c), 1).otherwise(0)).alias(f"__v{i}")
            for i, c in enumerate(local)
        ]
        row_aggs = df.agg(*aggs)
        # one row per check, from the single aggregate row (no re-scan)
        stack = ", ".join(
            f"'{c.name}', '{c.kind}', __v{i}" for i, c in enumerate(local)
        )
        reports.append(
            row_aggs.select(
                F.expr(
                    f"stack({len(local)}, {stack}) AS (check, kind, n_violations)"
                ),
                F.col("__n").alias("n_rows"),
            ).select("check", "kind", "n_rows", "n_violations")
        )

    for c in uniques:
        dup = (
            df.groupBy(*c.cols)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.sum("__c").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
                ).alias("n_violations"),
            )
        )
        reports.append(
            dup.select(
                F.lit(c.name).alias("check"),
                F.lit("unique").alias("kind"),
                "n_rows",
                "n_violations",
            )
        )

    for c in refs:
        keys = F.broadcast(c.dim.select(F.col(c.dim_col).alias(c.col)).distinct())
        orphans = df.join(keys, on=c.col, how="left_anti")
        rep = df.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        )
        reports.append(
            rep.select(
                F.lit(c.name).alias("check"),
                F.lit("ref_integrity").alias("kind"),
                "n_rows",
                "n_violations",
            )
        )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "check",
        "kind",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def split_by_expectations(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Annotate every row with the names of the row-local checks it
    violates (``dq_reasons``, check-list order) and a ``dq_disposition``
    of 'accepted' or 'quarantined'.

    Only row-local checks participate (not_null / in_range / in_set /
    matches): the annotation is a pure projection — zero shuffles, rides
    the same scan as any downstream write, and vectorizes in codegen.
    Set-level checks (unique, ref_integrity) gate promotion via
    ``validate``'s report instead; a per-row disposition for them would
    force a keyed shuffle here.
    """
    local = [
        c for c in checks if c.kind in ("not_null", "in_range", "in_set", "matches")
    ]
    if len(local) != len(checks):
        bad = [c.kind for c in checks if c not in local]
        raise ValueError(f"split_by_expectations takes row-local checks only: {bad}")
    reasons = F.array_compact(
        F.array(*[F.when(_violation_expr(c), F.lit(c.name)) for c in local])
    )
    return df.withColumn("dq_reasons", reasons).withColumn(
        "dq_disposition",
        F.when(F.size("dq_reasons") == 0, F.lit("accepted")).otherwise(
            F.lit("quarantined")
        ),
    )


def promote_with_quarantine(
    df: DataFrame,
    checks: Sequence[Check],
    wh,
    experiment: str,
    datatype: str,
    accepted_tier: str = "raw",
    quarantine_tier: str = "quarantine",
) -> dict:
    """Expectation-gated promotion: accepted rows land in
    ``accepted_tier`` with their original schema; violating rows land in
    ``quarantine_tier`` carrying a ``dq_reason`` audit column — nothing
    is silently dropped. Both writes use dynamic partition overwrite
    (the T3 WriteTruncate discipline): re-promoting a fixed batch
    replaces its own day partitions byte-for-byte, so the gate is
    idempotent — a plain append would double rows on rerun.

    The split is a projection riding each write's scan; at 100 TB the
    quarantine side is typically a tiny fraction, so its write cost is
    proportional to violations, not to the batch. Returns THIS batch's
    disposition counts, from one aggregate over the annotated batch —
    not a rescan of the (historically large) tiers.

    A disposition side with NO rows for one of the batch's days still
    clears that day in its tier: dynamic overwrite only replaces the
    partitions present in the incoming frame, so without the explicit
    delete a re-promotion of a FIXED batch (3 violations → 0) would
    leave the stale quarantine rows beside the now-accepted copies.
    The per-(day, disposition) presence map comes from the same small
    aggregate that produces the counts.

    The annotated batch is persisted across the three actions (counts
    aggregate + two writes): a nondeterministic source frame (sampled
    reads, now()-stamped columns, racing upstream rewrites) recomputed
    per action could otherwise write rows that diverge from the counts /
    presence map driving the stale-partition deletes.
    """
    from etl_gardener_spark.warehouse import DATE_COL

    ann = split_by_expectations(df, checks).persist()
    try:
        accepted = ann.filter(F.col("dq_disposition") == "accepted").drop(
            "dq_reasons", "dq_disposition"
        )
        quarantined = ann.filter(F.col("dq_disposition") == "quarantined").drop(
            "dq_disposition"
        ).withColumn("dq_reason", F.concat_ws(",", "dq_reasons")).drop("dq_reasons")
        per_day = {
            (r[DATE_COL], r["dq_disposition"]): r["n"]
            for r in ann.groupBy(DATE_COL, "dq_disposition")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        batch_days = {d for d, _ in per_day}
        wh.overwrite_partitions(accepted, accepted_tier, experiment, datatype)
        wh.overwrite_partitions(
            quarantined, quarantine_tier, experiment, datatype
        )
        for day in batch_days:
            if (day, "accepted") not in per_day:
                wh.delete_partition(
                    df.sparkSession, accepted_tier, experiment, datatype, day
                )
            if (day, "quarantined") not in per_day:
                wh.delete_partition(
                    df.sparkSession, quarantine_tier, experiment, datatype, day
                )
        return {
            "accepted": sum(
                n for (d, disp), n in per_day.items() if disp == "accepted"
            ),
            "quarantined": sum(
                n for (d, disp), n in per_day.items() if disp == "quarantined"
            ),
        }
    finally:
        ann.unpersist()


def profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    exact_distinct: bool = False,
) -> DataFrame:
    """Dataset profile (the ANALYZE-TABLE / dbt-style column summary):
    one row per column with row count, null count, distinct count, and
    min/max rendered as strings (uniform schema across types).

    One aggregation job for the whole profile: every column's statistics
    are expressions in a single global agg, then `stack` unpivots the
    one-row wide result to long form — the table is scanned ONCE however
    many columns are profiled.

    ``exact_distinct=False`` (default) uses approx_count_distinct (HLL,
    rsd 1%): distinct counts stay one-pass mergeable at any scale.
    ``exact_distinct=True`` is the audit mode — Spark plans k distinct
    aggregates via Expand (input multiplied by k before the shuffle), so
    reserve it for dimension-sized tables or single columns.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            # coalesce: SUM over an EMPTY table is NULL, but a profile of
            # zero rows has zero nulls (differential-fuzz finding, seed 0)
            F.coalesce(
                F.sum(F.when(col.isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"__null_{c}")
        )
        aggs.append(
            (
                F.countDistinct(col)
                if exact_distinct
                else F.approx_count_distinct(col, rsd=0.01)
            ).alias(f"__dist_{c}")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_value, max_value)",
        "__n AS n_rows",
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Privacy audit: quasi-identifier combinations whose group is smaller
    than ``k`` (re-identifiable under k-anonymity) — the check a dataset
    runs before release, completing the privacy surface next to PII
    scrubbing (functions/scrub.py) and key deletion (warehouse.forget_keys).

    Output: one row per violating combination with its count, plus (when
    ``sensitive_col`` is given) the group's distinct sensitive-value count
    — groups with ``n_sensitive == 1`` also fail l-diversity (the
    homogeneity attack: membership alone reveals the sensitive value).

    One map-side-combined groupBy on the quasi key; the violating set is
    the output, so nothing but the (small) offender list leaves the
    aggregate. At 100 TB this is a single keyed pass like any rollup.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).cast("long").alias("n_sensitive")
        )
    return (
        df.groupBy(*quasi_cols)
        .agg(*aggs)
        .filter(F.col("n") < k)
    )
