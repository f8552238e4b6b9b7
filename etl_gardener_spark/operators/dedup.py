"""Windowed dedup-keep-best — the reference's core relational operator.

The reference's active dedup template (cloud/bq/ops.go:184-218) deletes every
row of a day partition that is not the "best" row for its key:

    ROW_NUMBER() OVER (PARTITION BY <keys>, date ORDER BY <priority> DESC)
    ... keep row_number = 1; DELETE target rows NOT EXISTS in the keep set.

The three legacy templates (cloud/bq/dedup.go:23-68) are the same shape with
different key/priority configs: regex-normalized keys (ndt), CONCAT-computed
composite keys (sidestream, traceroute), and multi-column mixed-direction
priority orders. This module expresses the whole family as one parameterized
operator over (partition_keys, order_keys).

Spark-first design
------------------
BigQuery's ``DELETE ... WHERE NOT EXISTS (keep)`` is in-place DML; Parquet
has no in-place delete, and an anti-join against the keep set would shuffle
the partition **twice** (once for the window, once for the join). Instead we
compute survivors directly — one shuffle on the dedup key, one pass:

    withColumn(rn, row_number over (partition_keys ++ [date], order_keys))
      .filter(rn == 1).drop(rn)

and rewrite the day partition with the survivors (dynamic partition
overwrite). Catalyst plan: Scan(one date dir) -> Exchange(hashpartition on
keys) -> Sort(in-partition) -> Window -> Filter -> write. The scan prunes to
one day, so the shuffle's working set is one day of one datatype — the same
cost envelope as the reference ("roughly proportional to the memory
footprint of the table partition", cloud/bq/ops.go:187-189).

Scale notes (100 TB):
* The only shuffle is on the dedup key; AQE skew-join/partition-split
  handles hot keys (a key with millions of duplicates would otherwise pin
  one task). For pathological single-key skew, pre-aggregation cannot help
  a ROW_NUMBER (it needs total order within the key), but AQE's skewed
  shuffle-read splitting keeps tasks bounded.
* ``row_number + filter(rn=1)`` lets Spark stop tracking rank past 1; with
  deterministic total order (see below) it is equivalent to a max-by and
  Spark's WindowGroupLimit pushes the limit into the sort (TopK per key
  rather than full sort) on 3.5+/4.x.
* Determinism: the reference breaks priority ties arbitrarily (BigQuery
  ROW_NUMBER). We require callers to pass a total order (append a unique
  tiebreak column) so reruns are idempotent — important because the
  orchestrator may retry a Deduplicating stage (ops/ops.go:182-184).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROW_NUMBER = "__etl_gardener_row_number__"


@dataclass(frozen=True)
class DedupSpec:
    """Per-datatype dedup configuration.

    Mirrors the reference's per-datatype table (cloud/bq/ops.go:53-83):
    ``partition_keys`` (all datatypes use ``{"id": "id"}`` there, but the
    legacy templates use computed keys) and ``order_keys`` (priority order,
    best first; the active template always ends with ``parser.Time DESC``,
    ops.go:203).

    ``partition_keys`` maps output-name -> SQL expression (a computed key,
    e.g. ``REGEXP_REPLACE(test_id, '.gz$', '')`` from cloud/bq/dedup.go:33,
    is expressed as the value).
    ``order_keys`` is a list of (expression, ascending) pairs, evaluated in
    order; the first row under this order wins.
    ``date_col`` joins the window partition (dedup never crosses days,
    cloud/bq/ops.go:202).
    """

    partition_keys: dict[str, str]
    order_keys: list[tuple[str, bool]]
    date_col: str | None = "date"
    name: str = "dedup"
    extra: dict[str, str] = field(default_factory=dict)

    def partition_cols(self) -> list[Column]:
        cols = [F.expr(expr) for expr in self.partition_keys.values()]
        if self.date_col:
            cols.append(F.col(self.date_col))
        return cols

    def order_cols(self) -> list[Column]:
        out = []
        for expr, asc in self.order_keys:
            c = F.expr(expr)
            out.append(c.asc() if asc else c.desc())
        return out


def dedup_keep_best(df: DataFrame, spec: DedupSpec) -> DataFrame:
    """Return the surviving (best-per-key) rows of ``df``.

    Equivalent to the keep-set of the reference's dedup templates
    (cloud/bq/ops.go:196-212): one row per (partition_keys, date), the row
    that sorts first under ``order_keys``. Output schema == input schema
    (``SELECT * EXCEPT(row_number)``, ops.go:197).
    """
    w = Window.partitionBy(*spec.partition_cols()).orderBy(*spec.order_cols())
    return (
        df.withColumn(_ROW_NUMBER, F.row_number().over(w))
        .filter(F.col(_ROW_NUMBER) == 1)
        .drop(_ROW_NUMBER)
    )


def dedup_delete_set(df: DataFrame, spec: DedupSpec) -> DataFrame:
    """Return the rows the reference's DELETE would remove (rn > 1).

    The reference phrases dedup as a DELETE of non-keepers via NOT EXISTS
    (cloud/bq/ops.go:194-218); this is that delete set, exposed for parity
    testing and for metrics parity with ``NumDMLAffectedRows``
    (ops/actions.go:160-165). Same single-shuffle plan as
    ``dedup_keep_best`` with the filter inverted.
    """
    w = Window.partitionBy(*spec.partition_cols()).orderBy(*spec.order_cols())
    return (
        df.withColumn(_ROW_NUMBER, F.row_number().over(w))
        .filter(F.col(_ROW_NUMBER) > 1)
        .drop(_ROW_NUMBER)
    )


# ---------------------------------------------------------------------------
# Reference datatype configs (cloud/bq/ops.go:53-83): every active datatype
# dedups on id with parser.Time DESC priority. Kept as data, like the
# reference's switch statement.
# ---------------------------------------------------------------------------

ACTIVE_DATATYPES = (
    "switch",
    "annotation2",
    "hopannotation2",
    "pcap",
    "scamper1",
    "tcpinfo",
    "ndt5",
    "ndt7",
)


def active_spec(datatype: str, order_keys: list[tuple[str, bool]] | None = None) -> DedupSpec:
    """DedupSpec for an active-pipeline datatype (cloud/bq/ops.go:53-83).

    All active datatypes use ``PartitionKeys={"id": "id"}`` and priority
    ``[OrderKeys,] parser.Time DESC`` (ops.go:74-79, 201-204).
    """
    if datatype not in ACTIVE_DATATYPES:
        raise ValueError(f"unsupported datatype: {datatype!r} (cloud/bq/ops.go:80-82)")
    order = list(order_keys or [])
    order.append(("parser.Time", False))
    return DedupSpec(partition_keys={"id": "id"}, order_keys=order, name=datatype)


# Legacy template equivalents (cloud/bq/dedup.go) — key normalization via
# regex, computed CONCAT keys, multi-key priority. Retained because they
# define the historical dedup semantics and exercise the computed-key and
# multi-priority paths of the operator.

LEGACY_NDT = DedupSpec(
    # key = test_id with the trailing ".gz" stripped (dedup.go:33)
    partition_keys={"stripped_id": "REGEXP_REPLACE(test_id, '\\\\.gz$', '')"},
    order_keys=[
        ("anomalies.num_snaps", False),   # dedup.go:30
        ("anomalies.no_meta", True),
        ("task_filename", True),
        ("REGEXP_EXTRACT(test_id, '.*(\\\\.gz)$', 1)", False),  # gz DESC, dedup.go:34
        ("parse_time", False),
    ],
    date_col=None,
    name="legacy_ndt",
)

LEGACY_SIDESTREAM = DedupSpec(
    # 5-tuple + start-time composite key (dedup.go:46-48)
    partition_keys={
        "key": (
            "CONCAT(test_id, CAST(web100_log_entry.snap.StartTimeStamp AS STRING),"
            " web100_log_entry.connection_spec.local_ip,"
            " CAST(web100_log_entry.connection_spec.local_port AS STRING),"
            " web100_log_entry.connection_spec.remote_ip,"
            " CAST(web100_log_entry.connection_spec.remote_port AS STRING))"
        )
    },
    order_keys=[("parse_time", False)],
    date_col=None,
    name="legacy_sidestream",
)

LEGACY_TRACEROUTE = DedupSpec(
    # TestTime + endpoint IPs (dedup.go:63-65)
    partition_keys={"key": "CONCAT(CAST(TestTime AS STRING), Source.IP, Destination.IP)"},
    order_keys=[("ParseInfo.ParseTime", False)],
    date_col=None,
    name="legacy_traceroute",
)
