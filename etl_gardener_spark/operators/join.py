"""Annotation join — materialize ``raw ⟕ annotation`` (reference Q2).

The reference's join template (cloud/bq/ops.go:234-253):

    WITH ann AS (SELECT * FROM raw.annotation2
                 WHERE date BETWEEN DATE_SUB(d, INTERVAL 1 DAY) AND d),
         datatype AS (SELECT * FROM raw.<datatype> WHERE date = d)
    SELECT datatype.id, datatype.date, datatype.parser,
           ann.* EXCEPT(id, date, parser),
           datatype.* EXCEPT(id, date, parser)
    FROM datatype LEFT JOIN ann USING (id)

Semantics reproduced exactly:

* the annotation side scans a **2-day window** (annotations may be parsed a
  day late, ops.go:247);
* LEFT OUTER on ``id`` — facts without an annotation keep NULL annotation
  columns;
* output column order: join key, date, parser, then the annotation payload,
  then the fact payload, with the annotation's own id/date/parser dropped
  (``EXCEPT``, ops.go:250-251).

Spark-first design: the fact side is one day partition (pruned scan); the
annotation side is two day partitions of a much smaller table, so we apply a
``broadcast()`` hint when the caller marks it small (the common case — in the
reference, BigQuery makes the same call implicitly). Broadcast means **zero
shuffle of the 100 TB fact side**: each executor streams its fact partitions
against an in-memory hash map. When the annotation side is too large to
broadcast, we fall back to a plain equi-join and let AQE choose
sort-merge/shuffled-hash and split skewed partitions.

Dedup of the annotation window is the caller's job, as in the reference
(annotation2 is itself deduped before any join runs — the Joining state is
gated on the annotation2 job reaching Complete, ops/actions.go:31-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_annotate(
    fact: DataFrame,
    ann: DataFrame,
    on: list[str] | str = "id",
    leading: list[str] = ("date", "parser"),
    broadcast_ann: bool = True,
) -> DataFrame:
    """LEFT OUTER join ``fact`` with ``ann`` USING(on), reference column order.

    ``leading`` are the fact columns emitted right after the join keys
    (reference: ``date, parser``, ops.go:250). Annotation columns that
    collide with the join keys or ``leading`` names are dropped from the
    annotation side (``ann.* EXCEPT(id, date, parser)``, ops.go:251).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lead = [c for c in leading if c in fact.columns]
    drop_from_ann = set(keys) | set(lead)

    ann_payload = [c for c in ann.columns if c not in drop_from_ann]
    fact_payload = [c for c in fact.columns if c not in set(keys) | set(lead)]

    right = ann.select(*keys, *ann_payload)
    if broadcast_ann:
        right = F.broadcast(right)

    joined = fact.join(right, on=keys, how="left")
    # Reference output order: keys, leading fact cols, ann payload, fact payload
    return joined.select(
        *[F.col(k) for k in keys],
        *[fact[c] for c in lead],
        *[right[c] for c in ann_payload],
        *[fact[c] for c in fact_payload],
    )
