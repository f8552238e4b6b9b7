"""Relational operators: the reference's table-op surface plus the
LLM-data-pipeline extensions (dedup family — including incremental
batch-vs-store — similarity search, snapshot diff / CDC, interval joins,
text analysis, multimodal plumbing)."""

from etl_gardener_spark.operators.dedup import (
    DedupSpec,
    dedup_delete_set,
    dedup_keep_best,
)
from etl_gardener_spark.operators.diff import apply_diff, snapshot_diff
from etl_gardener_spark.operators.intervals import (
    interval_overlap_join,
    interval_point_join,
)
from etl_gardener_spark.operators.join import join_annotate
from etl_gardener_spark.operators.neardup import (
    incremental_minhash_dedup,
    minhash_store,
)
from etl_gardener_spark.operators.similarity import (
    incremental_semantic_dedup,
    kmeans_fit,
)

__all__ = [
    "DedupSpec",
    "dedup_keep_best",
    "dedup_delete_set",
    "join_annotate",
    "snapshot_diff",
    "apply_diff",
    "interval_point_join",
    "interval_overlap_join",
    "minhash_store",
    "incremental_minhash_dedup",
    "kmeans_fit",
    "incremental_semantic_dedup",
]
