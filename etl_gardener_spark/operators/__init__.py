"""Relational operators: the reference's table-op surface plus the
LLM-data-pipeline extensions (dedup family, similarity search, text
analysis, multimodal plumbing)."""

from etl_gardener_spark.operators.dedup import DedupSpec, dedup_keep_best, dedup_delete_set
from etl_gardener_spark.operators.join import join_annotate

__all__ = [
    "DedupSpec",
    "dedup_keep_best",
    "dedup_delete_set",
    "join_annotate",
]
