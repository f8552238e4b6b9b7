"""Relational operators: the reference's table-op surface plus the
LLM-data-pipeline extensions (dedup family — including incremental
batch-vs-store and corpus line dedup — similarity search, snapshot
diff / CDC, interval joins, text analysis, deterministic splits /
sampling, BM25 retrieval, multimodal plumbing)."""

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
    lsh_tuning,
    minhash_store,
    winnow_fingerprints,
    winnow_pairs,
)
from etl_gardener_spark.operators.corpus import drop_duplicate_lines
from etl_gardener_spark.operators.pca import pca_fit, pca_project
from etl_gardener_spark.operators.pq import pq_encode, pq_topk, pq_topk_ivf
from etl_gardener_spark.operators.sampling import (
    dsir_scores,
    hash_split,
    mixture_sample,
    sample_cap_per_key,
    stratified_sample,
)
from etl_gardener_spark.operators.search import bm25_topk, rrf_fuse, topk_ngrams
from etl_gardener_spark.operators.similarity import (
    incremental_semantic_dedup,
    incremental_topk,
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
    "lsh_tuning",
    "winnow_fingerprints",
    "winnow_pairs",
    "kmeans_fit",
    "incremental_semantic_dedup",
    "incremental_topk",
    "drop_duplicate_lines",
    "hash_split",
    "stratified_sample",
    "sample_cap_per_key",
    "mixture_sample",
    "bm25_topk",
    "rrf_fuse",
    "topk_ngrams",
    "pca_fit",
    "pca_project",
    "pq_encode",
    "pq_topk",
    "pq_topk_ivf",
    "dsir_scores",
]
