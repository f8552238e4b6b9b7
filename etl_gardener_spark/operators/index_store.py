"""Persisted ANN index lifecycle — the build-once / search-many story
made concrete: the IVF corpus cells (similarity.ivf_build_cells), the
coarse-quantizer centroids (seeded or kmeans_fit-trained), and the PQ
code table (pq.exploded_codes) saved as parquet relations and loaded
back for search, so index construction is an AMORTIZED artifact (FAISS
writes an index file; a Spark warehouse writes index tables).

At 100 TB: the cells relation is (id, vector, cell) — same order as the
corpus, written partitioned on ``cell`` so a search's probed cells prune
to exactly nprobe/C of the files (partition pruning does the candidate
bounding that the cell equi-join does in-memory); centroids are C rows;
PQ codes are m small ints per vector. Rebuilds happen on corpus change,
searches read only their probed partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CELLS = "cells"
CENTROIDS = "centroids"
CODES = "codes"


def save_ann_index(
    index_dir: str,
    cells: DataFrame,
    centroids: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> None:
    """Write an index under ``index_dir``: cells/ (partitioned by cell —
    the pruning key), centroids/ (the quantizer, required to route
    future queries consistently), codes/ (optional PQ table)."""
    (
        cells.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, CELLS))
    )
    if centroids is not None:
        centroids.write.mode("overwrite").parquet(
            os.path.join(index_dir, CENTROIDS)
        )
    if codes is not None:
        codes.write.mode("overwrite").parquet(os.path.join(index_dir, CODES))


def load_ann_index(
    spark: SparkSession, index_dir: str
) -> dict[str, DataFrame | None]:
    """Read the index back: {'cells', 'centroids', 'codes'} (absent
    parts -> None). Cells come back with the partition column restored
    to its long type; pass them straight to
    ``cosine_topk_ivf(..., centroids=..., cells=...)``."""
    out: dict[str, DataFrame | None] = {}
    for name in (CELLS, CENTROIDS, CODES):
        path = os.path.join(index_dir, name)
        try:
            df = spark.read.parquet(path)
        except Exception:  # noqa: BLE001 — absent part, AnalysisException
            out[name] = None
            continue
        if name == CELLS:
            df = df.select(
                "neighbor_id", "c_vec", F.col("cell").cast("long").alias("cell")
            )
        out[name] = df
    return out
