"""Distributed PCA / whitening over embedding columns.

The standard preprocessing for embedding-space dedup and retrieval
(SemDeDup whitens before clustering; IVF recall improves on decorrelated
vectors). For d-dim embeddings the sufficient statistics are tiny —
mean (d) and Gram matrix (d x d) — so the Spark-first shape is:

  1. one ``mapInPandas`` pass emitting PER-ARROW-BATCH partial
     statistics (count, sum vector, X^T X Gram matrix as a flat array):
     thousands of partial rows regardless of corpus size, each a numpy
     GEMM over its batch — the classic map-side-combine for a matrix
     aggregate;
  2. elementwise reduction of the partials — explode the d^2 flat array
     with its index and sum per index (a |partials| x d^2 shuffle, i.e.
     megabytes, not data-scale);
  3. a driver-side ``numpy.linalg.eigh`` of the d x d covariance (d is
     64 here; even d = 4096 is a sub-second eigh) — O(1) in corpus size,
     the one place driver compute is architecturally correct;
  4. projection back over the corpus as a broadcast-free columnar
     expression: each output component is a dot product against a
     LITERAL component vector folded into codegen (no Python, no join).

Determinism: eigenvector signs are pinned (largest-|coefficient| entry
made positive) so reruns and test comparisons are stable. No RNG
anywhere.

No SQL oracle — eigendecomposition is not expressible in DuckDB SQL; the
correctness gate is `tests/test_pca.py` against numpy's full PCA on the
collected corpus (driver-feasible only at test scale).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PcaModel:
    """Fitted PCA: ``mean`` (d,), ``components`` (k, d) rows = top
    eigenvectors by descending eigenvalue, ``explained_var`` (k,)."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    explained_var: tuple[float, ...]


def _partial_stats(vec_col: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [float(len(x))],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    return gen


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PcaModel:
    """Fit PCA from one distributed pass + a driver-side d x d eigh."""
    partials = df.select(vec_col).mapInPandas(
        _partial_stats(vec_col), schema="n double, s array<double>, g array<double>"
    )
    # elementwise-sum the partials: one exploded (index, value) aggregate
    # over |partials| * (d + d^2) rows — tiny relative to the corpus.
    summed = (
        partials.select(
            "n",
            F.posexplode(F.concat(F.col("s"), F.col("g"))).alias("i", "v"),
        )
        .groupBy("i")
        .agg(F.sum("v").alias("v"), F.sum(F.when(F.col("i") == 0, F.col("n"))).alias("n"))
    )
    rows = summed.collect()  # d + d^2 rows — O(model), not O(data)
    if not rows:
        raise ValueError(
            "pca_fit: empty input — no vectors to estimate mean/covariance"
        )
    n = float(next(r["n"] for r in rows if r["i"] == 0))
    d = int(round((np.sqrt(4 * len(rows) + 1) - 1) / 2))  # len = d + d^2
    flat = np.zeros(d + d * d)
    for r in rows:
        flat[r["i"]] = r["v"]
    s, g = flat[:d], flat[d:].reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # pin signs: largest-|coeff| entry of each component is positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return PcaModel(
        mean=tuple(float(v) for v in mean),
        components=tuple(tuple(float(v) for v in c) for c in comps),
        explained_var=tuple(float(evals[i]) for i in order),
    )


def pca_project(
    df: DataFrame, vec_col: str, model: PcaModel, out_col: str = "pc", whiten: bool = False
) -> DataFrame:
    """Project vectors onto the fitted components as pure columnar
    expressions: component coefficients become array LITERALS inside
    ``aggregate(zip_with(...))`` dot products — whole-stage codegen, no
    Python, no join, no broadcast variable to manage. Adds ``out_col``
    as array<double> of length k."""
    comps: list[Column] = []
    for ci, comp in enumerate(model.components):
        # dot((x - mean), comp): fold over zipped (centered, coeff) pairs
        centered = F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.array(*[F.lit(float(m)) for m in model.mean]),
            lambda x, m: x - m,
        )
        dot = F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if whiten:
            dot = dot / F.lit(float(np.sqrt(model.explained_var[ci]) + 1e-12))
        comps.append(dot)
    return df.withColumn(out_col, F.array(*comps))
