"""incremental_topk (operators/similarity.py): batch-fold maintenance of
exact top-k neighbor lists must equal a full-corpus recompute."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_gardener_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 8)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(60)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _key(rows):
    return sorted((r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in rows)


def test_incremental_equals_full_recompute(corpus):
    queries = corpus.filter(F.col("vec_id") < 3)
    old = corpus.filter(F.col("vec_id") < 40)
    new = corpus.filter(F.col("vec_id") >= 40)
    old_topk = SIM.cosine_topk(old, queries, k=4)
    inc = SIM.incremental_topk(old_topk, queries, new, k=4)
    full = SIM.cosine_topk(corpus, queries, k=4)
    assert _key(inc.collect()) == _key(full.collect())


def test_incremental_with_empty_batch_is_identity(corpus, spark):
    queries = corpus.filter(F.col("vec_id") < 3)
    old_topk = SIM.cosine_topk(corpus, queries, k=4)
    empty = corpus.filter(F.lit(False))
    inc = SIM.incremental_topk(old_topk, queries, empty, k=4)
    assert _key(inc.collect()) == _key(old_topk.collect())


def test_repeated_folds_converge(corpus):
    """Folding the corpus in three chunks equals one full recompute —
    the append-loop invariant."""
    queries = corpus.filter(F.col("vec_id") < 3)
    c1 = corpus.filter(F.col("vec_id") < 20)
    c2 = corpus.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 40))
    c3 = corpus.filter(F.col("vec_id") >= 40)
    acc = SIM.cosine_topk(c1, queries, k=4)
    acc = SIM.incremental_topk(acc, queries, c2, k=4)
    acc = SIM.incremental_topk(acc, queries, c3, k=4)
    full = SIM.cosine_topk(corpus, queries, k=4)
    assert _key(acc.collect()) == _key(full.collect())


def test_negative_samples_excludes_neighbors_and_self(corpus):
    from pyspark.sql import functions as F

    queries = corpus.filter(F.col("vec_id") < 2)
    topm = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk(corpus, queries, k=5).collect()
    }
    negs = SIM.negative_samples(corpus, queries, k_neg=7, exclude_topm=5).collect()
    per_q: dict[int, int] = {}
    for r in negs:
        assert (r["query_id"], r["neg_id"]) not in topm
        assert r["neg_id"] != r["query_id"]
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert per_q == {0: 7, 1: 7}


def test_negative_samples_deterministic(corpus):
    from pyspark.sql import functions as F

    queries = corpus.filter(F.col("vec_id") < 2)
    a = {(r["query_id"], r["neg_id"], r["rank"]) for r in SIM.negative_samples(corpus, queries).collect()}
    b = {(r["query_id"], r["neg_id"], r["rank"]) for r in SIM.negative_samples(corpus.repartition(9), queries).collect()}
    assert a == b
