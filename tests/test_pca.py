"""PCA fit/project (operators/pca.py) vs numpy's full PCA on the same
data — the correctness gate for the one operator whose math (eigh) is
not SQL-expressible."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_gardener_spark.operators import pca as P


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(7)
    # anisotropic cloud: variance concentrated along two known directions
    base = rng.randn(400, 8) * np.array([5.0, 3.0, 1, 1, 0.5, 0.5, 0.1, 0.1])
    mean = np.arange(8.0)
    x = base + mean
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return x, spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pca_fit_matches_numpy(data):
    x, df = data
    model = P.pca_fit(df, "embedding", k=3)
    np.testing.assert_allclose(np.array(model.mean), x.mean(axis=0), atol=1e-9)
    cov = np.cov(x.T, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(np.array(model.explained_var), evals[:3], rtol=1e-9)
    # components span the top eigenspace: |cos| of each pair ~ 1
    _, evecs = np.linalg.eigh(cov)
    top = evecs[:, np.argsort(np.linalg.eigvalsh(cov))[::-1][:3]].T
    for got, want in zip(np.array(model.components), top):
        cos = abs(float(got @ want) / (np.linalg.norm(got) * np.linalg.norm(want)))
        assert cos > 1 - 1e-9


def test_pca_fit_partition_independent(data):
    x, df = data
    a = P.pca_fit(df, "embedding", k=2)
    b = P.pca_fit(df.repartition(13), "embedding", k=2)
    np.testing.assert_allclose(np.array(a.components), np.array(b.components), atol=1e-9)
    np.testing.assert_allclose(np.array(a.explained_var), np.array(b.explained_var), rtol=1e-12)


def test_pca_project_matches_numpy_and_is_jvm_only(data):
    x, df = data
    model = P.pca_fit(df, "embedding", k=2)
    out = P.pca_project(df, "embedding", model)
    got = {r["vec_id"]: np.array(r["pc"]) for r in out.collect()}
    comps = np.array(model.components)
    want = (x - x.mean(axis=0)) @ comps.T
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], want[i], atol=1e-6)
    # projection is pure codegen: no Python evaluation in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pca_whiten_unit_variance(data):
    x, df = data
    model = P.pca_fit(df, "embedding", k=2)
    out = P.pca_project(df, "embedding", model, whiten=True)
    pcs = np.array([r["pc"] for r in out.collect()])
    np.testing.assert_allclose(pcs.var(axis=0), np.ones(2), rtol=1e-3)
