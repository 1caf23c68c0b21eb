"""PCA fit/projection vs a plain-numpy reference."""

import numpy as np
import pytest

from meza_spark.llm.pca import pca_fit, pca_project


def _np_pca(X, k):
    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for m in range(comps.shape[0]):
        if comps[m, np.argmax(np.abs(comps[m]))] < 0:
            comps[m] = -comps[m]
    return mu, comps, evals[order]


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    # anisotropic cloud: variance concentrated along two directions
    base = rng.randn(200, 2) @ np.array([[4.0, 1.0, 0.0, 0.5],
                                         [0.0, 2.0, 1.0, 0.0]])
    return base + rng.randn(200, 4) * 0.1


@pytest.fixture(scope="module")
def df(spark, data):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(data)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pca_fit_matches_numpy(df, data):
    mean, comps, expl = pca_fit(df, k=2)
    mu, ncomps, nexpl = _np_pca(data, 2)
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(expl, nexpl, atol=1e-9)
    assert np.allclose(np.abs(comps), np.abs(ncomps), atol=1e-7)
    # sign convention applied identically
    assert np.allclose(comps, ncomps, atol=1e-7)


def test_pca_project_shapes_and_variance(df, data):
    out = pca_project(df, k=2).orderBy("vec_id").collect()
    Y = np.array([r["pca"] for r in out])
    assert Y.shape == (200, 2)
    # component order: first axis carries the most variance
    assert Y[:, 0].var() > Y[:, 1].var() > 0.1
    mu, comps, _ = _np_pca(data, 2)
    ref = (data - mu) @ comps.T
    assert np.allclose(Y, np.round(ref, 6), atol=1e-5)


def test_pca_whiten_unit_variance(df):
    out = pca_project(df, k=2, whiten=True).collect()
    Y = np.array([r["pca"] for r in out])
    # population variance of each whitened axis ≈ 1
    assert np.allclose(Y.var(axis=0), 1.0, atol=1e-3)


def test_pca_project_reuses_fitted_and_nulls(spark, df):
    fitted = pca_fit(df, k=2)
    extra = spark.createDataFrame(
        [(1000, None), (1001, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["pca"]
           for r in pca_project(extra, k=2, fitted=fitted).collect()}
    assert out[1000] is None
    assert len(out[1001]) == 2


def test_pca_fit_empty_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pca_fit(empty)


def test_pca_fit_large_magnitudes_use_overflow_fallback(spark):
    """The int64 slab fast path (optimization r9) must hand off to the
    object path when a slab's max |quantized| magnitude could overflow
    a 64-bit sum. Values ~2e3 quantize products to ~2^54 — over the
    2^62/len guard — so this fit exercises the fallback; the result
    must still match the numpy reference."""
    rng = np.random.RandomState(3)
    data = rng.randn(64, 3) * 2000.0 + 1500.0
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    mean, comps, expl = pca_fit(df, k=2)
    mu, ncomps, nexpl = _np_pca(data, 2)
    assert np.allclose(mean, mu, rtol=1e-12)
    assert np.allclose(expl, nexpl, rtol=1e-9)
    assert np.allclose(comps, ncomps, atol=1e-9)


def test_pca_fit_partition_layout_invariance(spark):
    """Slab-summed moments are exact integers, so the fitted basis is
    bit-identical on any partition layout (the determinism contract
    the VALUES-pinned oracle relies on)."""
    rng = np.random.RandomState(11)
    data = rng.randn(150, 4)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    m1, c1, e1 = pca_fit(df.repartition(13), k=3)
    m2, c2, e2 = pca_fit(df.coalesce(1), k=3)
    assert np.array_equal(m1, m2)
    assert np.array_equal(c1, c2)
    assert np.array_equal(e1, e2)
