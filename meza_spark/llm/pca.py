"""PCA / whitening for embedding columns — the dimensionality-reduction
step in front of ANN indexing and SemDeDup-style clustering (OPQ/PCA
pre-rotation is standard in the FAISS pipeline; public).

Scale design: the covariance fit is ONE distributed pass of exact
decimal-accumulated moments — sums are order-free, so the fitted
components are bit-identical on any partition layout, executor count,
or engine config (the property every VALUES-pinned oracle and the
cross-config determinism audit require). The d×d eigendecomposition is
driver-side numpy (d is the embedding width — always driver-sized);
projection is one broadcast matmul per Arrow batch.

Reference parity: the reference has no linear-algebra surface (meza is
tabular ETL); this module is charter-layer (SURVEY §2.11).
"""

# No `from __future__ import annotations`: stringified hints break
# pandas_udf type-hint inference for the projection kernel (same
# policy as llm/text.py).

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_fit", "pca_project"]


# fixed-point scale for the exact moment accumulation: products are
# quantized ROW-LOCALLY to integer multiples of 2^-32 (layout-invariant
# by construction), then summed with arbitrary-precision integer
# arithmetic (associative → order-free). Relative quantization error
# ~2^-32 per term — 5 orders below the 1e-6 transport rounding.
_PCA_SCALE = 1 << 32


def pca_fit(df: DataFrame, vec_col: str = "embedding",
            k: int = 8):
    """Fit a PCA basis over an ``array<float|double>`` column.
    Returns ``(mean, components, explained_var)`` numpy arrays of
    shapes ``(d,)``, ``(k, d)``, ``(k,)``.

    The moment pass is ONE Arrow-batched scan: each partition
    accumulates count, Σx and ΣxxT with numpy, with every per-row
    term quantized to an integer grid (``2^-32``) BEFORE summation —
    integer addition is associative, so the partition partials (and
    their driver-side total) are bit-identical on ANY partition
    layout, executor count, or engine config: the property the
    VALUES-pinned oracle and the cross-config determinism audit
    require, without the d²-per-row explode a decimal groupBy pass
    would cost. Each partition emits ONE row (d + d² integer strings,
    driver-bounded); the d×d eigendecomposition is driver-side numpy.

    Eigenvector sign is fixed deterministically: the largest-|x|
    coordinate of each component is made positive (ties → lowest
    index, numpy argmax).
    """
    import numpy as np

    base = (df.where(F.col(vec_col).isNotNull()
                     & (F.size(vec_col) > 0))
            .select(F.transform(vec_col, lambda x: x.cast("double"))
                    .alias("_v")))
    scale = _PCA_SCALE

    def _slab_sum(q):
        # max |element| bounded via max/-min (review r9: np.abs built a
        # full rows×d² temporary per slab just for this bound); the
        # int64-first total is bit-identical whenever it cannot
        # overflow, which the bound proves (object-path fallback
        # otherwise).
        m = max(int(q.max(initial=0)), -int(q.min(initial=0)))
        if m and m * len(q) >= (1 << 62):
            return q.sum(axis=0, dtype=object)
        return q.sum(axis=0).astype(object)

    def _moments(it):
        cnt = 0
        s = None
        ss = None
        for pdf in it:
            vs = [np.asarray(v, dtype=np.float64)
                  for v in pdf["_v"] if v is not None and len(v)]
            if not vs:
                continue
            arr = np.stack(vs)
            if s is None:
                dd = arr.shape[1]
                s = np.zeros(dd, dtype=object)
                ss = np.zeros(dd * dd, dtype=object)
            cnt += len(arr)
            # row-local quantization, then int64 slab sums promoted to
            # python ints (exact, no overflow across slabs).
            # Optimization r9 (guide §1.2 per-task work): sum each
            # slab IN int64 first and promote only the d (resp. d²)
            # partials to objects — `.sum(dtype=object)` boxed every
            # element (rows × d² Python-int adds per slab, the
            # dominant fit cost); see ``_slab_sum`` above for the
            # exactness guard.
            for lo in range(0, len(arr), 1024):
                sl = arr[lo:lo + 1024]
                qs = np.rint(sl * scale).astype(np.int64)
                s += _slab_sum(qs)
                qp = np.rint(
                    np.einsum("bi,bj->bij", sl, sl).reshape(len(sl), -1)
                    * scale).astype(np.int64)
                ss += _slab_sum(qp)
        if cnt:
            yield pd.DataFrame({
                "cnt": [cnt],
                "s": [[str(x) for x in s]],
                "ss": [[str(x) for x in ss]]})

    parts = base.mapInPandas(
        _moments, "cnt long, s array<string>, ss array<string>").collect()
    if not parts:
        raise ValueError("pca_fit: no non-empty vectors")
    n = sum(p["cnt"] for p in parts)
    d = len(parts[0]["s"])
    s_tot = [0] * d
    ss_tot = [0] * (d * d)
    for p in parts:
        for i, x in enumerate(p["s"]):
            s_tot[i] += int(x)
        for i, x in enumerate(p["ss"]):
            ss_tot[i] += int(x)
    mean = np.array([x / scale for x in s_tot]) / n
    exy = np.array([x / scale for x in ss_tot]).reshape(d, d) / n
    cov = (exy + exy.T) / 2 - np.outer(mean, mean)  # symmetrize exactly
    evals, evecs = np.linalg.eigh(cov)       # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                # (k, d)
    explained = evals[order]
    # deterministic sign convention
    for m in range(comps.shape[0]):
        if comps[m, np.argmax(np.abs(comps[m]))] < 0:
            comps[m] = -comps[m]
    return mean, comps, explained


def pca_project(df: DataFrame, vec_col: str = "embedding",
                k: int = 8, out: str = "pca",
                whiten: bool = False, round_digits: int = 6,
                fitted=None) -> DataFrame:
    """Append the ``k``-dim PCA projection of ``vec_col`` as ``out``
    (``array<double>``, each coordinate rounded to ``round_digits``
    for engine-portable transport). ``whiten=True`` scales each
    component by 1/√eigenvalue (unit variance — the OPQ/whitening
    pre-rotation). Pass ``fitted=(mean, components, explained)`` to
    reuse a basis fitted elsewhere (e.g. fit on yesterday's corpus,
    project today's batch).

    The projection is an Arrow-batched numpy matmul against the
    broadcast ``(k, d)`` basis — row-local, no shuffle; null/empty
    vectors project to null.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mean, comps, explained = (fitted if fitted is not None
                              else pca_fit(df, vec_col, k))
    basis = comps.astype(np.float64)
    if whiten:
        basis = basis / np.sqrt(np.maximum(explained, 1e-12))[:, None]
    mu = mean.astype(np.float64)
    digits = round_digits

    @pandas_udf("array<double>")
    def _proj(vs: pd.Series) -> pd.Series:
        def one(v):
            if v is None or len(v) == 0:
                return None
            y = basis @ (np.asarray(v, dtype=np.float64) - mu)
            return np.round(y, digits).tolist()
        return vs.map(one)

    return df.withColumn(out, _proj(F.col(vec_col)))
