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


def pca_fit(df: DataFrame, vec_col: str = "embedding",
            k: int = 8):
    """Fit a PCA basis over an ``array<float|double>`` column.
    Returns ``(mean, components, explained_var)`` numpy arrays of
    shapes ``(d,)``, ``(k, d)``, ``(k,)``.

    The moment pass: two-level posexplode emits per row the d linear
    terms and the d(d+1)/2 upper-triangle products, then ONE partial-
    aggregated shuffle of ≤ d + d(d+1)/2 groups accumulates them in
    ``decimal(38,18)`` — exact arithmetic, so the covariance matrix
    (and therefore the eigenbasis) is invariant to partition order.
    Map-side combine collapses each partition to ~d²/2 rows before the
    exchange, so shuffle volume is O(partitions · d²), independent of
    row count. For very wide vectors (d ≳ 256) prefer a bounded
    hash-ordered sample fit (the ``_fit_kmeans`` policy) over the
    exact pass — the d² per-row term cost grows quadratically.

    Eigenvector sign is fixed deterministically: the largest-|x|
    coordinate of each component is made positive (ties → lowest
    index, numpy argmax).
    """
    import numpy as np

    base = (df.where(F.col(vec_col).isNotNull()
                     & (F.size(vec_col) > 0))
            .select(F.transform(vec_col, lambda x: x.cast("double"))
                    .alias("_v")))
    e1 = base.select(F.posexplode("_v").alias("_i", "_x"), "_v")
    sums = (e1.groupBy("_i")
            .agg(F.sum(F.col("_x").cast("decimal(38,18)")).alias("s"),
                 F.count(F.lit(1)).alias("c"))
            .collect())
    if not sums:
        raise ValueError("pca_fit: no non-empty vectors")
    d = len(sums)
    n = int(sums[0]["c"])
    s = np.zeros(d)
    for r in sums:
        s[int(r["_i"])] = float(r["s"])
    # upper-triangle products: slice(_v, _i+1, d) pairs x_i with
    # x_j (j >= i); posexplode's 0-based pos p maps to j = _i + p
    e2 = (e1.select("_i", "_x",
                    F.posexplode(F.expr("slice(_v, _i + 1, size(_v))"))
                    .alias("_p", "_y"))
          .select("_i", (F.col("_i") + F.col("_p")).alias("_j"),
                  (F.col("_x") * F.col("_y")).alias("_xy")))
    prods = (e2.groupBy("_i", "_j")
             .agg(F.sum(F.col("_xy").cast("decimal(38,18)")).alias("ss"))
             .collect())
    ssum = np.zeros((d, d))
    for r in prods:
        i, j = int(r["_i"]), int(r["_j"])
        ssum[i, j] = ssum[j, i] = float(r["ss"])
    mean = s / n
    cov = ssum / n - np.outer(mean, mean)
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
