"""Product quantization (PQ) — compressed-domain ANN for embedding
columns, the FAISS-style design (Jégou/Douze/Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public).

Why this exists next to LSH/IVF (similarity.py): at 100 TB the
dominant ANN cost is *reading vectors*. PQ stores an m-byte code per
vector instead of 4·d bytes (64-dim float → 8 bytes, a 32× scan-size
reduction), and answers queries from the codes alone via an
asymmetric distance computation (ADC) table — the corpus's float
vectors are never touched at query time. Composition with IVF
(coarse cells → PQ within cell) is the standard trillion-scale stack.

Scale shape:
  - ``pq_train``: driver-side numpy Lloyd iterations over a BOUNDED
    sample (≤ ``fit_sample`` rows via ``limit`` — no full scan; same
    sampling policy as ``ivf_ann_topk``). The codebook is m·2^nbits·dsub
    floats (KBs), broadcast everywhere else.
  - ``pq_encode``: one distributed pass; an Arrow-batched pandas UDF
    does the per-subspace argmin as one einsum per batch. Output is
    ``array<smallint>`` of length m — the only column a query scan
    needs.
  - ``pq_ann_topk``: the query builds an (m × 2^nbits) ADC table on the
    driver (closure-broadcast), each row's approximate distance is an
    O(m) table gather — no d-dim math per row — then
    ``TakeOrderedAndProject`` returns k rows. Optional exact-rescore
    of ``refine × k`` candidates re-attaches true vectors for the
    final ordering (ids-only shuffle, standard two-stage retrieval).

Determinism: seeded init, fixed iteration count, ties broken by
lowest centroid index → same data + seed ⇒ identical codebooks,
codes, and top-k on any cluster size.
"""

# NOTE: no `from __future__ import annotations` — pandas-UDF type
# hints must stay real types (see similarity.py note).
from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pq_train", "pq_encode", "pq_ann_topk",
           "ivfpq_train", "ivfpq_encode", "ivfpq_ann_topk"]


def _sample_matrix(df: DataFrame, vec_col: str, fit_sample: int,
                   id_col: str | None = None) -> np.ndarray:
    """Bounded training sample → (n, d) float64 matrix on the driver.

    When an ``id_col`` exists the sample is HASH-ORDERED
    (``ORDER BY xxhash64(id), id LIMIT n`` → TakeOrderedAndProject:
    per-partition top-k + driver merge, no full sort): a deterministic
    pseudo-random sample whose membership AND row order are invariant
    to partition layout, parallelism, and engine config — plain
    ``limit`` returns whatever splits get scheduled first, which made
    every seeded fit downstream (k-means init indexes rows!)
    nondeterministic across sessions. Falls back to ``limit`` when no
    id column is available."""
    cols = [c.lower() for c in df.columns]
    if id_col is None and "vec_id" in cols:
        id_col = df.columns[cols.index("vec_id")]
    df = df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
    if id_col is not None and id_col in df.columns:
        picked = (df.select(id_col, vec_col)
                  .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
                  .limit(fit_sample).select(vec_col))
    else:
        picked = df.select(vec_col).limit(fit_sample)
    rows = picked.collect()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _kmeans_1d(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd k-means over one subspace: (n, dsub) → (k, dsub)
    centroids. Deterministic: seeded permutation init, fixed ``iters``,
    empty clusters re-seeded from the globally farthest points."""
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    cents = x[rng.permutation(n)[: min(k, n)]].copy()
    if len(cents) < k:  # fewer sample points than centroids: pad
        cents = np.vstack([cents, np.repeat(cents[:1], k - len(cents), 0)])
    for _ in range(iters):
        # (n, k) squared distances via the expansion trick
        d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ cents.T)
              + (cents * cents).sum(1)[None, :])
        assign = d2.argmin(1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cents[j] = x[mask].mean(0)
            else:  # re-seed dead centroid at the worst-served point
                cents[j] = x[d2.min(1).argmax()]
    return cents


def pq_train(df: DataFrame, vec_col: str = "embedding", m: int = 8,
             nbits: int = 8, fit_sample: int = 100_000,
             iters: int = 10, seed: int = 42) -> np.ndarray:
    """Train ``m`` sub-codebooks of ``2^nbits`` centroids each on a
    bounded sample. Returns ``(m, 2^nbits, d/m)`` float64 — kilobytes,
    closure-broadcast to every encode/query task.

    ``d`` must divide by ``m`` (standard PQ constraint)."""
    x = _sample_matrix(df, vec_col, fit_sample)
    if x.size == 0:
        raise ValueError("pq_train: no vectors to train on")
    d = x.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub, k = d // m, 1 << nbits
    return np.stack([
        _kmeans_1d(np.ascontiguousarray(x[:, j * dsub:(j + 1) * dsub]),
                   k, iters, seed + j)
        for j in range(m)])


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding",
              out_col: str = "pq_code") -> DataFrame:
    """Attach the m-byte PQ code: one distributed pass, Arrow-batched;
    per batch the per-subspace argmin is a single (n·m × k) distance
    matrix — vectorized, no per-row Python."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k, dsub = cb.shape
    cb2 = (cb * cb).sum(2)  # (m, k) centroid norms, precomputed once

    @pandas_udf("array<smallint>")
    def enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        X = np.stack([np.asarray(e, dtype=np.float64) for e in v])
        n = X.shape[0]
        S = X.reshape(n, m, dsub)  # (n, m, dsub)
        # (n, m, k): ||s - c||² = ||s||² - 2 s·c + ||c||²; the ||s||²
        # term is constant per (row, subspace) → skip it for argmin
        dots = np.einsum("nmd,mkd->nmk", S, cb)
        codes = (cb2[None, :, :] - 2.0 * dots).argmin(2).astype(np.int16)
        return pd.Series(list(codes))

    return df.withColumn(out_col, enc(F.col(vec_col)))


def pq_ann_topk(df: DataFrame, query: Sequence[float],
                codebooks: np.ndarray, k: int = 10,
                id_col: str = "vec_id", code_col: str = "pq_code",
                vec_col: str | None = None, refine: int = 0,
                round_digits: int = 4) -> DataFrame:
    """Top-k nearest (smallest L2) by asymmetric distance over PQ codes.

    The scan reads (id, m-smallint code) only; per row the distance is
    a sum of m table lookups against the broadcast ADC table. With
    ``refine > 0`` the ``refine × k`` best candidates are exactly
    re-scored by cosine on the true vectors (``vec_col`` required) —
    the candidate set is ids-only until the final k·refine-row join.

    Returns ``(id_col, score)`` where score is ``-distance²`` (so
    descending = nearest, matching the cosine-topk orientation) or the
    exact cosine when refining. Ties break on ``id_col``.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, kk, dsub = cb.shape
    q = np.asarray(list(query), dtype=np.float64).reshape(m, 1, dsub)
    adc = ((cb - q) ** 2).sum(2)  # (m, 2^nbits) partial squared dists

    @pandas_udf("double")
    def dist(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        C = np.stack([np.asarray(c, dtype=np.int64) for c in codes])
        return pd.Series(adc[np.arange(m)[None, :], C].sum(1))

    fetch = k * refine if refine else k
    scored = (df.select(F.col(id_col), dist(F.col(code_col)).alias("_d"))
              .orderBy(F.col("_d").asc(), F.col(id_col).asc())
              .limit(fetch))
    if not refine:
        return scored.select(
            id_col, F.round(-F.col("_d"), round_digits).alias("score"))
    if vec_col is None:
        raise ValueError("pq_ann_topk: refine requires vec_col")
    from .similarity import cosine_topk

    cand = df.join(scored.select(id_col), on=id_col, how="left_semi")
    return cosine_topk(cand, list(query), vec_col=vec_col,
                       id_col=id_col, k=k, round_digits=round_digits)


def ivfpq_train(df: DataFrame, vec_col: str = "embedding",
                nlist: int = 16, m: int = 8, nbits: int = 8,
                fit_sample: int = 100_000, iters: int = 10,
                seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Train the IVF+PQ composite index (FAISS ``IVFx,PQy`` — the
    standard billion-to-trillion-scale layout): a coarse ``nlist``-cell
    k-means partitions the space, and PQ codebooks quantize the
    RESIDUAL (vector − its cell centroid), which carries far less
    variance than the raw vector — same bytes, better recall.

    One bounded driver-side sample feeds both fits. Returns
    ``(coarse (nlist, d), codebooks (m, 2^nbits, d/m))`` — kilobytes,
    closure-broadcast by encode/query.
    """
    x = _sample_matrix(df, vec_col, fit_sample)
    if x.size == 0:
        raise ValueError("ivfpq_train: no vectors to train on")
    d = x.shape[1]
    if d % m:
        raise ValueError(f"ivfpq_train: dim {d} not divisible by m={m}")
    coarse = _kmeans_1d(x, nlist, iters, seed)
    d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ coarse.T)
          + (coarse * coarse).sum(1)[None, :])
    resid = x - coarse[d2.argmin(1)]
    dsub, k = d // m, 1 << nbits
    books = np.stack([
        _kmeans_1d(np.ascontiguousarray(resid[:, j * dsub:(j + 1) * dsub]),
                   k, iters, seed + 1 + j)
        for j in range(m)])
    return coarse, books


def ivfpq_encode(df: DataFrame, coarse: np.ndarray,
                 codebooks: np.ndarray, vec_col: str = "embedding",
                 cell_col: str = "ivf_cell",
                 code_col: str = "pq_code") -> DataFrame:
    """One distributed pass: assign the coarse cell, PQ-encode the
    residual. At rest, write the result partitioned/clustered by
    ``cell_col`` so queries partition-prune to their probed cells —
    that layout, plus the m-byte codes, is what makes the 100 TB probe
    an I/O nibble instead of a scan."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    co = np.ascontiguousarray(coarse, dtype=np.float64)
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k, dsub = cb.shape
    co2 = (co * co).sum(1)
    cb2 = (cb * cb).sum(2)

    @pandas_udf(f"struct<{cell_col}:smallint,{code_col}:array<smallint>>")
    def enc(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({cell_col: pd.Series([], dtype="int16"),
                                 code_col: pd.Series([], dtype="object")})
        X = np.stack([np.asarray(e, dtype=np.float64) for e in v])
        n = X.shape[0]
        cells = (co2[None, :] - 2.0 * (X @ co.T)).argmin(1)
        R = (X - co[cells]).reshape(n, m, dsub)
        dots = np.einsum("nmd,mkd->nmk", R, cb)
        codes = (cb2[None, :, :] - 2.0 * dots).argmin(2).astype(np.int16)
        return pd.DataFrame({cell_col: cells.astype(np.int16),
                             code_col: list(codes)})

    packed = df.withColumn("_ivfpq", enc(F.col(vec_col)))
    return (packed.withColumn(cell_col, F.col(f"_ivfpq.{cell_col}"))
            .withColumn(code_col, F.col(f"_ivfpq.{code_col}"))
            .drop("_ivfpq"))


def ivfpq_ann_topk(df: DataFrame, query, coarse: np.ndarray,
                   codebooks: np.ndarray, k: int = 10, nprobe: int = 2,
                   id_col: str = "vec_id", cell_col: str = "ivf_cell",
                   code_col: str = "pq_code", vec_col: str | None = None,
                   refine: int = 0, round_digits: int = 4) -> DataFrame:
    """Probe the ``nprobe`` cells nearest the query; score their rows
    by ADC against per-cell residual tables (the query's residual
    differs per cell, so each probed cell gets its own (m × 2^nbits)
    table — all precomputed on the driver, a few KB).

    The ``cell IN probes`` filter is an ordinary pushable predicate:
    over a cell-partitioned table it prunes I/O before any compute.
    Scan payload is (id, cell, m smallints). ``refine`` re-scores the
    top ``refine × k`` exactly by cosine (needs ``vec_col``).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    co = np.ascontiguousarray(coarse, dtype=np.float64)
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, kk, dsub = cb.shape
    q = np.asarray(list(query), dtype=np.float64)
    cd = ((co - q[None, :]) ** 2).sum(1)
    probes = np.argsort(cd, kind="stable")[:nprobe].astype(int)
    # per-probed-cell ADC tables over the cell-residual query
    tables = {}
    for c in probes:
        r = (q - co[c]).reshape(m, 1, dsub)
        tables[int(c)] = ((cb - r) ** 2).sum(2)

    @pandas_udf("double")
    def dist(cells: pd.Series, codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        C = np.stack([np.asarray(c, dtype=np.int64) for c in codes])
        out = np.empty(len(codes))
        cells_np = cells.to_numpy()
        for c, tab in tables.items():
            mask = cells_np == c
            if mask.any():
                out[mask] = tab[np.arange(m)[None, :], C[mask]].sum(1)
        return pd.Series(out)

    cand = df.where(F.col(cell_col).isin([int(c) for c in probes]))
    fetch = k * refine if refine else k
    scored = (cand.select(F.col(id_col),
                          dist(F.col(cell_col),
                               F.col(code_col)).alias("_d"))
              .orderBy(F.col("_d").asc(), F.col(id_col).asc())
              .limit(fetch))
    if not refine:
        return scored.select(
            id_col, F.round(-F.col("_d"), round_digits).alias("score"))
    if vec_col is None:
        raise ValueError("ivfpq_ann_topk: refine requires vec_col")
    from .similarity import cosine_topk

    sel = df.join(scored.select(id_col), on=id_col, how="left_semi")
    return cosine_topk(sel, list(query), vec_col=vec_col,
                       id_col=id_col, k=k, round_digits=round_digits)
