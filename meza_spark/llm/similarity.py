"""Similarity search over embedding columns (``array<float>``).

Two tiers, as any vector system at scale:
  - ``cosine_topk``: brute-force exact scan — the baseline. Row-local
    ``zip_with``/``aggregate`` dot products (JVM, no Python), one
    top-k reduction. O(n·d) per query; right answer, linear cost.
  - ``lsh_ann_topk``: random-hyperplane LSH bucketing — sign bits of
    fixed pseudo-random hyperplane projections form a bucket key;
    queries only scan their bucket (+ optional multi-probe neighbors).
    The 100 TB path: bucket key is shuffle/partition-prunable.
  - ``embedding_near_dupes``: all-pairs near-duplicate detection via
    the same LSH buckets (embedding-cosine dedupe for training data).
"""

# NOTE: deliberately NO `from __future__ import annotations` here — it
# would stringify the pandas-UDF type hints, and pandas_udf cannot
# resolve `pd.Series` strings for functions defined inside closures
# (pd is not in the module globals get_type_hints consults).
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "lsh_ann_topk", "ivf_ann_topk",
           "embedding_near_dupes", "cosine_join",
           "normalize_embeddings", "cosine_sim",
           "nearest_centroid", "kmeans_clusters"]


def _lit_dvec_sql(vals) -> str:
    """SQL text of a literal ``array<double>``.

    ``F.array(*[F.lit(float(x)) for x in vals])`` creates one py4j
    round-trip per element — a 64-dim codebook of 8-16 vectors costs
    500-1000 driver→JVM calls PER QUERY BUILD, which profiling showed
    was most of the ANN/k-means queries' construction time
    (optimization r9 fourth pass; guide §7.3 — driver-side plan work
    is real wall time). A rendered ``array(…D, …)`` string crosses
    py4j once and parses to the SAME double literals (``repr`` emits
    the shortest round-trip decimal; the SQL parser reads it back to
    the identical IEEE double), so plans and results are unchanged.
    """
    return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"


def _cast_double_sql(vec_sql: str) -> str:
    """SQL text of ``transform(vec, x -> cast double)`` — the element
    cast ``cosine_sim`` applies to both of its sides."""
    return f"transform({vec_sql}, x -> CAST(x AS DOUBLE))"


def _cos_lit_sql(vec_sql: str, vals) -> str:
    """SQL text of ``cosine_sim(vec, literal_vector)`` — the EXACT
    expression shapes of :func:`cosine_sim` (same left-to-right fold,
    same casts, same zero-denominator guard), rendered as one string
    so the whole comparison crosses py4j once instead of once per
    lambda/function node. Parsing yields the identical analyzed tree,
    so results are bit-identical (optimization r9 fourth pass; the
    per-node Column API build dominated ANN/k-means query
    construction at ~0.1 s per cosine)."""
    ad = _cast_double_sql(vec_sql)
    bd = _cast_double_sql(_lit_dvec_sql(vals))

    def _norm_sql(e: str) -> str:
        return (f"sqrt(aggregate(transform({e}, x -> x * x), 0.0D, "
                f"(acc, v) -> acc + v))")

    dot = (f"aggregate(zip_with({ad}, {bd}, (x, y) -> x * y), 0.0D, "
           f"(acc, v) -> acc + v)")
    denom = f"({_norm_sql(ad)} * {_norm_sql(bd)})"
    return f"CASE WHEN {denom} > 0 THEN {dot} / {denom} ELSE 0.0D END"


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed in double with a
    deterministic left-to-right fold (stable across engines).

    Zero-norm inputs score 0.0 instead of raising — Spark 4 runs ANSI
    mode by default, where the bare division throws DIVIDE_BY_ZERO on
    the first all-zero vector in a corpus."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    denom = _norm(ad) * _norm(bd)
    return F.when(denom > 0, _dot(ad, bd) / denom).otherwise(F.lit(0.0))


def cosine_topk(df: DataFrame, query: Sequence[float],
                vec_col: str = "embedding", id_col: str = "vec_id",
                k: int = 10, round_digits: int | None = 4) -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector.

    The scan is embarrassingly parallel; top-k is Spark's
    ``TakeOrderedAndProject`` (per-partition heap, k rows to driver).
    ``round_digits`` quantizes the score for cross-engine determinism;
    ties break on ``id_col``.
    """
    sim = F.expr(_cos_lit_sql(f"`{vec_col}`", query))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = df.select(F.col(id_col), sim.alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _bucket_key(vec_sql: str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed pseudo-random hyperplanes.

    ``vec_sql`` is the SQL text of the vector expression (usually a
    backquoted column name). The whole key — one dot product, sign
    test and shifted bit per plane, OR-folded — is rendered as a
    single SQL string and parsed once: the Column-API build of the
    same tree cost ~1 s of py4j round-trips per query at 8 planes ×
    64 dims (optimization r9 fourth pass). The parsed expressions are
    the identical shapes (same fold, same casts), so bucket ids are
    unchanged."""
    ad = _cast_double_sql(vec_sql)
    key = "CAST(0 AS BIGINT)"
    for i, p in enumerate(planes):
        dot = (f"aggregate(zip_with({ad}, {_lit_dvec_sql(p)}, "
               f"(x, y) -> x * y), 0.0D, (acc, v) -> acc + v)")
        bit = (f"CASE WHEN {dot} >= 0 THEN "
               f"shiftleft(CAST(1 AS BIGINT), {i}) "
               f"ELSE CAST(0 AS BIGINT) END")
        key = f"({key} | {bit})"
    return F.expr(key)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (splitmix-style LCG so no
    numpy RNG state dependency)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_ann_topk(df: DataFrame, query: Sequence[float],
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 k: int = 10, n_planes: int = 8, seed: int = 42,
                 multiprobe: int = 1) -> DataFrame:
    """Approximate NN: scan only the query's LSH bucket (plus buckets at
    Hamming distance ≤ ``multiprobe`` of it).

    At 100 TB the table is written partitioned/bucketed by this key, so
    the probe is partition-pruned I/O — a few buckets instead of a full
    scan. Here the bucket filter still saves the distance computation
    for ~(1 - (multiprobe+1+n_planes)/2^n_planes) of rows.
    """
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qkey = 0
    for i, p in enumerate(planes):
        if sum(q * x for q, x in zip(query, p)) >= 0:
            qkey |= 1 << i
    probe_keys = [qkey]
    if multiprobe >= 1:
        probe_keys += [qkey ^ (1 << b) for b in range(n_planes)]

    bucketed = df.withColumn("_bucket",
                             _bucket_key(f"`{vec_col}`", planes))
    cand = bucketed.where(F.col("_bucket").isin(probe_keys))
    return cosine_topk(cand, query, vec_col, id_col, k)


def embedding_near_dupes(df: DataFrame, vec_col: str = "embedding",
                         id_col: str = "vec_id", threshold: float = 0.9,
                         n_planes: int = 8, seed: int = 42,
                         block_on: str | None = None,
                         round_digits: int | None = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucketed self-join, then
    exact cosine verification ≥ ``threshold``. Shuffle key is the
    bucket id; the quadratic term is bounded by bucket size.

    Buckets come from random-hyperplane LSH by default (approximate:
    pairs split across buckets are missed — recall tunes with fewer
    planes). ``block_on`` names an existing column to use as the bucket
    instead (e.g. a cluster/label/shard key): exact within blocks and
    deterministic, the pattern to use when the pipeline already carries
    a coarse grouping."""
    if block_on is not None:
        bucket = F.col(block_on)
    else:
        planes = _hyperplanes(_dim_of(df, vec_col), n_planes, seed)
        bucket = _bucket_key(f"`{vec_col}`", planes)
    # rows with null/empty vectors can't pair — drop them JVM-side
    # before the kernel (a None would break np.stack's shape)
    b = (df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
         .select(F.col(id_col).alias("_id"),
                 F.transform(vec_col, lambda x: x.cast("double"))
                 .alias("_v"),
                 bucket.alias("_bucket")))

    # Per-bucket grouped kernel (r3 perf): the previous shape (ids-only
    # self-join → re-attach BOTH vectors per candidate pair → scalar
    # UDF) shipped 2·d doubles through the shuffle for EVERY candidate
    # pair — at sf0.1 that was ~1.5M pair-rows × 128 doubles, the
    # measured cost of the query. Here each bucket's vectors shuffle
    # ONCE (n rows, not n²), pairs are scored inside the kernel with
    # the same cumsum fold (bit-identical to cosine_sim's left-to-right
    # summation), and only surviving pairs leave the task. The
    # quadratic term is still bounded by bucket size — same knob as
    # before (n_planes / block_on granularity).
    import numpy as np
    import pandas as pd

    # conservative in-kernel cutoff: the authoritative filter below is
    # Spark's round(cos, 6) >= threshold (engine rounding semantics
    # identical to the previous implementation); the kernel keeps a
    # 1e-6 margin so boundary pairs can't be lost to float rounding
    cut = threshold - 1e-6

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "_cos": pd.Series([], dtype="float64")})
        order = np.argsort(pdf["_id"].to_numpy(), kind="stable")
        ids = pdf["_id"].to_numpy()[order]
        A = np.stack([np.asarray(x, dtype=np.float64)
                      for x in pdf["_v"].to_numpy()[order]])
        norms = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
        out_a, out_b, out_c = [], [], []
        for i in range(n - 1):
            dots = np.cumsum(A[i] * A[i + 1:], axis=1)[:, -1]
            denom = norms[i] * norms[i + 1:]
            cos = np.where(denom > 0,
                           dots / np.where(denom > 0, denom, 1.0), 0.0)
            keep = np.nonzero(cos >= cut)[0]
            if keep.size:
                out_a.append(np.full(keep.size, ids[i]))
                out_b.append(ids[i + 1:][keep])
                out_c.append(cos[keep])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "_cos": pd.Series([], dtype="float64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "_cos": np.concatenate(out_c)})

    scored = b.groupBy("_bucket").applyInPandas(
        score_block, schema="id_a long, id_b long, _cos double")
    # multi-bucket collisions (LSH path) can emit a pair twice with the
    # same score — dedupe on ids; block_on emits each pair once.
    # ``round_digits=None`` keeps the RAW cosine: Spark's round() on
    # doubles goes through the shortest decimal string (0.35355 →
    # 0.3536) while other engines round the exact binary value — for
    # cross-engine comparisons quantize to integer micro-units instead.
    cosine = F.col("_cos") if round_digits is None \
        else F.round(F.col("_cos"), round_digits)
    out = (scored.dropDuplicates(["id_a", "id_b"])
           .select("id_a", "id_b", cosine.alias("cosine"))
           .where(F.col("cosine") >= threshold))
    return out


def normalize_embeddings(df: DataFrame, vec_col: str = "embedding",
                         out: str | None = None) -> DataFrame:
    """L2-normalize an embedding column (unit vectors make cosine a
    plain dot product downstream). Row-local array transform in
    double; zero vectors pass through unchanged rather than NaN."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    unit = F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    return df.withColumn(out or vec_col, unit)


def cosine_join(left: DataFrame, right: DataFrame,
                threshold: float = 0.9,
                vec_col: str = "embedding", id_col: str = "vec_id",
                block_on: str | None = None,
                n_planes: int = 8, seed: int = 42,
                max_bucket: int | None = 10_000,
                round_digits: int | None = 6) -> DataFrame:
    """Two-table similarity join: all (left, right) pairs with cosine
    ≥ ``threshold`` — the cross-corpus linkage op (eval-contamination
    scans, corpus-vs-corpus overlap audits).

    Same scale shape as :func:`embedding_near_dupes` but A×B instead
    of self: both sides bucket on the SAME hyperplanes (or a shared
    ``block_on`` column — exact within blocks, deterministic), the
    bucket join carries ids only, vectors re-attach to the candidate
    set, and a vectorized numpy kernel rescores. ``max_bucket`` drops
    buckets whose LEFT-side size exceeds the cap (hot-bucket guard).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if block_on is not None:
        lb = F.col(block_on)
        rb = F.col(block_on)
    else:
        planes = _hyperplanes(_dim_of(left, vec_col), n_planes, seed)
        lb = _bucket_key(f"`{vec_col}`", planes)
        rb = _bucket_key(f"`{vec_col}`", planes)
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    left, right = left.where(ok), right.where(ok)
    lk = left.select(F.col(id_col).alias("id_a"), lb.alias("_bucket"))
    rk = right.select(F.col(id_col).alias("id_b"), rb.alias("_bucket"))
    if max_bucket is not None:
        from pyspark.sql import Window
        cnt = F.count("*").over(Window.partitionBy("_bucket"))
        lk = lk.withColumn("_c", cnt).where(F.col("_c") <= max_bucket) \
               .drop("_c")
    cand = (lk.join(rk, on="_bucket")
            .select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]))
    va = left.select(F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("va"))
    vb = right.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("vb"))
    pairs = cand.join(va, on="id_a").join(vb, on="id_b")

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(x, dtype=np.float64) for x in a])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in b])
        dot = np.cumsum(A * B, axis=1)[:, -1]
        na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
        nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
        denom = na * nb
        out = np.where(denom > 0, dot / np.where(denom > 0, denom, 1.0),
                       0.0)
        return pd.Series(out)

    sim = cos(F.col("va"), F.col("vb"))
    if round_digits is not None:  # None = raw (see embedding_near_dupes)
        sim = F.round(sim, round_digits)
    return pairs.select("id_a", "id_b", sim.alias("cosine")) \
                .where(F.col("cosine") >= threshold)


def nearest_centroid(df: DataFrame, centroids: DataFrame,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     cent_id_col: str = "centroid_id",
                     cent_vec_col: str | None = None,
                     round_digits: int | None = 6) -> DataFrame:
    """Assign every vector to its most-cosine-similar centroid:
    ``(id, centroid_id, cosine)`` — the building block of topic
    bucketing / coarse quantization over a *given* codebook.

    ``centroids`` is a small frame (k rows). Plan: broadcast cross
    join (no shuffle of the big side) → row-local JVM cosine → argmax
    per row via ``max(struct(sim, -cid))`` — partial aggregation
    map-side, so the only exchange is the k-row broadcast. Ties break
    toward the smallest centroid id (deterministic, and ``round_digits``
    quantizes the score so cross-engine comparisons agree).

    Scale: cost is O(n·k·d) row-local flops with zero data movement of
    the corpus — exactly how you want assignment to look at 100 TB.
    For k beyond a few hundred, switch to ``ivf_ann_topk``-style
    pre-bucketing instead of widening the broadcast.
    """
    cvec = cent_vec_col or vec_col
    cents = F.broadcast(centroids.select(
        F.col(cent_id_col).cast("long").alias("_cid"),
        F.col(cvec).alias("_cvec")))
    sim = cosine_sim(F.col(vec_col), F.col("_cvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (df.crossJoin(cents)
              .select(F.col(id_col), F.col("_cid"), sim.alias("_sim")))
    best = (scored.groupBy(id_col)
            .agg(F.max(F.struct(F.col("_sim").alias("s"),
                                (-F.col("_cid")).alias("nc"))).alias("b")))
    return best.select(id_col,
                       (-F.col("b.nc")).alias(cent_id_col),
                       F.col("b.s").alias("cosine"))


def _argmax_assign(cents_np, vec_col: str,
                   round_digits: int | None = 6) -> tuple[Column, Column]:
    """Row-local nearest-centroid assignment against a DRIVER-side
    codebook: ``(centroid_id, cosine)`` column expressions computed as
    a literal-array argmax — zero data movement, zero row inflation.

    Replaces the ``nearest_centroid`` broadcast-crossJoin + groupBy
    shape when the codebook already lives on the driver (the k-means
    fit collects it anyway): the crossJoin inflated the corpus k× into
    the partial aggregation and the groupBy re-shuffled the full
    corpus by id (optimization r9 fourth pass, guide §2.4/§8 — decide
    row-locally, never shuffle the payload). Bit-identical to the old
    path: same ``cosine_sim`` fold over the same float64 literals,
    same round, and ``array_position`` returns the FIRST index of the
    max — exactly the old ``max(struct(sim, -cid))`` smallest-id
    tie-break."""
    sims = []
    for c in cents_np:
        s = _cos_lit_sql(f"`{vec_col}`", c)
        sims.append(f"round({s}, {round_digits})"
                    if round_digits is not None else s)
    arr = F.expr("array(" + ",".join(sims) + ")")
    best = F.array_max(arr)
    cid = (F.array_position(arr, best) - 1).cast("long")
    return cid, best


def kmeans_clusters(df: DataFrame, k: int = 8,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 42, fit_sample: int = 100_000,
                    max_iter: int = 10) -> DataFrame:
    """Full k-means topic clustering: fit on a bounded sample
    (``limit`` — no full scan, same policy as IVF), then assign the
    whole corpus row-locally against the learned codebook. Returns
    ``(id, centroid_id, cosine)``.

    The fit touches ≤ ``fit_sample`` rows; assignment is a row-local
    literal-array argmax (``_argmax_assign``) — the corpus is scanned
    once with NO shuffle and NO k× row inflation (the previous
    ``nearest_centroid`` composition crossJoined the broadcast
    codebook and re-aggregated by id; optimization r9). Deterministic
    end-to-end (r3): hash-ordered sample + seeded numpy Lloyd,
    invariant to partition layout and engine config."""
    cents_np = _fit_kmeans(df, vec_col, k, seed, fit_sample,
                           id_col=id_col)
    cid, best = _argmax_assign(cents_np, vec_col)
    return df.select(F.col(id_col), cid.alias("centroid_id"),
                     best.alias("cosine"))


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    return int(row[0]["d"]) if row else 0


def _ivf_train_df(df: DataFrame, vec_col: str, fit_sample: int,
                  id_col: str | None = None) -> DataFrame:
    """Bounded k-means training input: at most ``fit_sample`` vectors.
    With an id column the sample is hash-ordered (TakeOrderedAndProject
    — per-partition top-k, no full sort, no full scan) so membership
    and order are partition-layout-invariant; else LocalLimit+
    GlobalLimit."""
    vecs = df.where(F.col(vec_col).isNotNull()
                    & (F.size(vec_col) > 0)).select(
        *( [F.col(id_col)] if id_col and id_col in df.columns else [] ),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"))
    if id_col and id_col in df.columns:
        vecs = vecs.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
    return vecs.limit(fit_sample).select("_v")


def _fit_kmeans(df: DataFrame, vec_col: str, nlist: int, seed: int,
                fit_sample: int, id_col: str | None = None,
                iters: int = 10):
    """Seeded driver-side numpy Lloyd over the bounded sample — the
    FAISS coarse-quantizer pattern (train small, assign distributed).
    Replaced pyspark.ml KMeans (r3): the ML fit's k-means|| init
    depends on RDD partition layout, so identical data could yield
    different centroids under a different session config; the numpy
    fit on a hash-ordered sample is bit-deterministic everywhere, and
    skips several Spark jobs per fit. Returns (nlist, d) float64."""
    import numpy as np

    from .pq import _kmeans_1d

    rows = _ivf_train_df(df, vec_col, fit_sample, id_col=id_col).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    return _kmeans_1d(x, nlist, iters, seed)


def ivf_ann_topk(df: DataFrame, query, k: int = 10,
                 nlist: int = 16, nprobe: int = 2,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 seed: int = 42, fit_sample: int = 100_000) -> DataFrame:
    """IVF-style ANN: coarse-quantize vectors to ``nlist`` centroids
    (k-means), probe the ``nprobe`` centroids nearest the query, exact
    cosine inside the probed cells only.

    Scale shape: train once on a bounded sample (driver holds nlist
    centroids, not data), assignment is a row-local argmin over nlist
    dot products, and the probed scan touches ~nprobe/nlist of the
    corpus. The index (assignments) can be persisted with the table and
    reused across queries — the classic IVF trade of recall for scan
    fraction.

    ``fit_sample`` caps the k-means training input (hash-ordered
    top-k, no full scan): centroid quality needs a few thousand points
    per cell, not 10 passes over a 100 TB corpus.
    """
    cents_np = _fit_kmeans(df, vec_col, nlist, seed, fit_sample,
                           id_col=id_col)
    centroids = [list(map(float, c)) for c in cents_np]

    def _cell(vec_sql: str) -> Column:
        # argmin over nlist squared distances, row-local; rendered as
        # ONE SQL string (same shapes, one py4j call — see _cos_lit_sql)
        dists = ",".join(
            f"aggregate(zip_with({vec_sql}, {_lit_dvec_sql(c)}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v)"
            for c in centroids)
        return F.expr(f"array_position(array({dists}), "
                      f"array_min(array({dists})))")

    qd = [float(x) for x in query]
    qdist = [(sum((a - b) ** 2 for a, b in zip(qd, c)), i)
             for i, c in enumerate(centroids)]
    probes = [i + 1 for _, i in sorted(qdist)[:nprobe]]  # 1-based cells

    cand = df.withColumn(
        "_cell", _cell(_cast_double_sql(f"`{vec_col}`"))) \
        .where(F.col("_cell").isin(probes))
    return cosine_topk(cand, query, vec_col, id_col, k)
