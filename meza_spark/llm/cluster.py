"""Pairs → clusters → kept table: the last mile of near-dup dedup.

The reference frames dedupe as records-in/records-out
(ref: meza/process.py:851-898 ``unique``); the MinHash/SimHash/
embedding operators in this package emit candidate *pairs*. This module
closes the gap: distributed connected components over the pair edge
list, then keep one representative (min id) per duplicate cluster —
the operator a training-data pipeline actually calls.

Scale design: edges carry ids only (16 B/row through every shuffle);
each round is one join + one aggregation; lineage is truncated per
round (iterative DataFrame plans otherwise grow without bound); no
driver materialization beyond a one-row convergence aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "near_dedup"]


def _stats_barrier(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and return a frame whose lineage AND size
    statistics are both reset to reality.

    Why not plain ``localCheckpoint``: its ``LogicalRDD`` keeps the
    *estimated* statistics of the plan it replaced (``originStats``).
    Catalyst's default size estimate for a join is the PRODUCT of its
    children's sizes, so in an iterative loop the per-round estimate
    compounds multiplicatively: with j self-joins per round the
    sizeInBytes digit count grows ~(j+1)ˣ per round, and by round ~6
    the optimizer is multiplying 10⁷-digit BigIntegers — planning time
    explodes from <1 s to minutes while the DATA is unchanged
    (observed: 1 s → 5.8 s → 109 s rounds on a 5 k-vertex graph).

    The barrier: persist → count (stats become the measured cache
    size) → localCheckpoint (lineage truncates; originStats now carry
    the small, real number) → unpersist (the checkpoint blocks are
    independent of the cache). One extra cheap job per round buys
    constant-time planning for any number of rounds.
    """
    df = df.persist()
    df.count()
    out = df.localCheckpoint()
    df.unpersist()
    return out


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 30) -> DataFrame:
    """Label each vertex of the pair graph with the min vertex id of
    its connected component. Returns ``(id, component)``.

    Algorithm: min-label propagation with pointer jumping. Per round,
    every vertex takes ``min(own label, neighbors' labels)`` (one
    shuffle join + one agg, O(E) ids-only bytes), then labels chase
    one level of indirection (``label(v) ← label(label(v))``) so chain
    depth halves per round — O(log diameter) rounds total instead of
    O(diameter). Near-dup clusters are near-cliques (diameter 2-3), so
    this settles in a few rounds even on skewed corpora.

    Convergence check is a monotone invariant: labels only decrease,
    so an unchanged ``sum(label)`` is a fixpoint — one cheap aggregate
    per round, no change-count join. Each round is cut with
    ``_stats_barrier`` — persist→count→localCheckpoint — which
    truncates BOTH the lineage and Catalyst's size estimate (see the
    helper's docstring for why plain localCheckpoint is not enough).
    """
    # symmetrize with ONE scan of the (possibly expensive) pair
    # subtree: explode each pair into both directions — a union of the
    # frame with its swap would execute pair generation twice
    a, b = F.col(id_a).cast("long"), F.col(id_b).cast("long")
    edges = (pairs.select(F.explode(F.array(
        F.struct(a.alias("s"), b.alias("d")),
        F.struct(b.alias("s"), a.alias("d")))).alias("e"))
        .select("e.s", "e.d").distinct())
    edges = edges.localCheckpoint()
    # init folds the first propagation in: label₀(v) = min(v, min
    # neighbor) — the groupBy doubles as the distinct-vertices pass
    # (every vertex appears as `s` in the symmetrized edge list), and
    # near-clique duplicate clusters converge on the very next round
    labels = (edges.groupBy("s").agg(F.min("d").alias("_nd"))
              .select(F.col("s").alias("v"),
                      F.least("s", "_nd").alias("label"))
              .localCheckpoint())
    _sum = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
    prev = _sum(labels)
    if prev is None:  # no edges → no labels
        return labels.select(F.col("v").alias("id"),
                             F.col("label").alias("component"))
    for _ in range(max_iter):
        nbr = (edges.join(labels.select(F.col("v").alias("d"),
                                        F.col("label").alias("dl")),
                          on="d")
               .groupBy("s").agg(F.min("dl").alias("nl")))
        stepped = (labels.join(nbr.select(F.col("s").alias("v"), "nl"),
                               on="v", how="left")
                   .select("v", F.least(
                       "label", F.coalesce("nl", "label")).alias("label")))
        # pointer jumping ×3: every label value is itself a vertex id,
        # so label(label(v)) is defined; each chase halves chain depth
        # in the label forest. Three chases per round are label-side
        # joins only (tiny vs the edge join) and compress paths ~8× —
        # long-chain graphs converge in ~log₈(diameter) edge rounds
        for _j in range(3):
            lbl2 = stepped.select(F.col("v").alias("_lv"),
                                  F.col("label").alias("_ll"))
            stepped = (stepped.join(
                lbl2, stepped["label"] == F.col("_lv"), "left")
                .select("v", F.coalesce("_ll", "label").alias("label")))
        labels = _stats_barrier(stepped)
        cur = _sum(labels)
        if cur == prev:
            break
        prev = cur
    return labels.select(F.col("v").alias("id"),
                         F.col("label").alias("component"))


def near_dedup(df: DataFrame, method: str = "minhash",
               text_col: str = "text", id_col: str = "doc_id",
               max_iter: int = 30, **kwargs) -> DataFrame:
    """End-to-end near-duplicate removal: records in, records out
    (the reference's ``unique`` contract, ref meza/process.py:851-898,
    lifted to fuzzy matching).

    Pipeline: candidate pairs by ``method`` → connected components →
    keep the min-``id_col`` representative of each duplicate cluster
    (unique rows pass through untouched).

    Methods and their extra kwargs:
      - ``'minhash'``  → :func:`~meza_spark.llm.dedup.minhash_lsh_pairs`
        (``num_hashes``, ``bands``, ``shingle_n``, ``min_jaccard``)
      - ``'simhash'``  → :func:`~meza_spark.llm.dedup.simhash_pairs`
        (``max_hamming``)
      - ``'ngram'``    → :func:`~meza_spark.llm.dedup.ngram_jaccard`
        (``n``, ``min_jaccard``, ``join_on``) — exact within blocks,
        fully deterministic: the oracle-testable variant
      - ``'embedding'`` → :func:`~meza_spark.llm.similarity.
        embedding_near_dupes` (``vec_col``, ``threshold``,
        ``n_planes``, ``block_on``)

    The final keep is a left-anti join of ``df`` against the (small)
    set of non-representative duplicate ids — broadcastable whenever
    the duplicate fraction is, which is the common case.
    """
    from .dedup import minhash_lsh_pairs, ngram_jaccard, simhash_pairs
    from .similarity import embedding_near_dupes

    if method == "minhash":
        pairs = minhash_lsh_pairs(df, text_col=text_col, id_col=id_col,
                                  **kwargs)
    elif method == "simhash":
        pairs = simhash_pairs(df, text_col=text_col, id_col=id_col,
                              **kwargs)
    elif method == "ngram":
        pairs = ngram_jaccard(df, text_col=text_col, id_col=id_col,
                              **kwargs)
    elif method == "embedding":
        pairs = embedding_near_dupes(df, id_col=id_col, **kwargs)
    else:
        raise ValueError(f"near_dedup: unknown method {method!r}")

    comp = connected_components(pairs.select("id_a", "id_b"),
                                max_iter=max_iter)
    drop = comp.where(F.col("component") != F.col("id")) \
               .select(F.col("id").alias(id_col))
    return df.join(drop, on=id_col, how="left_anti")
