"""DSIR-style importance resampling over hashed n-gram features.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023 —
public): pick raw-corpus documents whose n-gram distribution resembles
a small TARGET corpus. Fit bag-of-hashed-ngram unigram models for the
target and the raw pools, weight every raw document by the
log-likelihood ratio of its grams under the two models, then resample
with Gumbel top-k (importance resampling without replacement).

Spark-first shape, sized for a 100 TB raw pool:

- Features are (unigram + bigram) counts hashed into a FIXED number of
  buckets ``B`` (default 1024): the model is two length-``B`` count
  vectors, never a vocabulary. The bucket-count aggregation is a
  ``groupBy(bucket)`` whose map-side partial aggregation collapses each
  task's grams to ≤ B rows before the shuffle — the exchange moves
  O(B × partitions) rows regardless of corpus size.
- The fitted log-ratio table is B rows and rides a broadcast join;
  document weighting shuffles only ``(doc_id, bucket, count)`` triples
  (text never leaves the scan stage) and partial-aggregates map-side.
- Weights are integer MICRO-units (``floor(ln(p/q)·1e6 + 0.5)`` per
  bucket, summed as int64): sums are order- and partitioning-invariant,
  so results are bit-identical across engines/cluster sizes, and a SQL
  oracle can reproduce them exactly (the one ``ln`` per bucket is
  quantized to a 1e-6 grid before any accumulation — a last-ulp libm
  difference cannot flip a bucket off-grid).
- Gumbel keys come from md5-hash uniforms (engine-invariant, the
  ``hash_sample`` trick), so the resample is deterministic too.

Reference scope analog: meza's sampling/aggregation surface
(meza/process.py:361-1038) has no corpus-selection primitive; this is
part of the beyond-reference LLM-pipeline charter tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["hashed_gram_buckets", "fit_log_ratios", "dsir_weights",
           "dsir_sample"]

#: 2^52 — md5's first 13 hex digits map to [0, 2^52); +0.5 keeps the
#: uniform strictly inside (0,1) so ln(u) and ln(-ln(u)) are finite.
_U52 = float(1 << 52)


def _bucket(gram, buckets: int):
    """Engine-portable hash bucket: int(md5(gram)[:8], 16) % buckets.

    md5 + hex-prefix parse exist in Spark (``conv``) and ANSI-ish SQL
    engines alike (DuckDB: ``CAST('0x' || substr(md5(g),1,8) AS
    BIGINT)``), unlike xxhash64 — the internal dedup hashers use
    xxhash64 for speed, but DSIR buckets must be oracle-reproducible.
    """
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(buckets))


def _grams_of(toks):
    """Unigrams + space-joined bigrams of an already-MATERIALIZED
    token-array column, WITH multiplicity (DSIR models gram
    frequencies, not gram sets).

    ``toks`` must be a bound column, not the inline ``tokens(...)``
    expression: this tree references it ~4× (concat, size, twice per
    transform element), and an inline reference re-runs the regex
    split each time — measured 2.5× slower on the gram explode at
    sf0.1. Callers project ``tokens(lower(text))`` into a column
    first (multi-referenced columns survive CollapseProject)."""
    big = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(toks, i),
                        F.element_at(toks, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, big)


def hashed_gram_buckets(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        buckets: int = 1024) -> DataFrame:
    """Per-document hashed-gram bucket counts:
    ``(id_col, bucket, cnt)`` — one row per (doc, bucket) touched.

    The explode emits only ``(id, bucket)`` int pairs (the gram string
    dies inside the projection); the per-doc count aggregation
    partial-aggregates map-side, so the shuffle carries at most
    ``docs × min(doc_grams, buckets)`` small rows.
    """
    base = df.select(F.col(id_col),
                     tokens(F.lower(F.col(text_col))).alias("_t"))
    return (base.select(id_col,
                        F.explode(_grams_of(F.col("_t"))).alias("_g"))
            .select(id_col, _bucket(F.col("_g"), buckets).alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count("*").alias("cnt")))


def fit_log_ratios(target: DataFrame | None, raw: DataFrame,
                   text_col: str = "text",
                   buckets: int = 1024, *,
                   target_pred=None) -> DataFrame:
    """Fit the two hashed-ngram models and return the per-bucket
    importance table ``(bucket, ratio_micro)`` where

        ratio_micro = floor(ln(p_b / q_b) * 1e6 + 0.5)
        p_b = (target_cnt_b + 1) / (target_total + B)     (Laplace)
        q_b = (raw_cnt_b + 1) / (raw_total + B)

    Scan budget — the number that matters at 100 TB: when the target
    is a SUBSET of the raw pool, pass ``target_pred`` (a boolean
    Column over ``raw``'s rows) instead of a ``target`` frame; both
    models then come from ONE conditional aggregation over a single
    corpus scan. With a separate ``target`` frame it is one scan per
    corpus (the target is typically tiny). Either way the per-bucket
    counts (≤ B rows, exact int64) collect to the driver once, totals
    are summed there, and the ratio expression is evaluated on a
    B-row local frame — no third scan for totals, no count recompute
    inside the downstream weights job.

    The output is B rows — made for ``F.broadcast``. Quantization to
    integer micro-units BEFORE any per-document summation is what
    makes downstream weights exactly reproducible in any engine.
    """
    def bucketed(df, flag=None):
        extra = [] if flag is None else [flag.alias("_is_t")]
        base = df.select(tokens(F.lower(F.col(text_col))).alias("_t"),
                         *extra)
        keep = [] if flag is None else [F.col("_is_t")]
        g = base.select(F.explode(_grams_of(F.col("_t"))).alias("_g"),
                        *keep)
        return g.select(_bucket(F.col("_g"), buckets).alias("bucket"),
                        *keep)

    if target_pred is not None:
        rows = (bucketed(raw, flag=target_pred)
                .groupBy("bucket")
                .agg(F.count("*").alias("cr"),
                     F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
                     .alias("ct"))
                .collect())                       # ≤ B rows, one scan
        ct = {r["bucket"]: r["ct"] for r in rows}
        cr = {r["bucket"]: r["cr"] for r in rows}
    else:
        if target is None:
            raise ValueError("need a target frame or target_pred")
        ct = {r["bucket"]: r["c"] for r in
              bucketed(target).groupBy("bucket")
              .agg(F.count("*").alias("c")).collect()}
        cr = {r["bucket"]: r["c"] for r in
              bucketed(raw).groupBy("bucket")
              .agg(F.count("*").alias("c")).collect()}
    t_total = sum(ct.values())
    r_total = sum(cr.values())
    # emit ALL B buckets, not just the observed ones: a bucket unseen
    # at fit time then carries the all-smoothing ratio
    # ln((1/(Tt+B)) / (1/(Tr+B))), so held-out shards score with the
    # documented Laplace semantics instead of a silent ln(1)=0 hole
    local = raw.sparkSession.createDataFrame(
        [(b, ct.get(b, 0), cr.get(b, 0)) for b in range(buckets)],
        "bucket long, ct long, cr long")
    p = (F.col("ct") + 1).cast("double") / F.lit(t_total + buckets)
    q = (F.col("cr") + 1).cast("double") / F.lit(r_total + buckets)
    ratio = F.floor(F.log(p / q) * F.lit(1e6) + F.lit(0.5)).cast("long")
    return local.select("bucket", ratio.alias("ratio_micro"))


def dsir_weights(df: DataFrame, ratios: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 buckets: int = 1024,
                 out: str = "dsir_w") -> DataFrame:
    """Per-document importance weight: ``Σ_b cnt_b · ratio_micro_b``
    (int64 micro-log-units) — higher means more target-like.

    Plan: exploded ``(id, bucket, cnt)`` triples broadcast-join the
    B-row ratio table, then aggregate by document (map-side partials;
    ids-only shuffle). :func:`fit_log_ratios` emits every one of the B
    buckets (unseen ones carry the all-smoothing ratio
    ``ln((1/(Tt+B)) / (1/(Tr+B)))``), so the left join only misses when
    a frozen table was fitted with a different ``buckets``; that
    residual case coalesces to 0.
    """
    per_bucket = hashed_gram_buckets(df, text_col, id_col, buckets)
    joined = per_bucket.join(F.broadcast(ratios), on="bucket",
                             how="left")
    w = F.sum(F.col("cnt") *
              F.coalesce("ratio_micro", F.lit(0))).alias(out)
    return joined.groupBy(id_col).agg(w)


def dsir_sample(df: DataFrame, target: DataFrame | None, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 1024, seed: int = 0, *,
                target_pred=None) -> DataFrame:
    """Gumbel top-k importance resample: ``k`` documents drawn without
    replacement with probability ∝ exp(log-weight) — realized
    deterministically as top-k of ``weight + Gumbel(md5-uniform)``.

    Returns ``(id_col, dsir_w, key_micro)`` for the selected rows.
    The Gumbel noise uses the md5-threshold uniform (engine- and
    partitioning-invariant), quantized to the same 1e-6 grid as the
    weights; ties (astronomically unlikely) break on ``id_col``.

    ``sort + limit(k)`` gathers only k rows — the established
    ``sort_topk`` shape, never a full-corpus driver collect.
    """
    ratios = fit_log_ratios(target, df, text_col, buckets,
                            target_pred=target_pred)
    w = dsir_weights(df, ratios, text_col, id_col, buckets)
    u = (F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"),
                       F.lit(f"#{seed}"))), 1, 13), 16, 10)
        .cast("long").cast("double") + F.lit(0.5)) / F.lit(_U52)
    gumbel = -F.log(-F.log(u))
    key = (F.col("dsir_w")
           + F.floor(gumbel * F.lit(1e6) + F.lit(0.5)).cast("long"))
    return (w.withColumn("key_micro", key)
            .orderBy(F.desc("key_micro"), F.col(id_col))
            .limit(k))
