"""Domain-mixture reweighting (DoReMi-lite, Xie et al. 2023): learn
per-domain sampling weights that up-weight high-excess-loss domains —
the group-DRO step of DoReMi with a static loss signal (any per-doc
score: unigram logprob, learned-classifier logit, token count) instead
of a live proxy model.

Multiplicative-weights iteration, engine-exact by construction:

    lam_d  = (mean_d - min_mean) / (max_mean - min_mean)   (in [0,1])
    b_d    = round(w_d * (1 + lr * lam_d))                 (boost)
    w_d'   = round(((1-s) * b_d/sum(b) + s/k) * 1e6)       (norm+smooth)

All state lives in integer micro-units: per-doc losses quantize to
int64 micros BEFORE any summation, per-domain sums ride a decimal
accumulator (order-free, no overflow), means use floor division, and
every iteration re-quantizes — so the same update replayed in any
engine (the DuckDB oracle unrolls it as CTEs) is bit-identical. The
polynomial boost ``1 + lr*lam`` replaces DoReMi's ``exp(lr*lam)``
deliberately: +,*,/ are IEEE-exact across engines, libm exp is not
(memory: parity traps).

Scale shape: ONE corpus scan (map-side-combined groupBy to k domain
rows), then k-row driver arithmetic; the fitted table broadcasts into
:func:`mixture_sample`'s row-local md5 coin filter. No per-iteration
scans — DoReMi's proxy-retraining loop is the expensive outer process;
this is the reweighting math it feeds.

No reference analog (meza has no corpus ops); beyond-reference
training-data layer per the build charter.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_domain_weights", "mixture_sample"]


def _domain_stats(df: DataFrame, domain_col: str, loss_col: str):
    """One scan → list of (domain, n_docs, sum_loss_micro:int)."""
    micro = F.floor(F.col(loss_col).cast("double") * 1000000 + F.lit(0.5))
    rows = (df.groupBy(F.col(domain_col).alias("domain"))
            .agg(F.count("*").alias("n"),
                 F.sum(micro.cast("decimal(38,0)")).alias("s"))
            .collect())
    return [(r["domain"], r["n"], int(r["s"])) for r in rows]


def fit_domain_weights(df: DataFrame, domain_col: str = "source",
                       loss_col: str = "loss", iters: int = 5,
                       lr: float = 0.5,
                       smoothing: float = 0.1) -> DataFrame:
    """Return ``(domain, n_docs, mean_loss_micro, weight_micro)`` —
    one row per domain, weights summing to ~1e6 micro-units.

    ``loss_col`` must be non-negative for the floor-division mean to
    match engines that truncate toward zero. Weights start uniform;
    ``smoothing`` mixes ``s/k`` of uniform back per iteration (keeps
    every domain alive, DoReMi's u-smoothing), so the fixpoint is not
    a closed-form softmax and iteration count matters.
    """
    stats = sorted(_domain_stats(df, domain_col, loss_col))
    if not stats:
        return df.sparkSession.createDataFrame(
            [], "domain string, n_docs long, mean_loss_micro long, "
                "weight_micro long")
    k = len(stats)
    means = [s // n for _, n, s in stats]          # floor-div micros
    mn, mx = min(means), max(means)
    lam = [0.0 if mx == mn else (m - mn) / (mx - mn) for m in means]
    w = [math.floor(1000000.0 / k + 0.5)] * k
    for _ in range(iters):
        b = [math.floor(w[i] * (1 + lr * lam[i]) + 0.5)
             for i in range(k)]
        total = sum(b)
        w = [math.floor(((1 - smoothing) * (b[i] / total)
                         + smoothing / k) * 1000000 + 0.5)
             for i in range(k)]
    out = [(d, n, m, wt) for (d, n, _), m, wt in zip(stats, means, w)]
    schema = (f"domain {dict(df.dtypes)[domain_col]}, n_docs long, "
              "mean_loss_micro long, weight_micro long")
    return df.sparkSession.createDataFrame(out, schema)


def mixture_sample(df: DataFrame, weights: DataFrame,
                   domain_col: str = "source",
                   key_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Resample the corpus toward the fitted mixture: per-domain keep
    fraction ``f_d ∝ weight_d / share_d`` (share = the domain's
    natural row fraction), scaled so the most-upweighted domain keeps
    100% — the largest sample expressible without replication.

    ``weights`` is :func:`fit_domain_weights` output (k rows —
    collected to the driver, thresholds baked as literals into one
    row-local md5-coin CASE: no shuffle, no join, pushes down, stream-
    safe; the md5 coin is partitioning/engine-invariant).
    """
    from .sampling import stratified_hash_sample

    rows = weights.select("domain", "n_docs", "weight_micro").collect()
    total_n = sum(r["n_docs"] for r in rows)
    raw = {r["domain"]: (r["weight_micro"] / 1000000.0)
           * total_n / r["n_docs"] for r in rows if r["n_docs"]}
    if not raw:
        return df.limit(0)
    peak = max(raw.values())
    fracs = {d: (v / peak if peak > 0 else 0.0) for d, v in raw.items()}
    return stratified_hash_sample(df, key_col, domain_col, fracs,
                                  default=0.0, seed=seed)
