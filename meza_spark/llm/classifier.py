"""Learned quality classifier: logistic regression over row-local
text features — the fastText-style "does this look like the reference
corpus" filter (GPT-3 / CCNet-lineage, public), re-expressed for
Spark's execution model.

Split the classic way a 100 TB pipeline must:

- **Fit is bounded.** Training reads a deterministic hash-ordered
  sample (``ORDER BY md5(id) LIMIT n`` — engine/partitioning-invariant,
  the same bounded-fit contract as the k-means/IVF fitters), collects
  an ``n × d`` float matrix (d ≈ 5) to the driver, and runs a fixed
  number of full-batch gradient steps in numpy. No distributed
  iteration, no driver loop over jobs: one bounded Arrow collect.
- **Scoring is a row-local expression.** The learned weights embed as
  literals in a fixed-order arithmetic expression (whole-stage
  codegen, no UDF, no shuffle); emitted as integer MICRO-units so the
  value is bit-reproducible across engines and cluster layouts.

Reference scope analog: meza's typecast/quality surface
(meza/convert.py:61-253) stops at per-value casts; corpus-level learned
filtering is charter-tier (SURVEY §2.10).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import quality_score

__all__ = ["quality_features", "fit_logistic", "logit_expr",
           "score_logistic"]

#: Feature columns produced by :func:`quality_features`, in the FIXED
#: order the weight vector uses everywhere (fit, score, oracle).
FEATURES = ["len_k", "punct_ratio", "stopword_ratio", "mean_word_len"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Row-local feature columns for the classifier (all single IEEE
    divisions of integer counts — oracle-exact): kilochars ``len_k``
    plus the :func:`quality_score` ratios."""
    d = quality_score(df, text_col)
    return d.withColumn(
        "len_k", F.col("n_chars_q").cast("double") / F.lit(1000.0))


def fit_logistic(df: DataFrame, label_col: str,
                 feature_cols: list[str] | None = None,
                 sample_n: int = 4096, id_col: str = "doc_id",
                 iters: int = 200, lr: float = 0.5,
                 l2: float = 1e-3) -> list[float]:
    """Fit ``[bias, w_1..w_d]`` on a bounded deterministic sample.

    Full-batch gradient descent with L2, fixed iteration count — no
    early stopping, no RNG — so the same corpus always yields the same
    weights (the VALUES-pin requirement). The sample order key is
    ``(md5(id), id)``: stable under any partitioning and any engine.
    """
    feats = list(feature_cols or FEATURES)
    pdf = (df.select(id_col, label_col, *feats)
           .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
           .limit(sample_n).toPandas())
    raw = pdf[feats].to_numpy(dtype=np.float64)
    # standardize for conditioning, then fold (mu, sd) back into the
    # returned RAW-scale weights so scoring stays a literal expression
    mu, sd = raw.mean(axis=0), raw.std(axis=0)
    sd = np.where(sd > 0, sd, 1.0)
    x = np.c_[np.ones(len(pdf)), (raw - mu) / sd]
    y = pdf[label_col].to_numpy(dtype=np.float64)
    w = np.zeros(x.shape[1])
    n = max(len(pdf), 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        g = x.T @ (p - y) / n + l2 * w
        w -= lr * g
    w_raw = w[1:] / sd
    bias = w[0] - float(np.dot(w[1:], mu / sd))
    return [float(bias)] + [float(v) for v in w_raw]


def logit_expr(weights: list[float],
               feature_cols: list[str] | None = None) -> Column:
    """``w0 + w1·f1 + … + wd·fd`` as ONE fixed-left-to-right
    arithmetic expression: identical IEEE operation order in Spark and
    in the SQL oracle twin, so the double result is bit-equal."""
    feats = list(feature_cols or FEATURES)
    if len(weights) != len(feats) + 1:
        raise ValueError(
            f"need {len(feats) + 1} weights (bias first), "
            f"got {len(weights)}")
    expr = F.lit(float(weights[0]))
    for wgt, c in zip(weights[1:], feats):
        expr = expr + F.lit(float(wgt)) * F.col(c)
    return expr


def score_logistic(df: DataFrame, weights: list[float],
                   feature_cols: list[str] | None = None,
                   out: str = "logit_micro",
                   pred: str = "pred") -> DataFrame:
    """Score every row with the broadcast-as-literals model: integer
    micro-unit logit (``floor(logit·1e6 + 0.5)``) plus the boolean
    decision ``logit > 0``. Pure codegen — no UDF, no shuffle; filters
    on ``pred`` push down to the scan."""
    logit = logit_expr(weights, feature_cols)
    return (df.withColumn(
        out, F.floor(logit * F.lit(1e6) + F.lit(0.5)).cast("long"))
        .withColumn(pred, F.col(out) > 0))
