"""Logistic-regression quality classifier: bounded deterministic fit,
literal-weights codegen scoring, separable-data convergence."""

import pytest
from pyspark.sql import functions as F

from meza_spark.llm.classifier import (FEATURES, fit_logistic,
                                       logit_expr, quality_features,
                                       score_logistic)


def _separable(spark, n=400):
    """Synthetic linearly-separable frame: label = f1 + f2 > 1 with a
    wide margin; features are exact dyadic rationals (i/256) so every
    engine/ordering computes identical doubles."""
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % 16).cast("double") / 8).alias("f1"),
        (((F.col("id") * 7) % 16).cast("double") / 8).alias("f2"))
    return df.withColumn(
        "label", ((F.col("f1") + F.col("f2")) > 2.0).cast("double"))


def test_fit_learns_separable_boundary(spark):
    df = _separable(spark)
    w = fit_logistic(df, "label", feature_cols=["f1", "f2"],
                     iters=500, lr=1.0)
    scored = score_logistic(df, w, feature_cols=["f1", "f2"])
    acc = scored.agg(F.avg(
        (F.col("pred") == (F.col("label") > 0.5)).cast("double"))
    ).first()[0]
    assert acc > 0.95
    assert w[1] > 0 and w[2] > 0  # both features push positive


def test_fit_deterministic_across_partitionings(spark):
    df = _separable(spark)
    w1 = fit_logistic(df, "label", feature_cols=["f1", "f2"])
    w2 = fit_logistic(df.repartition(13), "label",
                      feature_cols=["f1", "f2"])
    assert w1 == w2  # hash-ordered bounded sample → bit-equal fit


def test_score_is_codegen_only(spark):
    from meza_spark.util import plan_stats

    df = _separable(spark)
    s = score_logistic(df, [0.1, 0.2, -0.3], feature_cols=["f1", "f2"])
    st = plan_stats(s)
    assert st["python"] == 0 and st["exchanges"] == 0


def test_logit_expr_weight_arity(spark):
    with pytest.raises(ValueError):
        logit_expr([1.0, 2.0], feature_cols=["f1", "f2"])  # needs 3


def test_quality_features_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    f = quality_features(docs)
    assert set(FEATURES) <= set(f.columns)
    row = f.where(F.col("n_chars_q") > 0).select("len_k").first()
    assert row["len_k"] > 0


def test_end_to_end_distills_heuristic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    f = quality_features(docs).withColumn(
        "label", ((F.col("quality") >= 1.0)
                  & (F.col("mean_word_len") >= 4.5)).cast("double"))
    w = fit_logistic(f, "label")
    scored = score_logistic(f, w)
    acc = scored.agg(F.avg(
        (F.col("pred") == (F.col("label") > 0.5)).cast("double"))
    ).first()[0]
    base = f.agg(F.greatest(F.avg("label"),
                            1 - F.avg("label"))).first()[0]
    assert acc >= base  # at least beats the majority-class guess
