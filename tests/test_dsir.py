"""DSIR importance resampling: hashed-ngram models, micro-int weights,
Gumbel top-k determinism, and the scale-shape contracts."""

from pyspark.sql import functions as F

from meza_spark.llm.dsir import (dsir_sample, dsir_weights,
                                 fit_log_ratios, hashed_gram_buckets)


def _corpus(spark):
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog ran to the park", "en"),
        (2, "a cat and a dog", "en"),
        (3, "le chat est sur le tapis", "fr"),
        (4, "der hund lief zum park", "de"),
        (5, "el gato y el perro", "es"),
        (6, "the the the the the", "en"),
        (7, "", "en"),
        (8, "solo", "es"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_gram_buckets_counts_multiplicity(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    rows = hashed_gram_buckets(df).collect()
    # grams: a, b, a, 'a b', 'b a' → 5 instances over ≤4 distinct buckets
    assert sum(r["cnt"] for r in rows) == 5
    # empty text contributes nothing
    assert hashed_gram_buckets(
        spark.createDataFrame([(2, "  ")], "doc_id long, text string")
    ).count() == 0


def test_weights_favor_target_like_docs(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("lang") == "en")
    ratios = fit_log_ratios(target, docs, buckets=256)
    w = {r["doc_id"]: r["dsir_w"] for r in
         dsir_weights(docs, ratios, buckets=256).collect()}
    # every non-empty doc is scored; the empty doc has no grams
    assert set(w) == {0, 1, 2, 3, 4, 5, 6, 8}
    # English docs outweigh each non-English doc on average
    en = [w[i] for i in (0, 1, 2, 6)]
    other = [w[i] for i in (3, 4, 5)]
    assert min(en) > max(other) or sum(en) / len(en) > sum(other) / len(other)


def test_weights_partitioning_invariant(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("lang") == "en")
    a = sorted(map(tuple, dsir_weights(
        docs, fit_log_ratios(target, docs)).collect()))
    docs2 = docs.repartition(7)
    b = sorted(map(tuple, dsir_weights(
        docs2, fit_log_ratios(target.repartition(5), docs2)).collect()))
    assert a == b  # int micro-units: exact under any layout


def test_unseen_bucket_gets_smoothing_ratio(spark):
    """A bucket with zero observations at fit time carries the
    all-smoothing Laplace ratio ln((1/(Tt+B))/(1/(Tr+B))) — the fit
    emits every one of the B buckets, so held-out shards never hit a
    silent ln(1)=0 hole (round-4 ADVICE)."""
    import math

    docs = _corpus(spark)
    target = docs.where(F.col("lang") == "en")
    ratios = fit_log_ratios(target, docs, buckets=64)
    rt = {r["bucket"]: (r["ratio_micro"]) for r in ratios.collect()}
    assert len(rt) == 64  # every bucket present, observed or not
    # reconstruct totals from the gated tokenizer path: refit with the
    # same frames and read the per-bucket counts indirectly — the
    # smoothing-only value must appear verbatim on any all-zero bucket
    from meza_spark.llm.dsir import hashed_gram_buckets
    tt = (hashed_gram_buckets(target, "text", "doc_id", 64)
          .agg(F.sum("cnt")).collect()[0][0] or 0)
    tr = (hashed_gram_buckets(docs, "text", "doc_id", 64)
          .agg(F.sum("cnt")).collect()[0][0] or 0)
    smooth = math.floor(
        math.log((1.0 / (tt + 64)) / (1.0 / (tr + 64))) * 1e6 + 0.5)
    observed = {r["bucket"] for r in
                hashed_gram_buckets(docs, "text", "doc_id", 64)
                .select("bucket").distinct().collect()}
    empty = set(rt) - observed
    assert empty, "fixture too dense to leave an empty bucket"
    assert all(rt[b] == smooth for b in empty)
    held_out = spark.createDataFrame(
        [(99, "zzzqqq xxyyzz")], "doc_id long, text string")
    out = dsir_weights(held_out, ratios, buckets=64).collect()
    assert len(out) == 1  # scores even when grams miss the observed set


def test_target_pred_single_scan_matches_two_frame_fit(spark):
    """The 100 TB path (one conditional-agg scan via target_pred) must
    produce the bit-identical ratio table as the general two-frame
    fit when the target is the same subset."""
    docs = _corpus(spark)
    two = sorted(map(tuple, fit_log_ratios(
        docs.where(F.col("lang") == "en"), docs, buckets=128).collect()))
    one = sorted(map(tuple, fit_log_ratios(
        None, docs, buckets=128,
        target_pred=F.col("lang") == "en").collect()))
    assert one == two
    import pytest
    with pytest.raises(ValueError):
        fit_log_ratios(None, docs)  # neither target nor pred


def test_gumbel_topk_deterministic_and_sized(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("lang") == "en")
    s1 = [tuple(r) for r in dsir_sample(docs, target, k=4, seed=3).collect()]
    s2 = [tuple(r) for r in
          dsir_sample(docs.repartition(6), target, k=4, seed=3).collect()]
    assert s1 == s2 and len(s1) == 4
    # keys strictly ordered desc
    keys = [r[2] for r in s1]
    assert keys == sorted(keys, reverse=True)
    # a different seed permutes the draw (weights equal, noise differs)
    s3 = [tuple(r) for r in dsir_sample(docs, target, k=4, seed=4).collect()]
    assert [r[0] for r in s3] != [r[0] for r in s1] or \
        [r[2] for r in s3] != [r[2] for r in s1]


def test_ratio_table_bounded_by_buckets(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("lang") == "en")
    ratios = fit_log_ratios(target, docs, buckets=32)
    assert ratios.count() <= 32  # broadcastable by construction
    assert dict(ratios.dtypes)["ratio_micro"] == "bigint"


def test_plan_broadcasts_ratio_table(spark):
    from meza_spark.util import plan_stats

    docs = _corpus(spark)
    target = docs.where(F.col("lang") == "en")
    w = dsir_weights(docs, fit_log_ratios(target, docs))
    st = plan_stats(w)
    assert st["broadcast_joins"] >= 1  # B-row table never shuffles docs
    assert st["python"] == 0  # whole pipeline is JVM codegen
