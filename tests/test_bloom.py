"""Tests for meza_spark.llm.bloom (build/probe/incremental dedup)."""

from pyspark.sql import functions as F

from meza_spark.llm.bloom import (BloomFilter, build_bloom, dedup_against,
                                  might_contain)


def test_bloom_no_false_negatives(spark):
    seen = spark.range(1000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    bloom = build_bloom(seen, "k", expected_items=1000, fpr=0.01)
    probed = might_contain(seen, "k", bloom)
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_bloom_fpr_bounded(spark):
    seen = spark.range(1000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    other = spark.range(1000, 6000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    bloom = build_bloom(seen, "k", expected_items=1000, fpr=0.01)
    fp = might_contain(other, "k", bloom).where("maybe_seen").count()
    assert fp / 5000 < 0.05  # target 1%, generous margin


def test_bloom_params_sane():
    n_bits, k = BloomFilter.params(10_000, 0.01)
    assert n_bits % 8 == 0
    assert 9 <= n_bits / 10_000 <= 11   # ~9.6 bits/key at 1%
    assert 5 <= k <= 9                  # ~7 hashes at 1%


def test_dedup_against_exact(spark):
    seen = spark.range(500).select(
        F.concat(F.lit("t"), F.col("id")).alias("text"))
    # new: 100 dups of seen + 200 genuinely new
    new = (spark.range(100).select(
        F.concat(F.lit("t"), F.col("id")).alias("text"))
        .unionByName(spark.range(1000, 1200).select(
            F.concat(F.lit("t"), F.col("id")).alias("text"))))
    kept = dedup_against(new, seen, on="text", expected_items=500)
    got = {r["text"] for r in kept.collect()}
    assert got == {f"t{i}" for i in range(1000, 1200)}


def test_dedup_against_matches_plain_anti_join(spark, sf_dir):
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    seen = docs.where(F.col("doc_id") % 3 == 0)
    new = docs.where(F.col("doc_id") % 3 != 0)
    kept = dedup_against(new, seen, on="text")
    plain = new.join(seen.select("text"), on="text", how="left_anti")
    assert (kept.select("doc_id").subtract(plain.select("doc_id")).count()
            == 0)
    assert kept.count() == plain.count()


def test_probe_is_join_free(spark):
    seen = spark.range(100).select(F.col("id").cast("string").alias("k"))
    bloom = build_bloom(seen, "k", expected_items=100)
    probed = might_contain(
        spark.range(50).select(F.col("id").cast("string").alias("k")),
        "k", bloom)
    from meza_spark.util import explain_str
    plan = explain_str(probed, "simple")
    assert "Join" not in plan
    assert "Exchange" not in plan
