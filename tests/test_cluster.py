"""Connected components + near_dedup end-to-end (pairs → kept table)."""

import pytest
from pyspark.sql import functions as F

from meza_spark.llm.cluster import connected_components, near_dedup


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["id_a", "id_b"])


def test_cc_two_components(spark):
    # {1,2,3} via 1-2, 2-3 and {10,11}; 99 absent (no edges)
    comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_converges(spark):
    # a 40-deep path exercises pointer jumping past naive max_iter
    edges = [(i, i + 1) for i in range(40)]
    comp = connected_components(_pairs(spark, edges), max_iter=10)
    labels = {r["component"] for r in comp.collect()}
    assert labels == {0}


def test_cc_unordered_and_dup_edges(spark):
    comp = connected_components(
        _pairs(spark, [(5, 2), (2, 5), (2, 7), (7, 5)]))
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got == {2: 2, 5: 2, 7: 2}


def test_cc_empty(spark):
    comp = connected_components(
        spark.createDataFrame([], "id_a long, id_b long"))
    assert comp.count() == 0
    assert comp.columns == ["id", "component"]


def test_near_dedup_ngram_keeps_min_representative(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy cat", "a"),
        (3, "completely different text about spark engines here", "a"),
        (4, "the quick brown fox jumps over a lazy dog", "a"),
        (5, "unrelated document on connected components theory", "b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "blk"])
    kept = near_dedup(df, method="ngram", n=3, min_jaccard=0.3,
                      join_on="blk")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1,2,4 are one near-dup cluster → representative 1 survives
    assert ids == [1, 3, 5]
    assert kept.columns == df.columns


def test_near_dedup_minhash_identical_docs(spark):
    text = "spark first distributed dedup of training corpora at scale"
    rows = [(i, text) for i in range(4)] + [
        (9, "a totally distinct document with no overlap whatsoever")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = near_dedup(df, method="minhash", min_jaccard=0.5)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 9]


def test_near_dedup_unknown_method(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        near_dedup(df, method="nope")
