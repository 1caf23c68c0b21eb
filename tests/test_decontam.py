"""Decontamination: n-gram overlap against a benchmark set."""

import pyspark.sql.functions as F

from meza_spark.llm.decontam import contaminated_ids, decontaminate
from meza_spark.util import explain_str


def _frames(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated text about spark shuffles and joins"),
         (3, "prefix words then the quick brown fox jumps over the lazy"
             " dog and more"),
         (4, "short doc")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "eval item the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    return docs, bench


def test_flag_marks_verbatim_ngram_overlap(spark):
    docs, bench = _frames(spark)
    out = decontaminate(docs, bench, n=8, mode="flag") \
        .orderBy("doc_id").collect()
    flags = {r["doc_id"]: r["contaminated"] for r in out}
    # docs 1 and 3 embed the benchmark 8-gram; 2 and 4 do not
    assert flags == {1: True, 2: False, 3: True, 4: False}


def test_remove_drops_only_contaminated(spark):
    docs, bench = _frames(spark)
    kept = sorted(r["doc_id"] for r in
                  decontaminate(docs, bench, n=8, mode="remove")
                  .select("doc_id").collect())
    assert kept == [2, 4]


def test_short_doc_whole_text_fallback(spark):
    # a doc shorter than n matches only if the WHOLE text is a
    # benchmark shingle-fallback too (exact duplicate of a short doc)
    docs = spark.createDataFrame([(1, "tiny doc"), (2, "other doc")],
                                 ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "tiny doc")], ["doc_id", "text"])
    ids = sorted(r["doc_id"] for r in
                 contaminated_ids(docs, bench, n=8).collect())
    assert ids == [1]


def test_benchmark_side_broadcasts(spark):
    docs, bench = _frames(spark)
    ids = contaminated_ids(docs, bench, n=8)
    plan = explain_str(ids, "simple")
    assert "BroadcastHashJoin" in plan
    # no text column rides the join: gram hashes only
    assert "SortMergeJoin" not in plan


def test_array_strategy_matches_join_strategy(spark):
    docs, bench = _frames(spark)
    a = {r["doc_id"]: r["contaminated"] for r in
         decontaminate(docs, bench, n=8, mode="flag",
                       strategy="array").collect()}
    j = {r["doc_id"]: r["contaminated"] for r in
         decontaminate(docs, bench, n=8, mode="flag",
                       strategy="join").collect()}
    assert a == j == {1: True, 2: False, 3: True, 4: False}
    removed = sorted(r["doc_id"] for r in
                     decontaminate(docs, bench, n=8, mode="remove",
                                   strategy="array").collect())
    assert removed == [2, 4]
