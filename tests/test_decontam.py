"""Decontamination: n-gram overlap against a benchmark set."""

import pyspark.sql.functions as F
import pytest

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


def test_fuzzy_contamination_containment(spark):
    """A doc containing most of an eval item's grams is caught even
    though no long verbatim run survives the edit."""
    from meza_spark.llm.decontam import (decontaminate_fuzzy,
                                         fuzzy_contamination_pairs)

    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris")],
        ["doc_id", "text"])
    docs = spark.createDataFrame([
        # 3 of the 4 bench 5-grams appear verbatim -> containment 0.75
        (1, "intro what is the capital of france x paris end"),
        (2, "totally unrelated text about spark shuffles"),
    ], ["doc_id", "text"])
    pairs = fuzzy_contamination_pairs(docs, bench, n=5,
                                      min_containment=0.5).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in pairs] == [(1, 100)]
    assert pairs[0]["containment"] == pytest.approx(2 / 3)
    kept = decontaminate_fuzzy(docs, bench, n=5, min_containment=0.5)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    flagged = {r["doc_id"]: r["contaminated"]
               for r in decontaminate_fuzzy(docs, bench, n=5,
                                            min_containment=0.5,
                                            mode="flag").collect()}
    assert flagged == {1: True, 2: False}


def test_fuzzy_contamination_threshold_excludes(spark):
    from meza_spark.llm.decontam import fuzzy_contamination_pairs

    bench = spark.createDataFrame([(1, "a b c d e f g h")],
                                  ["doc_id", "text"])
    docs = spark.createDataFrame([(10, "a b c d e zzz")],
                                 ["doc_id", "text"])
    # doc shares 1 of bench's 4 5-grams -> 0.25 < 0.5
    assert fuzzy_contamination_pairs(docs, bench, n=5,
                                     min_containment=0.5).count() == 0


def test_fuzzy_array_strategy_matches_join(spark):
    """Both physical strategies flag the same rows — including the
    θ·nb float-boundary case (bench with 5 grams at θ=0.4, where a
    ceil-based integer threshold would demand 3 matches instead of 2)."""
    from meza_spark.llm.decontam import decontaminate_fuzzy

    bench = spark.createDataFrame(
        [(100, "a b c d e f g h i")],   # 9 tokens -> 5 distinct 5-grams
        ["doc_id", "text"])
    docs = spark.createDataFrame([
        (1, "a b c d e f zz"),          # grams 1-2 of bench -> m=2, 2/5=0.4
        (2, "a b c d e zz"),            # m=1 -> 0.2
        (3, "unrelated text entirely here"),
    ], ["doc_id", "text"])
    for strat in ("join", "array"):
        flags = {r["doc_id"]: r["contaminated"] for r in
                 decontaminate_fuzzy(docs, bench, n=5,
                                     min_containment=0.4, mode="flag",
                                     strategy=strat).collect()}
        assert flags == {1: True, 2: False, 3: False}, strat


def test_fuzzy_array_strategy_runs_on_stream(spark, tmp_path):
    """strategy='array' is stateless -> works on a streaming frame
    with no watermark; batch and stream flag sets agree."""
    from meza_spark.llm.decontam import decontaminate_fuzzy

    src = str(tmp_path / "docs")
    bench = spark.createDataFrame([(100, "q w e r t y u")],
                                  ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "q w e r t y zz"), (2, "nothing shared here at all")],
        ["doc_id", "text"])
    docs.write.parquet(src)
    sdf = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = decontaminate_fuzzy(sdf, bench, n=5, min_containment=0.5,
                              mode="flag")
    q = (out.writeStream.format("memory").queryName("fz")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["doc_id"]: r["contaminated"]
           for r in spark.sql("select * from fz").collect()}
    batch = {r["doc_id"]: r["contaminated"]
             for r in decontaminate_fuzzy(docs, bench, n=5,
                                          min_containment=0.5,
                                          mode="flag").collect()}
    assert got == batch == {1: True, 2: False}


class TestSemantic:
    """Embedding-space decontamination (broadcast-bench exact path)."""

    @staticmethod
    def _frames(spark):
        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0]),          # = bench 100
             (2, [0.9, 0.1, 0.0]),          # near bench 100
             (3, [0.0, 1.0, 0.0]),          # = bench 200
             (4, [0.0, 0.0, 1.0]),          # far from everything
             (5, None),                      # null vec: never flagged
             (6, [-1.0, 0.0, 0.0])],        # anti-parallel: cos -1
            "vec_id long, embedding array<double>")
        bench = spark.createDataFrame(
            [(200, [0.0, 2.0, 0.0]),         # scale-invariant (norm)
             (100, [1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>")
        return corpus, bench

    def test_flags_and_tiebreak(self, spark):
        from meza_spark.llm.decontam import semantic_contamination

        corpus, bench = self._frames(spark)
        got = {r["vec_id"]: (r["bench_id"], r["cosine_e4"])
               for r in semantic_contamination(
                   corpus, bench, threshold=0.995).collect()}
        assert got == {1: (100, 10000), 3: (200, 10000)}
        # looser threshold picks up the near-neighbor too
        loose = {r["vec_id"] for r in semantic_contamination(
            corpus, bench, threshold=0.9).collect()}
        assert loose == {1, 2, 3}

    def test_remove_and_flag_modes(self, spark):
        from meza_spark.llm.decontam import decontaminate_semantic

        corpus, bench = self._frames(spark)
        docs = corpus.selectExpr("vec_id AS doc_id",
                                 "'t' || vec_id AS text")
        kept = decontaminate_semantic(
            docs, corpus, bench, threshold=0.995)
        assert {r["doc_id"] for r in kept.collect()} == {2, 4, 5, 6}
        flagged = decontaminate_semantic(
            docs, corpus, bench, threshold=0.995, mode="flag")
        m = {r["doc_id"]: r["contaminated"] for r in flagged.collect()}
        assert m == {1: True, 2: False, 3: True, 4: False,
                     5: False, 6: False}

    def test_string_bench_ids_carry_through(self, spark):
        """String/UUID benchmark ids must survive untouched — the old
        hard cast-to-long nulled them and then crashed in np.array
        (round-4 ADVICE). The output bench_id column mirrors the
        benchmark id type."""
        from meza_spark.llm.decontam import semantic_contamination

        corpus, bench = self._frames(spark)
        sbench = bench.select(
            F.concat(F.lit("bench-"), F.col("vec_id").cast("string"))
            .alias("vec_id"), "embedding")
        got = {r["vec_id"]: r["bench_id"]
               for r in semantic_contamination(
                   corpus, sbench, threshold=0.995).collect()}
        assert got == {1: "bench-100", 3: "bench-200"}
        out_types = dict(semantic_contamination(
            corpus, sbench, threshold=0.995).dtypes)
        assert out_types["bench_id"] == "string"

    def test_bench_bound_guard(self, spark):
        from meza_spark.llm.decontam import semantic_contamination

        corpus, bench = self._frames(spark)
        import pytest as _pt
        with _pt.raises(ValueError, match="max_bench"):
            semantic_contamination(corpus, bench, max_bench=1)

    def test_no_shuffle_plan(self, spark):
        from meza_spark.llm.decontam import semantic_contamination

        corpus, bench = self._frames(spark)
        plan = semantic_contamination(corpus, bench)._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
