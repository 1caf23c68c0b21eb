"""MinHash/SimHash candidate generation: bucket-cap behavior + parity."""

from meza_spark.llm.dedup import minhash_lsh_pairs, simhash_pairs


def _docs(spark):
    # small varied corpus with two obvious near-dup groups
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "spark structured streaming handles late data with watermarks"),
        (4, "spark structured streaming handles late data with watermark"),
        (5, "completely unrelated sentence about cooking pasta al dente"),
        (6, "another standalone document mentioning graph algorithms"),
        (7, "yet more filler text that matches nothing else at all"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairs_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_cap_parity_on_normal_corpus(spark):
    docs = _docs(spark)
    capped = minhash_lsh_pairs(docs, min_jaccard=0.3, max_bucket=1000)
    uncapped = minhash_lsh_pairs(docs, min_jaccard=0.3, max_bucket=None)
    assert _pairs_set(capped) == _pairs_set(uncapped) != set()
    assert uncapped._dropped_buckets is None
    assert capped._dropped_buckets.count() == 0


def test_simhash_cap_parity_on_normal_corpus(spark):
    docs = _docs(spark)
    capped = simhash_pairs(docs, max_hamming=6, max_bucket=1000)
    uncapped = simhash_pairs(docs, max_hamming=6, max_bucket=None)
    assert _pairs_set(capped) == _pairs_set(uncapped)


def test_minhash_hot_bucket_is_dropped(spark):
    # 40 identical boilerplate docs: every band collapses to ONE bucket
    # of 40 members -> 16 oversized buckets dropped, zero pair blowup;
    # the two distinct docs still pair with nothing.
    rows = [(i, "identical boilerplate footer text repeated everywhere")
            for i in range(40)]
    rows += [(100, "a unique document present only once in the corpus"),
             (101, "a unique document present only once in the corpse")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, min_jaccard=0.3, max_bucket=10)
    got = _pairs_set(pairs)
    assert (100, 101) in got
    assert all(a >= 100 for a, _ in got)  # no boilerplate pair survived
    dropped = {tuple(r) for r in
               pairs._dropped_buckets.select("band", "bucket_size").collect()}
    assert dropped == {(b, 40) for b in range(16)}


def test_simhash_hot_bucket_is_dropped(spark):
    rows = [(i, "identical boilerplate footer text repeated everywhere")
            for i in range(40)]
    rows += [(100, "a unique document present only once in the corpus")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = simhash_pairs(docs, max_hamming=3, max_bucket=10)
    assert _pairs_set(pairs) == set()
    assert pairs._dropped_buckets.count() == 4  # all 4 chunks oversized


def test_dedup_lines_corpus_level(spark):
    from meza_spark.llm.dedup import dedup_lines

    rows = [
        (1, "COOKIE BANNER\nreal prose one\n\nfooter nav"),
        (2, "cookie banner\nreal prose two\nfooter nav"),
        (3, "unique document three"),
        (4, "FOOTER NAV"),                 # all-boilerplate doc
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["text"]
           for r in dedup_lines(df, min_count=2).collect()}
    # repeated lines removed case-insensitively; blank lines kept
    assert got[1] == "real prose one\n"
    assert got[2] == "real prose two"
    assert got[3] == "unique document three"
    # pure-boilerplate doc drops out entirely
    assert 4 not in got


def test_ngram_span_pairs_exact(spark):
    from meza_spark.llm.dedup import ngram_span_pairs

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"intro words {shared} closing remarks"),
        (2, f"other leading text {shared}"),
        (3, "totally different content with no overlap at all here now"),
        (4, "short doc"),                       # < n tokens: skipped
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = ngram_span_pairs(docs, n=10)
    assert _pairs_set(pairs) == {(1, 2)}


def test_ngram_span_pairs_no_partial_overlap(spark):
    from meza_spark.llm.dedup import ngram_span_pairs

    # 9-token shared run < n=10 → NOT a pair
    run9 = "a b c d e f g h i"
    docs = spark.createDataFrame(
        [(1, f"{run9} x1 y1 z1"), (2, f"{run9} x2 y2 z2")],
        ["doc_id", "text"])
    assert _pairs_set(ngram_span_pairs(docs, n=10)) == set()


def test_ngram_span_hot_gram_capped(spark):
    from meza_spark.llm.dedup import ngram_span_pairs

    boiler = "this exact legal disclaimer footer appears on every single page"
    rows = [(i, f"{boiler} plus unique tail {i}") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = ngram_span_pairs(docs, n=10, max_bucket=10)
    assert _pairs_set(capped) == set()
    assert capped._dropped_buckets.count() > 0
    uncapped = ngram_span_pairs(docs, n=10, max_bucket=None)
    assert uncapped.count() == 30 * 29 // 2


def test_ngram_span_plan_jvm_only(spark):
    from meza_spark.llm.dedup import ngram_span_pairs

    docs = spark.createDataFrame([(1, "a b c d e f g h i j k")],
                                 ["doc_id", "text"])
    from meza_spark.util import explain_str

    plan = explain_str(ngram_span_pairs(docs, n=10), "simple")
    assert "Python" not in plan        # hashing never leaves the JVM
    assert "BatchEvalPython" not in plan


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    from meza_spark.llm.dedup import remove_duplicate_spans

    boil = "one two three four five"          # 5-token duplicated run
    rows = [
        (1, f"alpha {boil} beta"),            # first occurrence -> kept
        (2, f"gamma {boil} delta"),           # later -> span stripped
        (3, "totally unique text here now"),  # untouched
        (4, boil),                            # exact dup of the run
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"]
           for r in remove_duplicate_spans(df, n=5).collect()}
    assert out[1] == f"alpha {boil} beta"
    assert out[2] == "gamma delta"
    assert out[3] == "totally unique text here now"
    assert out[4] == ""                       # fully covered non-winner
    # doc count preserved: records in, records out
    assert len(out) == 4


def test_remove_duplicate_spans_within_one_doc(spark):
    from meza_spark.llm.dedup import remove_duplicate_spans

    run = "a b c d e"
    df = spark.createDataFrame(
        [(1, f"{run} x {run}")], ["doc_id", "text"])
    out = remove_duplicate_spans(df, n=5).collect()[0]["text"]
    assert out == f"{run} x"                  # second in-doc copy stripped


def test_remove_duplicate_spans_carries_other_columns(spark):
    from meza_spark.llm.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        [(1, "p q r s t u", "web"), (2, "p q r s t u", "wiki")],
        ["doc_id", "text", "source"])
    rows = {r["doc_id"]: r for r in
            remove_duplicate_spans(df, n=6).collect()}
    assert rows[1]["source"] == "web" and rows[2]["source"] == "wiki"
    assert rows[1]["text"] == "p q r s t u" and rows[2]["text"] == ""


def test_null_text_rows_survive_every_dedup_op(spark):
    # real-world corpora carry null text cells; no operator may crash
    from meza_spark.llm.dedup import (dedup_lines, exact_dedup,
                                      minhash_lsh_pairs,
                                      minhash_signatures,
                                      remove_duplicate_spans, simhash,
                                      simhash_pairs)

    df = spark.createDataFrame([(1, "hello world text"), (2, None)],
                               "doc_id long, text string")
    assert exact_dedup(df).count() == 2
    assert minhash_signatures(df).count() == 2
    assert simhash(df).count() == 2
    assert simhash_pairs(df).count() == 0
    assert minhash_lsh_pairs(df, min_jaccard=0.3).count() == 0
    assert remove_duplicate_spans(df, n=2).count() == 2
    dedup_lines(df).collect()  # null line-split row drops, no crash
    from meza_spark.llm.dedup import ngram_containment

    # null-text rows pair-score to null -> filtered, no crash
    assert ngram_containment(df, min_containment=0.1).count() == 0


def test_ngram_containment_subset_pair(spark):
    """A verbatim prefix scores containment 1.0 even when Jaccard is
    far below threshold (the asymmetric signal's reason to exist)."""
    from meza_spark.llm.dedup import ngram_containment, ngram_jaccard

    big = "a b c d e f g h i j k l m n o p q r s t"
    small = "a b c d e f g h i j"  # first half: every 3-gram ⊂ big
    df = spark.createDataFrame([(1, big), (2, small), (3, "x y z w v")],
                               ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]): r["containment"]
             for r in ngram_containment(df).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 0.0 and pairs[(2, 3)] == 0.0
    jac = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard(df).collect()}
    assert jac[(1, 2)] < 0.5  # Jaccard misses what containment sees


def test_ngram_containment_two_frame_and_threshold(spark):
    from meza_spark.llm.dedup import ngram_containment

    a = spark.createDataFrame([(1, "p q r s t")], ["doc_id", "text"])
    b = spark.createDataFrame([(10, "p q r"), (11, "z z z")],
                              ["doc_id", "text"])
    got = ngram_containment(a, b, min_containment=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 10)]
