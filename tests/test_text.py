"""Text-analysis operator unit tests (repetition signals edge cases;
the bulk of text.py is covered by the llm_* oracle gates)."""

import pytest

from meza_spark.llm.text import repetition_signals


def test_repetition_signals(spark):
    rows = [
        (1, "a b c d"),                      # all unique
        (2, "spam spam spam spam"),          # one word repeated
        (3, "x\nx\ny\n\nx"),                 # dup lines, blanks excluded
        (4, ""),                             # empty text
        (5, "Tok tok TOK"),                  # casefolded word dupes
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert got[1]["dup_word_frac"] == 0.0
    assert got[1]["max_word_count"] == 1
    assert got[2]["dup_word_frac"] == 0.75
    assert got[2]["max_word_count"] == 4
    assert abs(got[3]["dup_line_frac"] - 0.5) < 1e-12   # 4 lines, 2 distinct
    assert got[4]["dup_line_frac"] == 0.0
    assert got[4]["dup_word_frac"] == 0.0
    assert got[4]["max_word_count"] == 0
    assert got[5]["dup_word_frac"] == (1.0 - 1.0 / 3.0)
    assert got[5]["max_word_count"] == 3


def test_c4_quality_flags(spark):
    from meza_spark.llm.text import c4_quality_flags

    rows = [
        (1, 'Good prose here.\nIt continues nicely!\nAnd ends well.'),
        (2, 'Home\nAbout\nContact'),            # nav menu: no punctuation
        (3, 'function() { return 1; }'),        # code
        (4, 'Lorem ipsum dolor sit amet.'),     # placeholder
        (5, ''),                                # empty
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in c4_quality_flags(df).collect()}
    assert got[1]["term_punct_line_frac"] == 1.0
    assert got[1]["c4_keep"] is True
    assert got[2]["term_punct_line_frac"] == 0.0
    assert got[2]["short_line_frac"] == 1.0
    assert got[2]["c4_keep"] is False
    assert got[3]["has_curly_brace"] is True and got[3]["c4_keep"] is False
    assert got[4]["has_lorem_ipsum"] is True and got[4]["c4_keep"] is False
    assert got[5]["term_punct_line_frac"] == 0.0


def test_scrub_pii(spark):
    from meza_spark.llm.text import scrub_pii

    rows = [(1, "mail a.b+c@x-corp.io, ip 192.168.0.1, "
                "call 555-123-4567, card 4111111111111111 end")]
    df = spark.createDataFrame(rows, "id int, text string")
    out = scrub_pii(df).collect()[0]["text"]
    assert out == ("mail <EMAIL>, ip <IP>, call <PHONE>, "
                   "card <CARD> end")


def test_scrub_pii_preserves_short_numbers(spark):
    from meza_spark.llm.text import scrub_pii

    df = spark.createDataFrame([(1, "year 2024 and zip 90210")],
                               "id int, text string")
    assert scrub_pii(df).collect()[0]["text"] == "year 2024 and zip 90210"


def test_char_entropy_values(spark):
    from meza_spark.llm.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["char_entropy"]
           for r in char_entropy(df).collect()}
    assert got[1] == 0.0            # single symbol → 0 bits
    assert abs(got[2] - 1.0) < 1e-9  # two equiprobable symbols → 1 bit
    assert abs(got[3] - 2.0) < 1e-9  # four → 2 bits
    assert got[4] == 0.0            # empty text


def test_char_entropy_no_shuffle_no_python(spark):
    from meza_spark.llm.text import char_entropy

    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    from meza_spark.util import explain_str

    plan = explain_str(char_entropy(df), "simple")
    assert "Exchange" not in plan    # row-local: zero data movement
    assert "Python" not in plan


def test_vocab_topk(spark):
    from meza_spark.llm.text import vocab_topk

    df = spark.createDataFrame(
        [("the cat sat",), ("THE the dog",), ("",)], ["text"])
    out = vocab_topk(df, k=2)
    rows = [(r["token"], r["n"]) for r in out.collect()]
    assert rows == [("the", 3), ("cat", 1)]  # tie cat/dog/sat → lexical


def test_tfidf_top_terms(spark):
    from meza_spark.llm.text import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "apple apple banana"),
         (2, "banana cherry"),
         (3, "cherry cherry cherry durian")],
        ["doc_id", "text"])
    out = tfidf_top_terms(df, k=1)
    best = {r["doc_id"]: r["term"] for r in out.collect()}
    # the doc-specific repeated term wins over corpus-common ones
    assert best == {1: "apple", 2: "banana", 3: "cherry"}
    row = {r["doc_id"]: r for r in out.collect()}
    assert row[1]["tf"] == 2 and row[1]["df"] == 1
    assert row[1]["rank"] == 1


def test_tfidf_single_tokenize_pass(spark):
    from meza_spark.llm.text import tfidf_top_terms

    df = spark.createDataFrame([(1, "a b"), (2, "b c")],
                               ["doc_id", "text"])
    from meza_spark.util import explain_str

    plan = explain_str(tfidf_top_terms(df), "simple")
    # dfreq derives FROM the tf aggregate, so the join's two branches
    # share the tf exchange (AQE reuses it at runtime — statically the
    # subtree prints on both sides, hence <= 2 Generate nodes, never
    # a third independent tokenize)
    assert plan.count("Generate") <= 2
    assert "Python" not in plan


def test_unigram_logprob(spark):
    from meza_spark.llm.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the the the"), (3, "zyx qwv"),
         (4, "   ")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["logprob"])
           for r in unigram_logprob(df).collect()}
    assert out[4] == (0, None)          # token-less doc: null score
    assert out[2][0] == 3
    # 'the' appears 4/8 times -> doc 2 score = ln(0.5)
    import math
    assert abs(out[2][1] - round(math.log(4 / 8), 6)) < 1e-9
    # rare-token doc scores lowest
    assert out[3][1] < out[1][1] < out[2][1]


def test_gopher_filter_rules(spark):
    long_good = ("the quick brown fox and the lazy dog of every town "
                 "is running to the market with many other animals "
                 "carrying baskets of fresh fruit and loaves of bread "
                 "while singing songs about the weather and the roads "
                 "until the evening comes and all of them return home "
                 "to rest beside the fire with warm tea and stories")
    rows = [
        (1, long_good),                       # passes everything
        (2, "too short to keep"),             # word_count fails
        (3, "#### " * 60),                    # symbol ratio + alpha fail
    ]
    from meza_spark.llm.text import gopher_filter

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in gopher_filter(df).collect()}
    assert out[1]["gopher_keep"] is True
    assert out[1]["gopher_drop_reasons"] == []
    assert out[2]["gopher_keep"] is False
    assert "word_count" in out[2]["gopher_drop_reasons"]
    assert out[3]["gopher_symbol_ratio_ok"] is False
    assert out[3]["gopher_alpha_word_frac_ok"] is False


def test_normalize_text_jvm_steps(spark):
    from meza_spark.llm.text import normalize_text

    raw = "“Hello”  —\tworld\x07 ‘quoted’ \n  next line  "
    df = spark.createDataFrame([(1, raw)], ["id", "text"])
    got = normalize_text(df).collect()[0]["text"]
    assert got == '"Hello" - world \'quoted\'\nnext line'


def test_normalize_text_nfkc_udf(spark):
    from meza_spark.llm.text import normalize_text

    # ﬁ ligature + fullwidth digits only NFKC-fold
    df = spark.createDataFrame([(1, "ﬁle ５５")], ["id", "text"])
    got = normalize_text(df, unicode_form="NFKC").collect()[0]["text"]
    assert got == "file 55"


def test_chunk_documents_windows_and_overlap(spark):
    from meza_spark.llm.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        ["doc_id", "text"])
    out = chunk_documents(df, size=4, overlap=2)
    rows = sorted((r["doc_id"], r["chunk_id"], r["chunk_start"],
                   r["chunk_n_tokens"], r["chunk"])
                  for r in out.collect())
    assert rows == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 2, 4, "t2 t3 t4 t5"),
        (1, 2, 4, 4, "t4 t5 t6 t7"),
        (1, 3, 6, 4, "t6 t7 t8 t9"),
        (1, 4, 8, 2, "t8 t9"),
        (2, 0, 0, 2, "a b"),
    ]  # empty doc -> zero chunks
    import pytest as _p

    with _p.raises(ValueError):
        chunk_documents(df, size=4, overlap=4)


def test_chunk_documents_no_shuffle_no_python(spark):
    from meza_spark.llm.text import chunk_documents
    from meza_spark.util import plan_stats

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    st = plan_stats(chunk_documents(df, size=2, overlap=1))
    assert st["exchanges"] == 0 and st["python"] == 0


def test_perplexity_buckets_per_lang_ntile(spark):
    from meza_spark.llm.text import perplexity_buckets

    rows = [
        # en: "the the the" scores best (common tokens), gibberish worst
        (1, "the the the the", "en"), (2, "the and of to", "en"),
        (3, "zq xv jk pw", "en"),
        (4, "der der der", "de"), (5, "und nicht das", "de"),
        (6, "qqq www eee", "de"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in
           perplexity_buckets(df, n_buckets=3).collect()}
    assert len(out) == 6
    # buckets partition each language 1..3 by score desc
    for lang, ids in (("en", [1, 2, 3]), ("de", [4, 5, 6])):
        buckets = sorted(out[i]["ppl_bucket"] for i in ids)
        assert buckets == [1, 2, 3]
    # the repeated-common-token doc is the language head
    assert out[1]["ppl_bucket"] == 1 and out[4]["ppl_bucket"] == 1


def test_perplexity_buckets_empty_text_tail(spark):
    from meza_spark.llm.text import perplexity_buckets

    df = spark.createDataFrame(
        [(1, "the the", "en"), (2, "", "en")], ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in
           perplexity_buckets(df, n_buckets=2).collect()}
    assert out[2]["logprob"] is None      # no tokens → null score
    assert out[2]["ppl_bucket"] == 2      # NULLS LAST → tail bucket


def test_perplexity_buckets_approx_mode(spark):
    """exact=False (the no-window web-scale path) assigns the same
    head/tail structure: every bucket non-empty, the repeated-common-
    token doc in the head, gibberish in the tail."""
    from meza_spark.llm.text import perplexity_buckets

    # graded common/rare mixes -> strictly distinct scores per doc
    rows = [(i, " ".join(["the"] * (31 - i)
                         + [f"rare{i}x{j}" for j in range(i)]), "en")
            for i in range(30)]
    rows += [(100, "the the the the the the", "en"),
             (101, "zq xv jk pw qx vz", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r["ppl_bucket"] for r in
           perplexity_buckets(df, n_buckets=3, exact=False).collect()}
    assert set(out.values()) == {1, 2, 3}
    assert out[100] == 1      # most-common-token doc -> head
    assert out[101] == 3      # gibberish -> tail


class TestCodeSignals:
    def test_code_vs_prose(self, spark):
        from meza_spark.llm.text import code_signals

        code = ("def f(x):\n    return [x];\n"
                "class A:\n    import os\n    y = {1: 2}")
        prose = ("The quick brown fox jumps over the lazy dog. "
                 "It was a bright day and the walk felt easy.")
        df = spark.createDataFrame([(1, code), (2, prose), (3, "")],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r for r in code_signals(df).collect()}
        assert out[1]["is_code_like"] is True
        assert out[1]["code_kw_hits"] >= 3
        assert out[1]["indent_line_frac"] > 0.5
        assert out[2]["is_code_like"] is False
        assert out[2]["code_kw_hits"] == 0
        assert out[3]["code_sym_frac"] == 0.0
        assert out[3]["is_code_like"] is False

    def test_ratios_are_bounded(self, spark):
        from meza_spark.llm.text import code_signals

        df = spark.createDataFrame(
            [(1, "{}[]();=<>"), (2, "\t a\n\t b")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in code_signals(df).collect()}
        assert out[1]["code_sym_frac"] == 1.0
        assert out[2]["indent_line_frac"] == 1.0


class TestSplitSentences:
    def test_split_and_reassemble(self, spark):
        from meza_spark.llm.text import split_sentences

        df = spark.createDataFrame(
            [(1, "One sentence. Two! Three? Done"),
             (2, "No terminal punctuation at all"),
             (3, "")],
            "doc_id long, text string")
        out = split_sentences(df).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["sent_idx"], r["sentence"]))
        assert [s for _, s in sorted(by_doc[1])] == \
            ["One sentence.", "Two!", "Three?", "Done"]
        assert [s for _, s in sorted(by_doc[2])] == \
            ["No terminal punctuation at all"]
        assert 3 not in by_doc             # empty doc yields nothing

    def test_no_shuffle(self, spark):
        from meza_spark.llm.text import split_sentences

        df = spark.createDataFrame([(1, "A. B.")],
                                   "doc_id long, text string")
        plan = split_sentences(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


def test_readability_exact_and_guards(spark):
    from meza_spark.llm.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),
         (2, "Incomprehensibility notwithstanding, heterogeneous "
             "methodologies proliferate."),
         (3, ""),
         (4, "word")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability(df).collect()}
    # doc 1: 2 sentences, 6 words, 6 one-syllable words
    assert (got[1]["n_sentences"], got[1]["n_words"],
            got[1]["n_syllables"]) == (2, 6, 6)
    f = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    import math
    assert got[1]["flesch_micro"] == math.floor(f * 1e6 + 0.5)
    # doc 2 is long-word soup: lower ease than doc 1, higher grade
    assert got[2]["flesch_micro"] < got[1]["flesch_micro"]
    assert got[2]["fk_grade_micro"] > got[1]["fk_grade_micro"]
    # empty text: counts zero, scores null
    assert (got[3]["n_words"], got[3]["flesch_micro"],
            got[3]["fk_grade_micro"]) == (0, None, None)
    # no terminal punctuation still counts one sentence
    assert got[4]["n_sentences"] == 1 and got[4]["n_words"] == 1


def test_bm25_hand_computed(spark):
    import math

    from meza_spark.llm.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark join join"), (2, "spark merge"),
         (3, "window window window"), (4, "other words here")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["score"])
           for r in bm25_topk(docs, "join spark", k=10).collect()}
    # replicate: N=4, dl={1:3,2:2,3:3,4:3}, avgdl=11/4
    N, avgdl, k1, b = 4, 11 / 4, 1.2, 0.75

    def idf(dfn):
        return math.log(1 + (N - dfn + 0.5) / (dfn + 0.5))

    def norm(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = idf(1) * norm(2, 3) + idf(2) * norm(1, 3)   # join x2, spark
    exp2 = idf(2) * norm(1, 2)                          # spark only
    assert got[1] == (2, round(exp1, 6))
    assert got[2] == (1, round(exp2, 6))
    assert 3 not in got and 4 not in got               # no query terms
    # doc 1 matches more + rarer terms -> ranks first
    assert got[1][1] > got[2][1]
    with pytest.raises(ValueError):
        bm25_topk(docs, "   ")


def test_inverted_index_postings(spark):
    from meza_spark.llm.text import inverted_index

    docs = spark.createDataFrame(
        [(3, "b a b"), (1, "a c"), (2, "a b")],
        "doc_id long, text string")
    got = {r["term"]: (r["df"], list(r["postings"]))
           for r in inverted_index(docs).collect()}
    # duplicate term in one doc counts once; postings sorted by id
    assert got["a"] == (3, [1, 2, 3])
    assert got["b"] == (2, [2, 3])
    assert got["c"] == (1, [1])
    # min_df prunes, max_postings caps + flags
    capped = {r["term"]: (list(r["postings"]), r["truncated"])
              for r in inverted_index(docs, min_df=2,
                                      max_postings=2).collect()}
    assert set(capped) == {"a", "b"}
    assert capped["a"] == ([1, 2], True)
    assert capped["b"] == ([2, 3], False)


def test_bm25_quoted_and_backslash_terms_safe(spark):
    from meza_spark.llm.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "it's here"), (2, "its twin"), (3, "don\\ thing")],
        "doc_id long, text string")
    # quote and backslash terms must stay distinct labels, not crash
    # or collapse ("it''s" would lex-concatenate to 'its' in a SQL
    # string — the Column-API unpivot is immune)
    got = {r["doc_id"]: r["n_hits"]
           for r in bm25_topk(docs, "it's don\\", k=10).collect()}
    assert got == {1: 1, 3: 1}               # doc 2 ('its') no match
