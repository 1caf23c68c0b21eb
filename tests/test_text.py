"""Text-analysis operator unit tests (repetition signals edge cases;
the bulk of text.py is covered by the llm_* oracle gates)."""

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
