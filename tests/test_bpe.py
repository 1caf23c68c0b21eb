"""BPE train/encode vs the classic Sennrich toy corpus."""

import pytest

from meza_spark.llm.bpe import (_encode_word, bpe_encode, bpe_token_count,
                                bpe_train)

EOW = "▁"


@pytest.fixture(scope="module")
def toy(spark):
    # Sennrich et al. example frequencies: low×5 lower×2 newest×6 widest×3
    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_bpe_train_classic_merges(toy):
    merges = bpe_train(toy, num_merges=4)
    # est▁ dominates (9 occurrences): e+s, then es+t, then est+▁;
    # next best is l+o (7)
    assert merges[:4] == [("e", "s"), ("es", "t"), ("est", EOW),
                         ("l", "o")]


def test_bpe_encode_applies_rank_order(toy):
    merges = bpe_train(toy, num_merges=8)
    out = bpe_encode(toy, merges).collect()[0]["bpe_tokens"]
    # "newest" must tokenize using the learned est▁ unit
    joined = " ".join(out)
    assert "est" + EOW in joined or "newest" + EOW in joined
    # round-trip property: concatenating subwords restores the words
    text = toy.collect()[0]["text"]
    assert "".join(out).replace(EOW, " ").strip() == text


def test_bpe_token_count_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "aa aa aa aa"), (2, None), (3, "")],
        "doc_id long, text string")
    merges = bpe_train(df, num_merges=3, min_pair_count=2)
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count(df, merges).collect()}
    # "aa" fully merges into one token ("aa▁") after 2 merges
    assert out[1] == 4
    assert out[2] == 0 and out[3] == 0


def test_bpe_tie_break_deterministic():
    # equal-count pairs -> lexicographically smallest merges first
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    assert _encode_word("abc", ranks) == ["ab", "c", EOW]


def test_bpe_train_min_pair_count_stops(spark):
    df = spark.createDataFrame([(1, "xy")], ["doc_id", "text"])
    # every pair occurs once -> no merge at min_pair_count=2
    assert bpe_train(df, num_merges=10, min_pair_count=2) == []
