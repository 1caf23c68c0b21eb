"""Byte-pair encoding: train a merge table on the corpus, tokenize
distributed (Sennrich, Haddow & Birch, "Neural Machine Translation of
Rare Words with Subword Units", ACL 2016 — public).

The engine's other token counts are proxies (whitespace + a BPE-ish
regex split in text.token_count); this module learns a REAL merge
table so downstream budgeting (pack_shards / budget_sample /
chunk_documents) can count the tokens a model would actually see.

Scale split — the fit/apply policy every learned operator here uses:
  - TRAIN touches only the word-frequency table: one distributed
    word-count (exact integer counts, order-free) truncated to the
    top ``max_words`` by ``(count DESC, word)`` — Zipf makes that a
    faithful, deterministic summary at any corpus size — then the
    classic merge loop runs driver-side on the compact table.
  - ENCODE is an Arrow-batched pandas UDF with a per-batch word
    cache (Zipf again: a few thousand distinct words cover almost
    every token) against the broadcast merge ranks. Row-local, no
    shuffle.

Determinism: counts are exact ints; the merge loop breaks count ties
by lexicographic pair order; encode applies merges by rank. Same
merge table and token stream on any partitioning/engine config.
"""

# no `from __future__ import annotations` — stringified hints break
# pandas_udf inference (llm/text.py policy)

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["bpe_train", "bpe_encode", "bpe_token_count"]

_EOW = "▁"  # end-of-word marker (SentencePiece-style visible char)


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 200,
              max_words: int = 100_000,
              min_pair_count: int = 2) -> list:
    """Learn ``num_merges`` BPE merges from the corpus word-frequency
    table. Returns the merge list ``[(left, right), ...]`` in rank
    order — pass it to :func:`bpe_encode`.

    Words are lowercase whitespace tokens with an end-of-word marker
    appended (so "low" and "lower" share a prefix but not a final
    symbol). Training stops early when no pair reaches
    ``min_pair_count``.
    """
    wc_rows = (df.select(F.explode(tokens(F.lower(F.col(text_col))))
                         .alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
               .orderBy(F.col("c").desc(), F.col("w"))
               .limit(max_words)
               .collect())
    vocab = {}
    for r in wc_rows:
        sym = tuple(r["w"]) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(r["c"])
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # deterministic: max count, ties -> lexicographically SMALLEST
        # pair (two-stage because max() can't mix desc/asc cleanly)
        top = max(pairs.values())
        if top < min_pair_count:
            break
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict) -> list:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(sym, sym[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(df: DataFrame, merges: list, text_col: str = "text",
               out: str = "bpe_tokens") -> DataFrame:
    """Append the BPE token array for ``text_col`` (lowercased,
    whitespace-pre-tokenized, end-of-word marker ``▁`` kept on final
    subwords). Arrow-batched with a per-batch word cache; null text →
    null."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache = {}

        def one(t):
            if t is None:
                return None
            toks = []
            for w in t.lower().split():
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            return toks
        return texts.map(one)

    return df.withColumn(out, _enc(F.col(text_col)))


def bpe_token_count(df: DataFrame, merges: list,
                    text_col: str = "text",
                    out: str = "n_bpe_tokens") -> DataFrame:
    """Real learned-subword token count per document — the budget unit
    for pack_shards / budget_sample / chunk_documents."""
    tmp = bpe_encode(df, merges, text_col, out="_bpe")
    return tmp.withColumn(
        out, F.coalesce(F.size("_bpe"), F.lit(0))).drop("_bpe")
