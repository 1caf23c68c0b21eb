"""Bloom-filter incremental dedup: new batch vs an already-kept corpus.

Beyond-reference: meza's ``unique`` (ref: meza/process.py:851-898)
dedupes one stream against itself; a training pipeline continuously
dedupes each NEW crawl batch against billions of already-kept keys. A
full anti-join re-shuffles the whole seen corpus per batch; the bloom
path shuffles it once per *rebuild* instead:

  1. ``build_bloom``: one distributed pass over seen keys → per-
     partition dense bitmaps → tree-OR into one bitmap (size is
     n_bits/8 regardless of row count; 1e9 keys @1% fpr ≈ 1.2 GiB).
  2. ``might_contain``: broadcast the bitmap; an Arrow-batched pandas
     UDF tests k bit positions per key — no join, no shuffle.
  3. ``dedup_against``: rows failing the bloom are DEFINITELY new (no
     false negatives) and pass through join-free; only the ~fpr
     fraction of maybe-dups anti-join against the seen corpus. The
     result is therefore EXACT — the bloom only shrinks the join's
     probe side.

Hashing: ``pd.util.hash_pandas_object`` with two fixed 16-byte keys
(vectorized, process-stable) feeding double hashing
``pos_i = (h1 + i·h2) mod n_bits`` — the standard Kirsch-Mitzenmacher
construction, identical on build and probe sides.

The per-partition bitmap build uses ``rdd.mapPartitions`` +
``treeReduce`` — the one place imperative per-partition logic is
genuinely needed (a dense-bitmap OR-reduce is not expressible as a
DataFrame aggregate without exploding k·N bit positions through a
shuffle).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["BloomFilter", "build_bloom", "might_contain", "dedup_against"]

_KEY1 = "meza-bloom-h1-0123"[:16]
_KEY2 = "meza-bloom-h2-4567"[:16]


class BloomFilter:
    """Immutable bloom state: dense bitmap + parameters."""

    def __init__(self, bits: np.ndarray, n_bits: int, k: int):
        self.bits = bits          # uint8[n_bits/8]
        self.n_bits = n_bits
        self.k = k

    @staticmethod
    def params(expected_items: int, fpr: float = 0.01) -> tuple[int, int]:
        """Optimal (n_bits, k) for a target false-positive rate;
        n_bits rounded up to a byte multiple."""
        n_bits = int(-expected_items * math.log(fpr) / (math.log(2) ** 2))
        n_bits = max(64, (n_bits + 7) // 8 * 8)
        k = max(1, round(n_bits / expected_items * math.log(2)))
        return n_bits, k


def _positions(vals: pd.Series, n_bits: int, k: int) -> np.ndarray:
    """(len(vals), k) bit positions via double hashing — vectorized,
    identical across build/probe processes."""
    s = vals.astype(str)
    h1 = pd.util.hash_pandas_object(s, index=False, hash_key=_KEY1).values
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=_KEY2).values
    # force odd step so h2 never cycles within a power-of-two n_bits
    h2 = h2 | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(n_bits)).astype(np.int64)


def build_bloom(df: DataFrame, col: str,
                expected_items: int | None = None,
                fpr: float = 0.01,
                n_bits: int | None = None,
                k: int | None = None) -> BloomFilter:
    """One distributed pass over ``df[col]`` → BloomFilter.

    ``expected_items`` defaults to a ``df.count()`` (extra scan —
    pass the known corpus size in production). Per-partition dense
    bitmaps OR together in a tree (depth 2): driver receives one
    bitmap, not one per partition.
    """
    if n_bits is None or k is None:
        if expected_items is None:
            expected_items = df.count()
        n_bits, k = BloomFilter.params(max(1, expected_items), fpr)
    nb, kk = n_bits, k

    def _partition_bitmap(batches):
        # one dense bitmap per PARTITION, fed whole Arrow batches —
        # the .rdd.mapPartitions form this replaced pickled every key
        # row JVM→Python one at a time (guide §4.1: the boundary
        # crosses as columnar batches, the per-row tax disappears);
        # the emitted row is the bitmap, so downstream still reduces
        # one row per partition, not per key
        bits = np.zeros(nb // 8, dtype=np.uint8)
        for pdf in batches:
            s = pdf.iloc[:, 0]
            if len(s):
                pos = _positions(s, nb, kk).ravel()
                np.bitwise_or.at(bits, pos >> 3,
                                 np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    # NOTE: the bitmap rides as ONE binary cell per partition; Arrow
    # caps a plain binary cell at 2 GiB, so n_bits/8 must stay under
    # that — true for the documented design point (1e9 keys @1% fpr ≈
    # 1.2 GiB) and for anything the driver could broadcast anyway.
    rows = df.select(F.col(col).cast("string")).mapInPandas(
        _partition_bitmap, "bits binary")
    rdd = rows.rdd.map(lambda r: np.frombuffer(r[0], dtype=np.uint8))
    bits = rdd.treeReduce(np.bitwise_or, depth=2)
    # treeReduce hands back a read-only frombuffer view; own the bytes
    return BloomFilter(np.array(bits, dtype=np.uint8), nb, kk)


def might_contain(df: DataFrame, col: str, bloom: BloomFilter,
                  out_col: str = "maybe_seen") -> DataFrame:
    """Add boolean ``out_col``: True ⇔ all k bloom bits set (possible
    member; false positives at ~fpr, never false negatives).

    The bitmap ships once per executor via a Spark broadcast; probing
    is numpy over Arrow batches — no shuffle, no join.
    """
    bc = df.sparkSession.sparkContext.broadcast(bloom.bits)
    nb, kk = bloom.n_bits, bloom.k

    @pandas_udf("boolean")
    def _probe(vals: pd.Series) -> pd.Series:
        bits = bc.value
        pos = _positions(vals, nb, kk)
        hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8)))
        return pd.Series((hit != 0).all(axis=1))

    # Nondeterministic mark (guide §4.4): callers branch on this
    # column (dedup_against filters `out_col` AND `NOT out_col`), and
    # the optimizer both duplicated the probe below each pushed filter
    # and — worse — INFERRED `probe(key)` onto the anti-join's seen
    # side from the equi-join constraint, adding a full-corpus UDF
    # pass that keeps 100% of seen rows (every seen key was inserted,
    # a bloom has no false negatives on members — the inferred filter
    # can never drop anything). The mark stops inference/duplication;
    # the probe itself stays deterministic in fact, so results are
    # unchanged. Plan: 6 ArrowEvalPython → 4 on dedup_incremental,
    # and the seen corpus scan is UDF-free again.
    probe = _probe.asNondeterministic()
    return df.withColumn(out_col, probe(F.col(col).cast("string")))


def dedup_against(new: DataFrame, seen: DataFrame, on: str | Column,
                  bloom: BloomFilter | None = None,
                  expected_items: int | None = None,
                  fpr: float = 0.01) -> DataFrame:
    """EXACT incremental dedup: rows of ``new`` whose ``on`` key does
    not occur in ``seen``. ``on`` is a column name present in both.

    Bloom pre-filter → definitely-new rows skip the join entirely;
    only bloom-positive rows (true dups + ~fpr false positives)
    anti-join against ``seen``. Exactness: bloom has no false
    negatives, and the anti-join removes its false positives. At 100 TB
    the anti-join's left side shrinks from |new| to
    |dups| + fpr·|new|; build the bloom once per corpus rebuild, not
    per batch.
    """
    key = on if isinstance(on, str) else None
    if key is None:
        raise TypeError("dedup_against requires a column name key")
    if bloom is None:
        bloom = build_bloom(seen, key, expected_items=expected_items,
                            fpr=fpr)
    flagged = might_contain(new, key, bloom, out_col="_maybe")
    fresh = flagged.where(~F.col("_maybe")).drop("_maybe")
    suspect = flagged.where(F.col("_maybe")).drop("_maybe")
    # no .distinct() on the build side: left_anti never duplicates
    # probe rows, so deduping seen keys would only add a shuffle
    verified = suspect.join(seen.select(key), on=key, how="left_anti")
    return fresh.unionByName(verified)
