"""Count-min sketch: fixed-memory approximate frequencies at corpus
scale (Cormode & Muthukrishnan 2005, public).

Beyond-reference: meza counts exactly (generator fold); at 100 TB an
exact per-key count of an unbounded domain (URLs, n-grams, user ids)
is a full shuffle of every occurrence. The CMS is a (depth × width)
int64 table: one distributed pass builds per-partition tables that
ADD together (tree reduce — sketches are mergeable by construction),
and lookups never shuffle (broadcast table + vectorized probe).
Estimates never undercount; overcount ≤ εN with probability 1-δ.

Same infrastructure pattern as ``bloom``: stable vectorized hashing
via ``pd.util.hash_pandas_object`` double hashing, ``mapPartitions``
for the dense-table build (a dense-array sum is not expressible as a
DataFrame aggregate without exploding d·N positions), ``treeReduce``
for the merge.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["CountMinSketch", "build_cms", "cms_lookup"]

_KEY1 = "meza-cms-h1-01234"[:16]
_KEY2 = "meza-cms-h2-56789"[:16]


class CountMinSketch:
    """Immutable sketch state: (depth, width) int64 count table."""

    def __init__(self, table: np.ndarray):
        self.table = table
        self.depth, self.width = table.shape

    @staticmethod
    def params(eps: float = 1e-4, delta: float = 0.01) -> tuple[int, int]:
        """(depth, width) for overcount ≤ eps·N with prob 1-delta."""
        return (max(1, math.ceil(math.log(1.0 / delta))),
                max(8, math.ceil(math.e / eps)))

    def estimate(self, values) -> np.ndarray:
        """Driver-side point query for a small list of keys."""
        pos = _positions(pd.Series(list(values)), self.depth, self.width)
        rows = np.arange(self.depth)[None, :]
        return self.table[rows, pos].min(axis=1)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Sketches over disjoint data add cell-wise."""
        return CountMinSketch(self.table + other.table)


def _positions(vals: pd.Series, depth: int, width: int) -> np.ndarray:
    """(len(vals), depth) column indices — double hashing with the
    row index as the step multiplier, identical on build and probe."""
    s = vals.astype(str)
    h1 = pd.util.hash_pandas_object(s, index=False, hash_key=_KEY1).values
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=_KEY2).values
    h2 = h2 | np.uint64(1)
    i = np.arange(depth, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(width)).astype(np.int64)


def build_cms(df: DataFrame, col: str, weight_col: str | None = None,
              eps: float = 1e-4, delta: float = 0.01,
              depth: int | None = None,
              width: int | None = None) -> CountMinSketch:
    """One distributed pass over ``df[col]`` → CountMinSketch.
    ``weight_col`` accumulates a sum per key instead of a count
    (e.g. token counts per domain)."""
    if depth is None or width is None:
        depth, width = CountMinSketch.params(eps, delta)
    d, w = depth, width

    cols = [F.col(col).cast("string").alias("_v")]
    weighted = weight_col is not None
    if weighted:
        cols.append(F.col(weight_col).cast("long").alias("_w"))

    # Arrow-batched build: the old .rdd.mapPartitions path pickled
    # every Row through the Python worker (~10× slower than the scan
    # itself); mapInPandas streams columnar batches and each partition
    # emits ONE row holding its dense table as bytes.
    def _tables(batches):
        table = np.zeros((d, w), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf["_v"]
            wts = (pdf["_w"].to_numpy(np.int64) if weighted
                   else np.ones(len(pdf), dtype=np.int64))
            pos = _positions(vals, d, w)
            for i in range(d):
                np.add.at(table[i], pos[:, i], wts)
        yield pd.DataFrame({"t": [table.tobytes()]})

    def _merge_tables(batches):
        acc = np.zeros(d * w, dtype=np.int64)
        for pdf in batches:
            for b in pdf["t"]:
                acc += np.frombuffer(b, dtype=np.int64)
        yield pd.DataFrame({"t": [acc.tobytes()]})

    # executor-side fan-in: the driver receives exactly one table no
    # matter how many input partitions, so the build scales to
    # 100k-partition scans. The intermediate 8-way tree level only
    # pays for itself when there are many partition tables to merge.
    sel = df.select(*cols)
    parts = sel.mapInPandas(_tables, "t binary")
    if sel.rdd.getNumPartitions() > 64:
        parts = parts.repartition(8).mapInPandas(_merge_tables, "t binary")
    merged = parts.repartition(1).mapInPandas(_merge_tables, "t binary")
    buf = merged.collect()[0]["t"]
    return CountMinSketch(np.frombuffer(buf, dtype=np.int64)
                          .reshape(d, w).copy())


def cms_lookup(df: DataFrame, col: str, cms: CountMinSketch,
               out_col: str = "est_count") -> DataFrame:
    """Add ``out_col``: the sketch's frequency estimate per row.
    Broadcast table + Arrow-batched numpy probe — no join, no
    shuffle."""
    bc = df.sparkSession.sparkContext.broadcast(cms.table)
    d, w = cms.depth, cms.width

    @pandas_udf("long")
    def _probe(vals: pd.Series) -> pd.Series:
        table = bc.value
        pos = _positions(vals, d, w)
        rows = np.arange(d)[None, :]
        return pd.Series(table[rows, pos].min(axis=1))

    return df.withColumn(out_col, _probe(F.col(col).cast("string")))
