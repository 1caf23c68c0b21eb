"""records ↔ DataFrame interop (reference: meza's core abstraction and
convert.py boundary functions).

The reference's universal currency is ``records = Iter[dict]``
(README.rst:156-158). The engine's currency is the DataFrame. These
adapters are the bridge for meza-style consumers:

  records(df)        → lazy iterator of dicts (toLocalIterator: one
                       partition in driver memory at a time — the
                       meza "low memory" contract, not collect())
  from_records(...)  → DataFrame from an iterator of (possibly ragged)
                       dicts (ref ragged semantics, SURVEY §1.1)
  to_pandas/from_pandas → Arrow-backed (ref: records2df/df2records,
                       meza/convert.py:615-656,739-804)
  to_array/from_array → NumPy structured array (ref: records2array/
                       array2records, meza/convert.py:559-612,659-736)
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["records", "from_records", "to_pandas", "from_pandas",
           "to_array", "from_array"]


def records(df: DataFrame) -> Iterator[dict]:
    """DataFrame → lazy generator of dicts; pulls one partition at a
    time (streaming-consumer analog of meza's generator chain)."""
    for row in df.toLocalIterator():
        yield row.asDict(recursive=True)


def from_records(spark: SparkSession, rows: Iterable[dict],
                 sample: int = 1000) -> DataFrame:
    """Iterator of ragged dicts → DataFrame.

    Column set = union of keys over a ``sample`` prefix (first-seen
    order, SURVEY §7 hard-part 7); missing keys → null. Rows beyond the
    sample with unseen keys would be dropped — matching the reference's
    own first-rows-decide header semantics (io.py:824-846).
    """
    it = iter(rows)
    head: list[dict] = []
    for _ in range(sample):
        try:
            head.append(next(it))
        except StopIteration:
            break
    cols: list[str] = []
    seen = set()
    for r in head:
        for k in r:
            if k not in seen:
                seen.add(k)
                cols.append(k)
    if not head:
        from pyspark.sql.types import StringType, StructField, StructType

        return spark.createDataFrame([], StructType(
            [StructField(c, StringType()) for c in cols]))

    def gen():
        for r in head:
            yield tuple(r.get(c) for c in cols)
        for r in it:
            yield tuple(r.get(c) for c in cols)

    return spark.createDataFrame(gen(), schema=cols)


def to_pandas(df: DataFrame):
    """Arrow-batched toPandas (ref records2df, meza/convert.py:739-804).
    Driver-memory bound — for big frames use df.write.parquet and read
    with pyarrow.dataset instead."""
    return df.toPandas()


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    return spark.createDataFrame(pdf)


def to_array(df: DataFrame):
    """NumPy structured array (ref records2array,
    meza/convert.py:659-736)."""
    return df.toPandas().to_records(index=False)


def from_array(spark: SparkSession, arr) -> DataFrame:
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(arr))
