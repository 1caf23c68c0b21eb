"""Data-layout control: Z-order (Morton) clustering for multi-column
data skipping.

Beyond-reference: meza has no storage layout concept (a generator
pipeline reads what it is given). At 100 TB, layout IS performance:
min/max zone maps on parquet row groups only prune when rows with
similar values sit together. Range-partitioning on ONE column gives
perfect pruning on that column and none on others; interleaving the
bits of k columns (the Z-/Morton curve, public: Morton 1966, and the
standard lakehouse OPTIMIZE ZORDER BY pattern) gives each of the k
columns ~1/k of its solo pruning power — the right trade for tables
queried on several independent keys.

Everything here is pure JVM bit arithmetic (shiftleft/OR fold,
whole-stage codegen) — no UDF, no shuffle beyond the final range
repartition that the caller asked for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_repartition", "zorder_write",
           "compact_files"]


def compact_files(spark, src: str, dst: str,
                  target_file_bytes: int = 128 * 1024 * 1024,
                  fmt: str = "parquet",
                  zorder_cols: Sequence[str] | None = None,
                  sort_cols: Sequence[str] | None = None) -> dict:
    """Small-files compaction — the OPTIMIZE half of the lakehouse
    maintenance pair (``zorder_write`` is the other). Streaming sinks,
    per-trigger micro-batches and over-parallel writes leave thousands
    of KB-sized files; at 100 TB the resulting open/footer-read cost
    dominates scan time and crushes the driver's file-listing step.

    Rewrites the ``src`` dataset into ``dst`` with file count
    ``ceil(total_bytes / target_file_bytes)`` (size measured from the
    source files — cheap listing, no data pass). Optionally re-clusters
    during the rewrite (``zorder_cols`` → Z-curve layout,
    ``sort_cols`` → range-partition + local sort) so one rewrite buys
    both fewer files AND zone-map pruning.

    ``dst`` must differ from ``src`` (write-then-swap is the caller's
    transaction policy — this library has no table-format commit
    protocol to make an in-place rewrite atomic, and silently deleting
    the source would violate the never-drop contract).

    Returns ``{"files_before", "bytes_before", "files_after"}``.
    """
    import math
    import os

    if os.path.abspath(src) == os.path.abspath(dst):
        raise ValueError("compact_files: dst must differ from src "
                         "(write-then-swap is the caller's job)")
    sizes = []
    for root, _dirs, names in os.walk(src):
        for nm in names:
            if not nm.startswith(("_", ".")):
                sizes.append(os.path.getsize(os.path.join(root, nm)))
    total = sum(sizes)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = getattr(spark.read, fmt)(src)
    if zorder_cols:
        out = zorder_repartition(df, zorder_cols,
                                 num_partitions=n_out)
    elif sort_cols:
        out = (df.repartitionByRange(n_out, *sort_cols)
               .sortWithinPartitions(*sort_cols))
    else:
        # coalesce when shrinking (no shuffle — the whole point of
        # compaction is cheap), repartition only if growing
        n_in = df.rdd.getNumPartitions()
        out = df.coalesce(n_out) if n_out <= n_in \
            else df.repartition(n_out)
    getattr(out.write.mode("overwrite"), fmt)(dst)
    files_after = sum(
        1 for root, _d, names in os.walk(dst)
        for nm in names
        if not nm.startswith(("_", ".")) and not nm.endswith(".crc"))
    return {"files_before": len(sizes), "bytes_before": total,
            "files_after": files_after}


def zorder_key(cols: Sequence[Column | str], bits: int = 21) -> Column:
    """Morton-interleave the low ``bits`` bits of up to 3 non-negative
    integer columns into one ``bigint`` sort key.

    ``bits`` defaults to 21 (3 × 21 = 63 bits fits signed-64).
    Callers with wider domains should bucket/shift values into range
    first; negative values need an offset (the key must be
    non-negative for the curve to order correctly).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if not 1 <= k <= 3:
        raise ValueError("zorder_key interleaves 1-3 columns")
    if bits * k > 63:
        raise ValueError(f"bits={bits} × {k} cols exceeds signed-64")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, i * k + j).cast("long"))
    return key


def zorder_repartition(df: DataFrame, cols: Sequence[str],
                       bits: int = 21,
                       num_partitions: int | None = None,
                       key_col: str = "_zorder") -> DataFrame:
    """Cluster rows along the Z-curve of ``cols``: range-partition on
    the Morton key, sort within partitions, drop the key. Writing the
    result gives parquet row groups whose min/max zone maps prune for
    predicates on ANY of ``cols``.

    One range-exchange (sampled boundaries) + local sort — exactly the
    cost of a ``repartitionByRange`` on a single column.
    """
    out = df.withColumn(key_col, zorder_key(list(cols), bits))
    if num_partitions:
        out = out.repartitionByRange(num_partitions, key_col)
    else:
        out = out.repartitionByRange(key_col)
    return out.sortWithinPartitions(key_col).drop(key_col)


def zorder_write(df: DataFrame, path: str, cols: Sequence[str],
                 bits: int = 21, num_partitions: int | None = None,
                 fmt: str = "parquet", mode: str = "overwrite") -> None:
    """``zorder_repartition`` then write — the lakehouse
    ``OPTIMIZE ... ZORDER BY`` shape as a one-shot writer."""
    out = zorder_repartition(df, cols, bits, num_partitions)
    getattr(out.write.mode(mode), fmt)(path)
