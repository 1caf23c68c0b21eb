"""Engine-internal utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Ensure enough partitions to use the cluster for compute-heavy
    row-local work.

    Parquet scans parallelize at ROW-GROUP granularity: a table written
    as one row group is one task no matter how many cores exist (the
    local sf0.1 files are exactly this). For CPU-bound per-row operators
    (MinHash/SimHash signatures, media decode) a pre-repartition costs a
    tiny shuffle and unlocks full parallelism — measured 2.7x on
    signature computation locally. At 100 TB inputs have thousands of
    row groups and this becomes a no-op (partitions >= target), so it is
    safe to leave on: the check is metadata-only, no job is triggered.

    Not for cheap scans/aggregations — a shuffle before a map-side
    partial agg only adds cost (measured q1: 0.4s -> 0.8s).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
