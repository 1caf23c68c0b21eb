"""Engine-internal utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread", "plan_stats", "compact"]


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

    Streaming DataFrames pass through untouched: ``.rdd`` is illegal
    on a stream (AnalysisException), and micro-batch parallelism is
    the source's concern (maxFilesPerTrigger × file splits) — this
    keeps every spread-guarded operator (media decode, signatures)
    legal inside readStream → writeStream DAGs.
    """
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Plan text for assertions/audits — the ONE place that touches
    PySpark internals (``_jdf``/``PythonSQLUtils`` are not stable API
    and vanish under Spark Connect): every plan-pinning test and
    tools/plan_audit.py route through here, so an API change is a
    one-function fix. Falls back to capturing ``df.explain(mode)``
    stdout, which is supported on every execution backend."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore
            df._jdf.queryExecution(), mode)
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def plan_stats(df: DataFrame) -> dict:
    """Physical-plan audit counters — the numbers the plan-regression
    tests pin: shuffle exchanges, broadcasts, scans, Python boundaries,
    sort-merge joins. ``plan_stats(df)["python"] == 0`` is the
    'JVM-only hot path' assertion in one call."""
    p = explain_str(df, "simple")
    return {
        "exchanges": p.count("Exchange") - p.count("BroadcastExchange")
        - p.count("ReusedExchange"),
        "broadcasts": p.count("BroadcastExchange"),
        "reused_exchanges": p.count("ReusedExchange"),
        "scans": p.count("Scan "),
        "python": p.count("Python"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "broadcast_joins": p.count("BroadcastHashJoin")
        + p.count("BroadcastNestedLoopJoin"),
        "window_execs": p.count("Window"),
    }


def compact(spark, path: str, target_file_mb: int = 256,
            fmt: str = "parquet") -> int:
    """Small-files compaction: rewrite a table directory into
    ~``target_file_mb`` files (the lakehouse OPTIMIZE pattern —
    thousands of kilobyte part-files turn listings and scan task
    scheduling into the bottleneck long before IO does).

    Sizes come from the filesystem, the rewrite is one coalesce (no
    shuffle; file boundaries only). Returns the new file count.
    Writes to a sibling temp dir then swaps, so a crash never leaves
    the table half-compacted.
    """
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path) for f in fs
        if not f.startswith(("_", ".")))
    n_files = max(1, math.ceil(total / (target_file_mb << 20)))
    df = getattr(spark.read, fmt)(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    getattr(df.coalesce(n_files).write.mode("overwrite"), fmt)(tmp)
    bak = path.rstrip("/") + "._compact_old"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return n_files
