"""SparkSession factory with engine defaults tuned for both local test
runs and large-cluster deployment.

Scale notes (100 TB design targets):
  - AQE on: runtime coalescing of shuffle partitions, skew-join
    splitting, and dynamic broadcast conversion replace hand-tuning.
  - Arrow on: every pandas_udf / toPandas boundary is batched columnar.
  - shuffle.partitions is only the *initial* number; AQE coalesces.
    On a real cluster set it ~2-3x total cores via ``conf`` overrides.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Parquet pushdown is on by default; pin it so a misconfigured
    # cluster profile can't silently disable scan-level filtering.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Keep timestamps physical-µs so DuckDB/Spark agree at oracle time.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # One BLAS thread per Python worker (see meza_spark/__init__.py:
    # N tasks × M BLAS threads oversubscribes every executor; the
    # engine's numpy kernels run inside already-parallel tasks). In
    # local mode workers inherit the driver env; these cover real
    # clusters where executors are separate JVMs.
    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
    "spark.executorEnv.OMP_NUM_THREADS": "1",
    "spark.executorEnv.MKL_NUM_THREADS": "1",
    "spark.executorEnv.NUMEXPR_NUM_THREADS": "1",
}


def get_spark(
    app_name: str = "meza_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Locally: ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``) with
    shuffle partitions = cpu count. On a cluster, pass ``master=None``
    with spark-submit providing the master and override via ``conf``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = SparkSession.builder.appName(app_name).master(master)
    # Local mode runs driver + all executor threads in ONE JVM whose
    # default heap is 1 GiB — 32 task slots starve and iterative
    # checkpoints OOM. Size the heap to the machine (env-overridable);
    # on a real cluster spark-submit's --driver-memory/--executor-memory
    # take precedence over this launch-time conf.
    if master.startswith("local"):
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        builder = builder.config("spark.driver.maxResultSize", "4g")
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver's parquet tables as a dict of DataFrames and
    register them as temp views (so ``spark.sql`` works too)."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
