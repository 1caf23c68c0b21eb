"""Arrow IPC / Feather v2 source + sink.

The Arrow file format is the zero-copy interchange lingua franca
(pandas/polars/duckdb all speak it natively); pyarrow ships in every
PySpark install (it backs the Arrow UDF path), so unlike Avro there
is nothing to gate — but Spark itself has NO arrow-file data source,
which makes this the missing bridge for "a polars/pandas job wrote
shards, Spark reads them" handoffs.

Scale shape: ``read_arrow`` rides ``binaryFile`` — one task per file,
record batches converted to pandas IN-TASK straight through the same
Arrow memory the UDF runtime already uses (no row-by-row decode at
all; this is the cheapest per-byte reader in the package).
``records2arrow`` streams ``toLocalIterator`` into bounded record
batches. Reference analog: meza's format dispatch breadth
(ref: meza/io.py:1636-1692); Arrow IPC is its modern columnar peer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SPARK_TYPES = {"int32": "int", "int64": "bigint", "int16": "smallint",
                "int8": "tinyint", "float": "float", "double": "double",
                "bool": "boolean", "string": "string",
                "large_string": "string", "binary": "binary",
                "large_binary": "binary", "date32[day]": "date",
                "timestamp[us]": "timestamp", "timestamp[ns]": "timestamp"}


def _spark_type(t) -> str:
    import pyarrow as pa

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_spark_type(t.value_type)}>"
    s = _SPARK_TYPES.get(str(t))
    if s is None:
        raise ValueError(
            f"read_arrow: unsupported arrow type {t!r}; cast upstream")
    return s


def read_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Arrow-IPC/Feather-v2 reader: one task per file.
    Schema from a bounded driver read of the first file's footer."""
    import pandas as _pd
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from .readers import _first_file

    with pa.memory_map(_first_file(path)) as src:
        schema = ipc.open_file(src).schema
    out_schema = ", ".join(
        f"`{f.name}` {_spark_type(f.type)}" for f in schema)

    def _parse(batches):
        for pdf in batches:
            for content in pdf["content"]:
                reader = ipc.open_file(pa.BufferReader(bytes(content)))
                tbl = reader.read_all()
                yield tbl.to_pandas(types_mapper=None)
        # zero-file partitions yield nothing; Spark handles it
        if False:
            yield _pd.DataFrame()

    return (spark.read.format("binaryFile").load(path)
            .select("content")
            .mapInPandas(_parse, schema=out_schema))


def records2arrow(df: DataFrame, path: str,
                  batch_rows: int = 65536,
                  compression: str | None = None) -> None:
    """DataFrame → single Arrow IPC (Feather v2) artifact, streamed in
    bounded record batches (driver memory O(batch), like the other
    single-artifact sinks). ``compression``: None | 'lz4' | 'zstd'
    (pyarrow built-ins)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(df.schema)
    opts = pa.ipc.IpcWriteOptions(compression=compression)

    def _batches():
        rows = []
        for row in df.toLocalIterator():
            rows.append(row.asDict(recursive=True))
            if len(rows) >= batch_rows:
                yield pa.RecordBatch.from_pylist(rows, schema=schema)
                rows = []
        if rows:
            yield pa.RecordBatch.from_pylist(rows, schema=schema)

    with pa.ipc.new_file(path, schema, options=opts) as writer:
        for batch in _batches():
            writer.write_batch(batch)
