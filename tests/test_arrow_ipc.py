"""Arrow IPC / Feather v2 source+sink (io/arrow_ipc.py)."""

import pytest
from pyspark.sql import functions as F

from meza_spark.io.arrow_ipc import read_arrow, records2arrow


@pytest.fixture()
def mixed(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5, True, [1.0, 2.0]),
         (2, None, None, False, []),
         (3, "γ", -2.25, None, None)],
        "id bigint, name string, score double, flag boolean, "
        "vec array<double>")


@pytest.mark.parametrize("compression", [None, "zstd"])
def test_roundtrip(spark, mixed, tmp_path, compression):
    path = str(tmp_path / f"t_{compression}.arrow")
    records2arrow(mixed, path, compression=compression)
    got = read_arrow(spark, path)
    assert got.schema == mixed.schema
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, mixed.collect()))
    # feather/pandas interop: the same file opens outside Spark
    import pyarrow.feather as feather
    assert len(feather.read_table(path)) == 3


def test_multi_batch_and_multi_file(spark, tmp_path):
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("m"))
    d = tmp_path / "shards"
    d.mkdir()
    records2arrow(df.where("id < 500"), str(d / "a.arrow"),
                  batch_rows=128)
    records2arrow(df.where("id >= 500"), str(d / "b.arrow"),
                  batch_rows=128)
    got = read_arrow(spark, str(d))
    assert got.count() == 1000
    assert got.agg(F.sum("id")).first()[0] == 499500


def test_pandas_written_file_reads(spark, tmp_path):
    """The real use case: another engine wrote the file."""
    import pandas as pd
    import pyarrow.feather as feather

    pdf = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", None]})
    path = str(tmp_path / "ext.arrow")
    feather.write_feather(pdf, path, compression="uncompressed")
    got = read_arrow(spark, path)
    assert sorted(map(tuple, got.collect())) == \
        [(1, "a"), (2, "b"), (3, None)]


def test_empty_frame(spark, tmp_path):
    df = spark.createDataFrame([], "id bigint, name string")
    path = str(tmp_path / "empty.arrow")
    records2arrow(df, path)
    got = read_arrow(spark, path)
    assert got.count() == 0 and got.columns == ["id", "name"]
