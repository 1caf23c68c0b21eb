"""Tests for meza_spark.layout (Z-order clustering)."""

import pytest
from pyspark.sql import functions as F

from meza_spark.layout import zorder_key, zorder_repartition, zorder_write


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3)], ["x", "y"])
    got = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y", zorder_key(["x", "y"], bits=4).alias("z")).collect()}
    # x occupies even bit positions, y odd ones
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(2, 0)] == 4
    assert got[(3, 3)] == 15


def test_zorder_key_validation(spark):
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"])
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=40)


def test_zorder_key_jvm_only(spark):
    df = spark.range(10).select(F.col("id").alias("x"),
                                (F.col("id") * 3).alias("y"))
    from meza_spark.util import explain_str

    plan = explain_str(df.select(zorder_key(["x", "y"]).alias("z")),
                       "simple")
    assert "Python" not in plan


def test_zorder_repartition_preserves_rows(spark):
    df = spark.range(1000).select(
        (F.col("id") % 32).alias("a"),
        (F.col("id") / 32).cast("long").alias("b"),
        F.col("id").alias("v"))
    out = zorder_repartition(df, ["a", "b"], bits=6, num_partitions=4)
    assert "_zorder" not in out.columns
    assert out.count() == 1000
    assert out.select(F.sum("v")).collect()[0][0] == 999 * 1000 // 2


def test_zorder_write_improves_zone_maps(spark, tmp_path):
    # 64x64 grid in row-major order: a column-predicate scan touches
    # every row group. Z-ordered, the same predicate prunes most.
    n = 64
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b"))
    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "zord")
    df.repartitionByRange(8, "b").write.parquet(plain)  # clustered by b only
    zorder_write(df, zpath, ["a", "b"], bits=6, num_partitions=8)

    def spread_of(path, col):
        # per-file min/max width for `col`: narrower = better zone maps
        import pyarrow.parquet as pq
        import glob
        widths = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == col and c.statistics:
                        widths.append(c.statistics.max - c.statistics.min)
        return sum(widths) / len(widths)

    # plain layout: `a` spans its whole domain in every file;
    # z-order: each file covers ~a quadrant of both dimensions
    assert spread_of(zpath, "a") < spread_of(plain, "a") * 0.6
    assert spread_of(zpath, "b") < n  # still partially clustered on b


def test_compact_files_shrinks_and_preserves(spark, tmp_path):
    from meza_spark.layout import compact_files

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    spark.range(1000).withColumnRenamed("id", "k") \
        .repartition(20).write.parquet(src)
    stats = compact_files(spark, src, dst,
                          target_file_bytes=50 * 1024 * 1024)
    assert stats["files_before"] == 20
    assert stats["files_after"] == 1
    assert spark.read.parquet(dst).count() == 1000
    assert (spark.read.parquet(dst).agg({"k": "sum"}).collect()[0][0]
            == 499500)


def test_compact_files_rejects_inplace(spark, tmp_path):
    import pytest

    from meza_spark.layout import compact_files

    p = str(tmp_path / "x")
    spark.range(10).write.parquet(p)
    with pytest.raises(ValueError):
        compact_files(spark, p, p)


def test_compact_files_with_zorder(spark, tmp_path):
    from meza_spark.layout import compact_files

    src, dst = str(tmp_path / "f2"), str(tmp_path / "c2")
    (spark.range(500)
     .selectExpr("id % 23 AS a", "id % 17 AS b", "id AS v")
     .repartition(10).write.parquet(src))
    stats = compact_files(spark, src, dst,
                          target_file_bytes=50 * 1024 * 1024,
                          zorder_cols=["a", "b"])
    assert stats["files_after"] == 1
    assert spark.read.parquet(dst).count() == 500
