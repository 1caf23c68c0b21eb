"""Avro OCF source/sink (io/avro.py): varint/zigzag codec, blocks,
deflate, nullable unions, arrays, corrupt-input gates."""

import pytest
from pyspark.sql import functions as F

from meza_spark.io.avro import (_zigzag_decode, _zigzag_encode,
                                read_avro, records2avro)


def test_zigzag_codec_roundtrip():
    for n in (0, 1, -1, 2, -2, 63, 64, -64, -65, 1 << 40,
              -(1 << 40), (1 << 62), -(1 << 62)):
        enc = _zigzag_encode(n)
        got, pos = _zigzag_decode(enc, 0)
        assert (got, pos) == (n, len(enc)), n


@pytest.fixture()
def mixed(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5, True, bytes([0, 255, 9]), [1, 2, 3]),
         (2, None, None, False, None, []),
         (3, "γunicode", -2.25, None, b"", None)],
        "id long, name string, score double, flag boolean, "
        "payload binary, nums array<bigint>")


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_types_and_nulls(spark, mixed, tmp_path, codec):
    path = str(tmp_path / f"t_{codec}.avro")
    records2avro(mixed, path, codec=codec)
    got = read_avro(spark, path)
    assert got.schema == mixed.schema
    a = sorted(map(tuple, mixed.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_multi_block_and_determinism(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("d"))
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    records2avro(df, p1, block_rows=100)
    records2avro(df, p2, block_rows=100)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    assert read_avro(spark, p1).count() == 1000
    assert read_avro(spark, p1).agg(F.sum("d")).first()[0] == 999000.0


def test_unsupported_and_corrupt_inputs(spark, mixed, tmp_path):
    nested = mixed.select(F.struct("id", "name").alias("s"))
    with pytest.raises(ValueError, match="unsupported column type"):
        records2avro(nested, str(tmp_path / "x.avro"))
    bad = tmp_path / "bad.avro"
    bad.write_bytes(b"NOPE" + bytes(64))
    with pytest.raises(Exception, match="not an Avro"):
        read_avro(spark, str(bad))
    good = tmp_path / "good.avro"
    records2avro(mixed, str(good))
    data = bytearray(good.read_bytes())
    data[-5] ^= 0xFF                    # corrupt the final sync marker
    (tmp_path / "trunc.avro").write_bytes(bytes(data))
    with pytest.raises(Exception, match="sync marker"):
        read_avro(spark, str(tmp_path / "trunc.avro")).collect()


def test_empty_frame(spark, tmp_path):
    df = spark.createDataFrame([], "id long, name string")
    path = str(tmp_path / "empty.avro")
    records2avro(df, path)
    got = read_avro(spark, path)
    assert got.count() == 0 and got.columns == ["id", "name"]
