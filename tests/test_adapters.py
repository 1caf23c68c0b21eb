"""records ↔ DataFrame adapter tests (SURVEY §1.1 ragged semantics,
§1.5 boundary conversions)."""

from meza_spark import adapters as ad


def test_records_lazy_iter(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "n int, s string")
    rows = list(ad.records(df.orderBy("n")))
    assert rows == [{"n": 1, "s": "a"}, {"n": 2, "s": "b"}]


def test_from_records_ragged(spark):
    # newline.json semantics (FIXTURES §4): {'a','b'} then {'b','d'}
    df = ad.from_records(spark, iter([{"a": 2, "b": 3}, {"b": 2, "d": 4}]))
    assert df.columns == ["a", "b", "d"]   # first-seen order
    rows = sorted(ad.records(df), key=lambda r: r["b"])
    assert rows[0] == {"a": None, "b": 2, "d": 4}
    assert rows[1] == {"a": 2, "b": 3, "d": None}


def test_pandas_roundtrip(spark):
    df = spark.createDataFrame([(1, 2.5)], "a bigint, b double")
    pdf = ad.to_pandas(df)
    back = ad.from_pandas(spark, pdf)
    assert [tuple(r) for r in back.collect()] == [(1, 2.5)]


def test_array_roundtrip(spark):
    df = spark.createDataFrame([(1, 2.5), (2, 3.5)], "a bigint, b double")
    arr = ad.to_array(df)
    assert arr.dtype.names == ("a", "b")
    back = ad.from_array(spark, arr)
    assert back.count() == 2


def test_hash_file(spark, tmp_path):
    from meza_spark.io import hash_file

    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    import hashlib
    assert hash_file(str(p), "sha1") == hashlib.sha1(b"hello").hexdigest()
    df = hash_file(str(tmp_path), spark=spark)
    assert df.collect()[0]["digest"] == hashlib.sha1(b"hello").hexdigest()
