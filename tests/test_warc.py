"""WARC source/sink (io/warc.py): record walking, gzip members,
HTTP envelope stripping, and the sink's deterministic layout."""

import gzip

import pytest
from pyspark.sql import functions as F

from meza_spark.io.warc import read_warc, records2warc


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [("d1", "hello world", "https://a.example/1"),
         ("d2", "café au lait — résumé",
          "https://b.example/café"),
         ("d3", "", "https://c.example/empty")],
        "doc_id string, text string, url string")


def test_roundtrip_plain_and_gzip(spark, docs, tmp_path):
    for name in ("a.warc", "b.warc.gz"):
        path = str(tmp_path / name)
        records2warc(docs, path, url_col="url", payload_col="text")
        got = (read_warc(spark, path)
               .select("target_uri",
                       F.decode("payload", "UTF-8").alias("text"),
                       "http_status", "http_content_type")
               .orderBy("target_uri").collect())
        assert [r["target_uri"] for r in got] == \
            ["https://a.example/1", "https://b.example/café",
             "https://c.example/empty"]
        by_uri = {r["target_uri"]: r for r in got}
        assert by_uri["https://b.example/café"]["text"] == \
            "café au lait — résumé"
        assert by_uri["https://c.example/empty"]["text"] == ""
        assert all(r["http_status"] == 200 for r in got)
        assert all(r["http_content_type"] == "text/html" for r in got)


def test_gzip_is_record_per_member_and_deterministic(docs, tmp_path):
    """Common Crawl layout: each record its own gzip member; the
    artifact is byte-identical across writes (mtime pinned)."""
    p1, p2 = str(tmp_path / "x.warc.gz"), str(tmp_path / "y.warc.gz")
    records2warc(docs.orderBy("doc_id"), p1, url_col="url")
    records2warc(docs.orderBy("doc_id"), p2, url_col="url")
    b1 = open(p1, "rb").read()
    assert b1 == open(p2, "rb").read()
    # three independent members: magic bytes appear at three offsets
    # and each member decompresses standalone to one WARC record
    assert b1.count(b"\x1f\x8b\x08") == 3
    first = gzip.GzipFile(fileobj=__import__("io").BytesIO(b1)).read()
    assert first.startswith(b"WARC/1.0\r\n")


def test_record_type_filter_and_raw_payload(spark, tmp_path):
    """warcinfo/request records are skipped by default; strip_http
    off returns the full HTTP envelope."""
    path = str(tmp_path / "mixed.warc")
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 5\r\n\r\nhello\r\n\r\n")
    body = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\nnope"
    resp = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x.example/\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n")
    with open(path, "wb") as f:
        f.write(info + resp)
    rows = read_warc(spark, path).collect()
    assert len(rows) == 1
    assert rows[0]["http_status"] == 404
    assert bytes(rows[0]["payload"]) == b"nope"
    raw = read_warc(spark, path, strip_http=False).collect()
    assert bytes(raw[0]["payload"]).startswith(b"HTTP/1.1 404")
    everything = read_warc(
        spark, path, record_types=("response", "warcinfo")).collect()
    assert len(everything) == 2


def test_truncated_archive_raises(spark, tmp_path):
    path = str(tmp_path / "trunc.warc")
    with open(path, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: 999\r\n\r\nshort")
    with pytest.raises(Exception, match="truncated"):
        read_warc(spark, path).collect()


def test_binary_payload_passthrough(spark, tmp_path):
    """Non-text payloads (the multimodal case) survive byte-exact."""
    import pyspark.sql.types as T

    blob = bytes(range(256)) * 4
    sdf = spark.createDataFrame(
        [("b1", blob, "https://bin.example/1")],
        T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("url", T.StringType())]))
    path = str(tmp_path / "bin.warc.gz")
    records2warc(sdf, path, url_col="url", payload_col="payload",
                 content_type="application/octet-stream")
    row = read_warc(spark, path).collect()[0]
    assert bytes(row["payload"]) == blob
    assert row["http_content_type"] == "application/octet-stream"


def test_sharded_writer_matches_single_artifact(spark, tmp_path):
    """records2warc_sharded (r9: the executor-parallel scale sink)
    must produce the same RECORD SET as the driver-serial
    single-artifact sink — identical per-record bytes, just spread
    over part-NNNNN.warc.gz segments."""
    from meza_spark.io.warc import records2warc_sharded

    rows = [(f"https://ex.com/{i}", f"body {i} text") for i in range(40)]
    sdf = spark.createDataFrame(rows, "url string, text string")

    single = str(tmp_path / "one.warc.gz")
    records2warc(sdf, single, url_col="url", payload_col="text")
    shard_dir = str(tmp_path / "shards")
    n = records2warc_sharded(sdf, shard_dir, url_col="url",
                             payload_col="text", shards=8)
    assert 1 <= n <= 8
    import os
    parts = [f for f in os.listdir(shard_dir)
             if f.startswith("part-") and f.endswith(".warc.gz")]
    assert len(parts) == n

    def keyset(df):
        return {(r["target_uri"], r["record_id"],
                 bytes(r["payload"])) for r in df.collect()}

    got_one = keyset(read_warc(spark, single))
    got_sharded = keyset(read_warc(spark, shard_dir))
    assert got_sharded == got_one and len(got_one) == 40
    # stale shards from a previous layout are cleaned on rewrite
    records2warc_sharded(sdf.limit(3), shard_dir, url_col="url",
                         payload_col="text", shards=2)
    assert len(read_warc(spark, shard_dir).collect()) == 3


def test_wet_roundtrip(spark, tmp_path):
    """WET = conversion records with plain-text bodies; read_wet
    decodes them back exactly (unicode included)."""
    from meza_spark.io.warc import read_wet, records2wet_sharded

    rows = [("http://x/1", "text one"), ("http://x/2", "café — two")]
    sdf = spark.createDataFrame(rows, "url string, text string")
    d = str(tmp_path / "wet")
    assert records2wet_sharded(sdf, d, shards=2) >= 1
    got = {r["target_uri"]: (r["text"], r["n_chars"])
           for r in read_wet(spark, d).collect()}
    assert got == {"http://x/1": ("text one", 8),
                   "http://x/2": ("café — two", 10)}


def test_wet_records_invisible_to_response_reader(spark, tmp_path):
    from meza_spark.io.warc import read_warc, records2wet_sharded

    sdf = spark.createDataFrame([("http://x/1", "t")],
                                "url string, text string")
    d = str(tmp_path / "wet2")
    records2wet_sharded(sdf, d, shards=1)
    assert read_warc(spark, d).count() == 0          # default: response
    recs = read_warc(spark, d, record_types=("conversion",),
                     strip_http=False).collect()
    assert recs[0]["content_type"] == "text/plain"


def test_wat_roundtrip_and_null_fields(spark, tmp_path):
    """WAT envelopes carry title + links; read_wat extracts them
    JVM-side; empty link lists and null titles survive."""
    from meza_spark.io.warc import read_wat, records2wat_sharded

    rows = [("http://x/1", "T1", ["http://a", "http://b"]),
            ("http://x/2", None, [])]
    sdf = spark.createDataFrame(
        rows, "url string, title string, links array<string>")
    d = str(tmp_path / "wat")
    assert records2wat_sharded(sdf, d, shards=2) >= 1
    got = {r["target_uri"]: (r["title"], r["links"], r["n_links"])
           for r in read_wat(spark, d).collect()}
    assert got["http://x/1"] == ("T1", ["http://a", "http://b"], 2)
    assert got["http://x/2"] == (None, [], 0)


def test_wat_envelope_shape(spark, tmp_path):
    """The serialized JSON follows Common Crawl's field spine."""
    import json

    from meza_spark.io.warc import read_warc, records2wat_sharded

    sdf = spark.createDataFrame([("http://x/9", "T", ["http://l"])],
                                "url string, title string, links array<string>")
    d = str(tmp_path / "wat2")
    records2wat_sharded(sdf, d, shards=1)
    rec = read_warc(spark, d, record_types=("metadata",),
                    strip_http=False).collect()[0]
    assert rec["content_type"] == "application/json"
    env = json.loads(bytes(rec["payload"]).decode("utf-8"))["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "http://x/9"
    hm = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "T"
    assert hm["Links"] == [{"url": "http://l"}]
