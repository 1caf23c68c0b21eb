"""WebDataset tar shards (io/webdataset.py): sample grouping by key,
multi-dot extensions, ext pruning, deterministic single-artifact sink,
and the executor-side sharded sink + manifest."""

import io
import json
import tarfile

import pytest
from pyspark.sql import functions as F

from meza_spark.io.webdataset import (read_webdataset, records2webdataset,
                                      write_webdataset_shards)


@pytest.fixture()
def samples(spark):
    return spark.createDataFrame(
        [(f"{i:05d}", f"text {i}", json.dumps({"i": i, "lang": "en"}),
          bytes([i % 256]) * 8) for i in range(40)],
        "key string, text string, meta string, img binary").orderBy("key")


MEMBERS = {"txt": "text", "json": "meta", "seg.png": "img"}


def test_roundtrip_plain_and_gzip(spark, samples, tmp_path):
    for name in ("a.tar", "b.tar.gz"):
        path = str(tmp_path / name)
        records2webdataset(samples, path, "key", MEMBERS)
        got = read_webdataset(spark, path).orderBy("key").collect()
        assert len(got) == 40
        r7 = got[7]
        # one ROW per sample, members grouped under their key
        assert r7["key"] == "00007"
        assert r7["exts"] == ["json", "seg.png", "txt"]
        assert r7["data"]["txt"] == b"text 7"
        assert json.loads(r7["data"]["json"])["i"] == 7
        # multi-dot extension (key splits at the FIRST dot only)
        assert r7["data"]["seg.png"] == bytes([7]) * 8


def test_sink_bytes_deterministic_and_pinned(samples, tmp_path):
    a, b = str(tmp_path / "a.tar"), str(tmp_path / "r2.tar")
    records2webdataset(samples, a, "key", MEMBERS)
    records2webdataset(samples, b, "key", MEMBERS)
    ba, bb = open(a, "rb").read(), open(b, "rb").read()
    assert ba == bb
    # gzip shards must not embed the sink filename (FNAME header)
    g1, g2 = str(tmp_path / "one.tar.gz"), str(tmp_path / "two.tar.gz")
    records2webdataset(samples, g1, "key", MEMBERS)
    records2webdataset(samples, g2, "key", MEMBERS)
    assert open(g1, "rb").read() == open(g2, "rb").read()
    # member metadata pinned: mtime/uid/gid 0, adjacent per sample
    with tarfile.open(fileobj=io.BytesIO(ba)) as tf:
        names = tf.getnames()
        first = tf.getmembers()[0]
        assert first.mtime == 0 and first.uid == 0 and first.gid == 0
    assert names[:3] == ["00000.txt", "00000.json", "00000.seg.png"]


def test_ext_filter_prunes_in_task(spark, samples, tmp_path):
    path = str(tmp_path / "f.tar")
    records2webdataset(samples, path, "key", MEMBERS)
    got = read_webdataset(spark, path, ext_filter=["txt"]).collect()
    assert len(got) == 40
    assert all(r["exts"] == ["txt"] for r in got)
    # filtering every member away drops the sample row entirely
    none = read_webdataset(spark, path, ext_filter=["nope"]).collect()
    assert none == []


def test_sharded_sink_manifest_and_reread(spark, samples, tmp_path):
    d = str(tmp_path / "shards")
    man = write_webdataset_shards(samples, d, "key", {"txt": "text"},
                                  n_shards=4).collect()
    assert sum(r["n_samples"] for r in man) == 40
    assert {r["shard"] for r in man} <= {0, 1, 2, 3}
    back = read_webdataset(spark, d + "/*.tar")
    assert back.count() == 40
    # content-addressed shard assignment: a repartitioned rerun lands
    # every sample in the same shard (manifest identical)
    d2 = str(tmp_path / "shards2")
    man2 = write_webdataset_shards(samples.repartition(7), d2, "key",
                                   {"txt": "text"}, n_shards=4).collect()
    assert sorted(map(tuple, man)) == sorted(map(tuple, man2))
    for r in man:
        p1 = f"{d}/shard-{r['shard']:06d}.tar"
        p2 = f"{d2}/shard-{r['shard']:06d}.tar"
        assert open(p1, "rb").read() == open(p2, "rb").read()


def test_null_and_binary_payloads(spark, tmp_path):
    df = spark.createDataFrame(
        [("k1", None, b"\x00\xff\x10"), ("k2", "x", None)],
        "key string, text string, img binary")
    path = str(tmp_path / "n.tar")
    records2webdataset(df, path, "key", {"txt": "text", "bin": "img"})
    got = {r["key"]: r["data"]
           for r in read_webdataset(spark, path).collect()}
    assert got["k1"]["txt"] == b"" and got["k1"]["bin"] == b"\x00\xff\x10"
    assert got["k2"]["txt"] == b"x" and got["k2"]["bin"] == b""


def test_empty_frame(spark, tmp_path):
    df = spark.createDataFrame([], "key string, text string")
    path = str(tmp_path / "e.tar")
    records2webdataset(df, path, "key", {"txt": "text"})
    assert read_webdataset(spark, path).count() == 0


def test_corrupt_shard_skip_vs_raise(spark, samples, tmp_path):
    good = str(tmp_path / "good.tar")
    records2webdataset(samples, good, "key", {"txt": "text"})
    blob = open(good, "rb").read()
    # damaged shard: header block garbled mid-archive — tarfile's
    # documented leniency treats this as end-of-archive, so the
    # readable PREFIX comes back in either mode (manifests catch the
    # shortfall)
    bad = str(tmp_path / "bad.tar")
    cut = (len(blob) // 2) // 1024 * 1024   # header blocks sit at
    open(bad, "wb").write(blob[:cut] + b"\xff" * 512   # even 512s
                          + blob[cut + 512:])
    # a file that is NOT a tar at all is what actually raises
    rogue = str(tmp_path / "rogue.tar")
    open(rogue, "wb").write(b"\xff" * 4096)
    glob = str(tmp_path / "*.tar")
    with pytest.raises(Exception):
        read_webdataset(spark, glob).collect()        # default: loud
    got = read_webdataset(spark, glob, on_error="skip").collect()
    per_file = {}
    for r in got:
        name = r["file"].rsplit("/", 1)[-1]
        per_file[name] = per_file.get(name, 0) + 1
    assert per_file["good.tar"] == 40                 # intact shard
    assert 0 < per_file.get("bad.tar", 0) < 40        # prefix only
    assert "rogue.tar" not in per_file                # zero samples
    with pytest.raises(ValueError):
        read_webdataset(spark, glob, on_error="quarantine")


def test_dotted_keys_rejected_at_write(spark, tmp_path):
    # 'img.v2' would round-trip as key 'img' with ext 'v2.txt' —
    # the sink refuses instead of corrupting silently
    df = spark.createDataFrame([("img.v2", "x")], "key string, t string")
    with pytest.raises(ValueError):
        records2webdataset(df, str(tmp_path / "k.tar"), "key",
                           {"txt": "t"})
    df2 = spark.createDataFrame([("a/b", "x")], "key string, t string")
    with pytest.raises(ValueError):
        records2webdataset(df2, str(tmp_path / "k2.tar"), "key",
                           {"txt": "t"})
