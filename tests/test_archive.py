"""Archive payload expansion (io/archive.py)."""

import gzip
import io
import tarfile
import zipfile

import pytest

from meza_spark.io.archive import (MAX_ARCHIVE_BYTES, encode_gz,
                                   encode_tar, encode_zip,
                                   expand_archive, expand_archive_bytes)

MEMBERS = [("a.txt", b"alpha body"), ("dir/b.txt", b"beta body")]


@pytest.mark.parametrize("build,kind", [
    (lambda: encode_zip(MEMBERS), "zip"),
    (lambda: encode_tar(MEMBERS), "tar"),
    (lambda: encode_tar(MEMBERS, gz=True), "tgz"),
])
def test_roundtrip_multi_member(build, kind):
    r = expand_archive_bytes(build())
    assert r["kind"] == kind
    assert r["members"] == MEMBERS


def test_gz_single_member_fname():
    r = expand_archive_bytes(encode_gz("orig.txt", b"payload"))
    assert r == {"kind": "gz", "members": [("orig.txt", b"payload")]}


def test_gz_without_fname_gets_default_name():
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(b"data")
    r = expand_archive_bytes(buf.getvalue())
    assert r["members"] == [("member", b"data")]


def test_encoders_are_deterministic():
    assert encode_zip(MEMBERS) == encode_zip(MEMBERS)
    assert encode_tar(MEMBERS) == encode_tar(MEMBERS)
    assert encode_tar(MEMBERS, gz=True) == encode_tar(MEMBERS, gz=True)
    assert encode_gz("n", b"d") == encode_gz("n", b"d")


def test_zip_directories_skipped():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("dir/", (1980, 1, 1, 0, 0, 0)), b"")
        z.writestr(zipfile.ZipInfo("dir/f", (1980, 1, 1, 0, 0, 0)), b"x")
    r = expand_archive_bytes(buf.getvalue())
    assert r["members"] == [("dir/f", b"x")]


@pytest.mark.parametrize("evil", ["/abs/path", "../up", "a/../../b"])
def test_traversal_paths_rejected(evil):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:",
                      format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo(evil)
        ti.size = 1
        tf.addfile(ti, io.BytesIO(b"x"))
    with pytest.raises(ValueError, match="unsafe member path"):
        expand_archive_bytes(buf.getvalue())


def test_inner_dotdot_segment_is_fine():
    # '..' as a SUBSTRING of a segment must not be rejected
    r = expand_archive_bytes(encode_tar([("a..b/c.txt", b"x")]))
    assert r["members"] == [("a..b/c.txt", b"x")]


def test_tar_member_count_bomb():
    many = [("f%d" % i, b"") for i in range(10_001)]
    with pytest.raises(ValueError, match="member count"):
        expand_archive_bytes(encode_tar(many))


def test_hostile_inputs():
    with pytest.raises(ValueError, match="empty"):
        expand_archive_bytes(b"")
    with pytest.raises(ValueError, match="byte budget"):
        expand_archive_bytes(b"PK\x03\x04" + b"\x00" * (MAX_ARCHIVE_BYTES))
    with pytest.raises(ValueError, match="bad zip"):
        expand_archive_bytes(b"PK\x03\x04junk")
    with pytest.raises(ValueError, match="bad gzip"):
        expand_archive_bytes(b"\x1f\x8b\x08\x00trunc")
    with pytest.raises(ValueError, match="unrecognized"):
        expand_archive_bytes(b"just plain bytes here")


def test_truncation_fuzz_never_crashes():
    whole = encode_tar(MEMBERS, gz=True)
    for cut in range(0, len(whole), 37):
        try:
            expand_archive_bytes(whole[:cut])
        except ValueError:
            pass


def test_mutation_fuzz_never_crashes():
    whole = bytearray(encode_zip(MEMBERS))
    for pos in range(0, len(whole), 11):
        mutated = bytearray(whole)
        mutated[pos] ^= 0xFF
        try:
            expand_archive_bytes(bytes(mutated))
        except ValueError:
            pass


# ---------------------------------------------------------- spark layer

def test_expand_archive_operator(spark):
    rows = [(1, bytearray(encode_zip(MEMBERS))),
            (2, bytearray(b"not an archive")),
            (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = expand_archive(df).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [(r["member_idx"], r["member_name"], bytes(r["member_bytes"]))
            for r in sorted(by_id[1], key=lambda r: r["member_idx"])] == [
        (0, "a.txt", b"alpha body"), (1, "dir/b.txt", b"beta body")]
    assert by_id[2][0]["error"] is not None
    assert 3 not in by_id


def test_expand_archive_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "media_id long, payload binary")
    plan = expand_archive(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
