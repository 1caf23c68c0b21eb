"""Multimodal plumbing tests: schema, batch shape, determinism of the
stubbed codecs (decode/features/resize/frame-sample over mapInPandas)."""

import pytest
from pyspark.sql import functions as F

from meza_spark.llm.multimodal import (attach_media_meta, decode_image,
                                       frame_sample, image_features,
                                       resize_image)


@pytest.fixture()
def media(spark):
    return spark.range(6).select(
        F.col("id").alias("media_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")),
                 "utf-8").alias("payload"))


def test_attach_media_meta_jvm_side(spark, media):
    out = attach_media_meta(media)
    rows = out.collect()
    assert {r["format"] for r in rows} == {"unknown"}
    assert all(r["n_bytes"] == len(r["payload"]) for r in rows)
    # sha over binary is JVM-side: no Python appears in the plan
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple")
    assert "Python" not in plan


def test_decode_image_deterministic(spark, media):
    a = {r["media_id"]: r["crc"] for r in decode_image(media).collect()}
    b = {r["media_id"]: r["crc"] for r in decode_image(media).collect()}
    assert a == b and len(a) == 6


def test_image_features_fixed_width(spark, media):
    rows = image_features(media, resize_to=16).collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])


def test_resize_image_schema_and_size(spark, media):
    rows = resize_image(media, 32, 24).collect()
    assert len(rows) == 6
    assert all((r["width"], r["height"]) == (32, 24) for r in rows)
    sizes = {len(r["payload"]) for r in rows}
    assert len(sizes) == 1  # nominal resized size is uniform


def test_frame_sample_one_row_per_frame(spark, media):
    out = frame_sample(media, every_ms=1000)
    rows = out.collect()
    assert len(rows) == 6 * 5
    per = [r for r in rows if r["media_id"] == 0]
    assert sorted(r["frame_idx"] for r in per) == [0, 1, 2, 3, 4]
    assert sorted(r["ts_ms"] for r in per) == [0, 1000, 2000, 3000, 4000]


def _mini_png(w, h):
    import struct
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))


def _mini_gif(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def _mini_jpeg(w, h):
    import struct
    # SOI + APP0 stub + SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 2)
    return b"\xff\xd8" + app0 + sof0


def _real_wav(rate=8000, seconds=2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(b"\x00\x00" * rate * seconds)
    return buf.getvalue()


def test_parse_headers_pure():
    from meza_spark.llm.multimodal import _parse_headers

    assert _parse_headers(_mini_png(640, 480)) == {
        "format": "png", "width": 640, "height": 480, "channels": None,
        "sample_rate": None, "duration_ms": None}
    assert _parse_headers(_mini_gif(12, 34))["width"] == 12
    j = _parse_headers(_mini_jpeg(1920, 1080))
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 1920, 1080)
    wv = _parse_headers(_real_wav(8000, 2))
    assert wv["format"] == "wav" and wv["sample_rate"] == 8000
    assert wv["channels"] == 1 and wv["duration_ms"] == 2000
    assert _parse_headers(b"garbage bytes here")["format"] == "unknown"


def test_parse_media_headers_df(spark):
    from meza_spark.llm.multimodal import parse_media_headers

    rows = [(1, _mini_png(64, 32)), (2, _real_wav(16000, 1)),
            (3, _mini_gif(5, 6)), (4, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in parse_media_headers(df).collect()}
    assert set(out) == {1, 2, 3}  # null payload skipped
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) \
        == ("png", 64, 32)
    assert (out[2]["sample_rate"], out[2]["duration_ms"]) == (16000, 1000)
    assert (out[3]["width"], out[3]["height"]) == (5, 6)
