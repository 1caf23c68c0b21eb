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
