"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio libraries are not in
this container — see ``decode_image``); everything Spark-side is real:
schemas, batch iteration, partition sizing, and the UDF signatures. On
a cluster you swap ``_decode_image_stub`` for a Pillow/libvips call and
nothing else changes.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 64) for
multi-MB blobs so a batch fits in worker memory. Feature extraction is
mapInPandas (1 pass, no shuffle); only the optional group-bys shuffle
fixed-width features, never the blobs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

__all__ = ["media_schema", "attach_media_meta", "decode_image", "resize_image",
           "image_features", "frame_sample", "parse_media_headers"]

# canonical media metadata struct carried alongside the binary payload
MEDIA_META_FIELDS = [
    StructField("media_type", StringType()),    # image|audio|video
    StructField("format", StringType()),        # png|jpeg|wav|mp4|...
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", LongType()),
]


def media_schema(payload_col: str = "payload") -> StructType:
    """Canonical multimodal row schema: id + binary payload + metadata."""
    return StructType([
        StructField("media_id", LongType()),
        StructField(payload_col, BinaryType()),
        StructField("meta", StructType(MEDIA_META_FIELDS)),
    ])


def _sniff_format(b: bytes) -> str:
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff container format + size from magic bytes — pure JVM-side
    expressions over the binary column (substring/length work on
    binary), no decode."""
    p = F.col(payload_col)
    fmt = (F.when(F.hex(F.substring(p, 1, 4)) == "89504E47", "png")
            .when(F.hex(F.substring(p, 1, 3)) == "FFD8FF", "jpeg")
            .when(F.substring(p, 1, 4).cast("string") == "RIFF", "wav")
            .when(F.substring(p, 5, 4).cast("string") == "ftyp", "mp4")
            .otherwise("unknown"))
    return df.withColumn("format", fmt) \
             .withColumn("n_bytes", F.length(p)) \
             .withColumn("payload_sha", F.sha2(p, 256))


def _decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decode. A real deployment replaces this with
    Pillow/libvips; the surrounding Spark plumbing is identical.

    Produces stable pseudo-pixel statistics derived from the payload
    bytes so tests can assert exact values.
    """
    if payload is None:
        raise NotImplementedError("real image decode requires Pillow; "
                                  "null payload has nothing to fake")
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    mean_px = sum(payload[:256]) / max(1, min(len(payload), 256))
    return {"width": width, "height": height, "mean_pixel": mean_px,
            "crc": zlib.crc32(payload)}


def decode_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id") -> DataFrame:
    """Decode images → per-image features via Arrow-batched mapInPandas.

    STUB decode (see module docstring); Spark plumbing (schema, batch
    shape, null handling) is real and tested.
    """
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_pixel", DoubleType()),
        StructField("crc", LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                d = _decode_image_stub(bytes(payload))
                rows.append((mid, d["width"], d["height"],
                             d["mean_pixel"], d["crc"]))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    from ..util import spread

    return spread(df.select(id_col, payload_col)) \
        .mapInPandas(run, schema=out_schema)


def image_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id", resize_to: int = 32) -> DataFrame:
    """Feature-extract + resize plumbing: emits a fixed-width float
    vector per image (stub: bytes of sha256 chain, normalized), the
    shape a CLIP-style embedder would produce."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("features", ArrayType(FloatType())),
    ])
    dim = resize_to

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                buf = b""
                h = bytes(payload)
                while len(buf) < dim:
                    h = hashlib.sha256(h).digest()
                    buf += h
                vec = [b / 255.0 for b in buf[:dim]]
                rows.append((mid, vec))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id", every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (stub timestamps; a real build calls pyav/ffmpeg per batch)."""
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                # stub: pretend 5 frames, sample every `every_ms`
                dur = 5000
                for i, ts in enumerate(range(0, dur, every_ms)):
                    tag = struct.pack("<qi", mid, i)
                    rows.append((mid, i, ts, hashlib.sha256(b + tag).digest()))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_image(df: DataFrame, width: int, height: int,
                 payload_col: str = "payload",
                 id_col: str = "media_id") -> DataFrame:
    """Resize plumbing: payload → resized payload + dims via
    ``mapInPandas`` (Arrow batches, executor-local, no shuffle).

    STUB decode/encode (no imaging libs in this container): emits a
    deterministic fake payload of the right nominal size
    (sha256-chained), with the real batch shape, schema, and
    partitioning — swap ``_fake_resize`` for PIL/libvips per batch in a
    real deployment.
    """
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ])
    nominal = max(16, (width * height) // 64)

    def _fake_resize(b: bytes) -> bytes:
        buf, h = b"", bytes(b) + struct.pack("<ii", width, height)
        while len(buf) < nominal:
            h = hashlib.sha256(h).digest()
            buf += h
        return buf[:nominal]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(mid, _fake_resize(payload), width, height)
                    for mid, payload in zip(pdf[id_col], pdf[payload_col])
                    if payload is not None]
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    from ..util import spread

    return spread(df.select(id_col, payload_col)) \
        .mapInPandas(run, schema=out_schema)


def _parse_headers(b: bytes) -> dict:
    """REAL (stdlib-only) container-header parse — no decode, no
    Pillow: PNG IHDR, JPEG SOF marker walk, GIF logical screen
    descriptor, BMP info header, WAV RIFF fmt/data chunks. Returns
    whatever the container declares; unknown formats → format only.

    This is the filter-stage metadata a pipeline needs (drop tiny
    images, cap durations) without touching pixel/sample data.
    """
    out = {"format": "unknown", "width": None, "height": None,
           "channels": None, "sample_rate": None, "duration_ms": None}
    if len(b) < 12:
        return out
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        out["format"] = "png"
        w, h = struct.unpack(">II", b[16:24])
        out["width"], out["height"] = int(w), int(h)
    elif b[:3] == b"\xff\xd8\xff":
        out["format"] = "jpeg"
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:  # fill/padding byte before a marker
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                out["width"], out["height"] = int(w), int(h)
                out["channels"] = b[i + 9] if i + 9 < len(b) else None
                break
            i += 2 + seglen
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        out["format"] = "gif"
        w, h = struct.unpack("<HH", b[6:10])
        out["width"], out["height"] = int(w), int(h)
    elif b[:2] == b"BM" and len(b) >= 26:
        out["format"] = "bmp"
        w, h = struct.unpack("<ii", b[18:26])
        out["width"], out["height"] = int(w), abs(int(h))
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        out["format"] = "wav"
        pos, byte_rate, data_sz = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
            if cid == b"fmt " and pos + 24 <= len(b):
                out["channels"] = struct.unpack(
                    "<H", b[pos + 10:pos + 12])[0]
                out["sample_rate"] = struct.unpack(
                    "<I", b[pos + 12:pos + 16])[0]
                byte_rate = struct.unpack("<I", b[pos + 16:pos + 20])[0]
            elif cid == b"data":
                data_sz = sz
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if byte_rate and data_sz is not None:
            out["duration_ms"] = int(data_sz * 1000 // byte_rate)
    elif b[4:8] == b"ftyp":
        out["format"] = "mp4"
    return out


def parse_media_headers(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "media_id") -> DataFrame:
    """Container-header metadata for every payload via Arrow-batched
    ``mapInPandas`` — the real (non-stub) sibling of ``decode_image``:
    width/height/channels for PNG/JPEG/GIF/BMP, sample rate/channels/
    duration for WAV, format sniff for MP4. One pass, no shuffle;
    only headers are touched, so throughput is I/O-bound on the blob
    column, not CPU-bound on decode."""
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
    ])
    names = [f.name for f in out_schema]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                d = _parse_headers(bytes(payload))
                rows.append((mid, d["format"], d["width"], d["height"],
                             d["channels"], d["sample_rate"],
                             d["duration_ms"]))
            yield pd.DataFrame(rows, columns=names)

    from ..util import spread

    return spread(df.select(id_col, payload_col)) \
        .mapInPandas(run, schema=out_schema)
