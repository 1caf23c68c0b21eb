"""Cross-implementation WebP parity against the system libwebp
(Google's reference implementation, loaded via ctypes — zero lineage
shared with meza_spark/llm/webp.py), in BOTH directions:

- libwebp's real lossless encoder (which emits LZ77 backward
  references, the color cache, meta-Huffman groups, and the
  predictor/color/subtract-green/palette transforms chosen by its
  cruncher) → our decoder must be BIT-EXACT;
- our encoder (every transform variant) → libwebp's decoder must
  recover the source pixels bit-exact;
- header parity (WebPGetInfo vs webp_headers) on generated streams
  AND the vendored real VP8X/lossy file.

This is the same self-reference-killing pattern as the JDK imageio
suite: a fixture encoder and its decoder can mutually misread a spec
and pass every roundtrip; an independent implementation cannot.
Skips with a reason when libwebp.so is absent.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from meza_spark.llm.webp import (
    decode_webp, encode_webp_lossless, webp_headers,
)

EXT = "tests/fixtures/external"


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so",
                 ctypes.util.find_library("webp") or ""):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        return lib
    return None


_LIB = _load_libwebp()
pytestmark = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available")


def _lw_encode(rgba: np.ndarray) -> bytes:
    h, w, _ = rgba.shape
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(rgba).tobytes(), w, h, w * 4,
        ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    buf = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return buf


def _lw_decode(b: bytes) -> np.ndarray:
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(b, len(b), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    _LIB.WebPFree(p)
    return arr


def _images():
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:120, 0:150]
    photo = np.stack([
        (128 + 90 * np.sin(xx / 13.0) * np.cos(yy / 17.0)),
        xx * 255 / 150.0, yy * 255 / 120.0,
        np.full_like(xx, 255)], axis=2).astype(np.uint8)
    photo[30:70, 20:90] = rng.randint(0, 256, (40, 70, 4), np.int64) \
        .astype(np.uint8)                # noise region → group diversity
    tiled = np.tile(rng.randint(0, 256, (8, 13, 4), dtype=np.uint8),
                    (14, 10, 1))         # heavy LZ77, long distances
    pal = rng.randint(0, 256, (9, 4)).astype(np.uint8)[
        rng.randint(0, 9, (37, 41))]
    grad = (np.arange(40 * 50 * 4, dtype=np.uint32)
            .reshape(40, 50, 4) % 251).astype(np.uint8)
    out = {"photo": photo, "tiled": tiled, "palette9": pal,
           "gradient": grad,
           "noise": rng.randint(0, 256, (24, 31, 4), dtype=np.uint8),
           "flat": np.full((16, 16, 4), 200, np.uint8)}
    for v in out.values():
        v[..., 3] = 255                  # opaque → comparable to RGB out
    return out


@pytest.mark.parametrize("name", sorted(_images()))
def test_libwebp_encodes_we_decode_bit_exact(name):
    px = _images()[name]
    enc = _lw_encode(px)
    ref = _lw_decode(enc)
    mine = decode_webp(enc)
    if mine.shape[2] == 3:               # opaque stream → we emit RGB
        ref = ref[..., :3]
    assert mine.shape == ref.shape
    assert (mine == ref).all(), f"pixel divergence on {name}"


def test_libwebp_alpha_stream_bit_exact():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (20, 22, 4), dtype=np.uint8)
    enc = _lw_encode(px)
    mine = decode_webp(enc)
    assert mine.shape[2] == 4
    assert (mine == _lw_decode(enc)).all()


@pytest.mark.parametrize("nc", [2, 3, 4, 5, 16, 17, 200])
def test_libwebp_palette_widths_bit_exact(nc):
    rng = np.random.RandomState(nc)
    colors = rng.randint(0, 256, (nc, 4)).astype(np.uint8)
    colors[:, 3] = 255
    px = colors[rng.randint(0, nc, (37, 41))]
    enc = _lw_encode(px)
    mine = decode_webp(enc)
    ref = _lw_decode(enc)
    if mine.shape[2] == 3:
        ref = ref[..., :3]
    assert (mine == ref).all()


@pytest.mark.parametrize("transform", [None, "subtract_green",
                                       "predictor", "color", "palette"])
def test_our_encoder_decodes_under_libwebp(transform):
    rng = np.random.RandomState(11)
    if transform == "palette":
        colors = rng.randint(0, 256, (6, 4)).astype(np.uint8)
        px = colors[rng.randint(0, 6, (19, 23))]
    else:
        px = rng.randint(0, 256, (19, 23, 4), dtype=np.uint8)
    enc = encode_webp_lossless(px, transform=transform)
    assert (_lw_decode(enc) == px).all()


@pytest.mark.parametrize("shape", [(1, 1), (1, 19), (23, 1)])
def test_edge_dims_both_directions(shape):
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, shape + (4,), dtype=np.uint8)
    enc_theirs = _lw_encode(px)
    assert (decode_webp(enc_theirs) == _lw_decode(enc_theirs)).all()
    enc_ours = encode_webp_lossless(px)
    assert (_lw_decode(enc_ours) == px).all()


def test_header_parity_generated_and_real():
    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, (33, 57, 4), dtype=np.uint8)
    for b in (_lw_encode(px), encode_webp_lossless(px),
              open(f"{EXT}/webp_vp8x_lossy_python.webp", "rb").read()):
        w, h = ctypes.c_int(), ctypes.c_int()
        assert _LIB.WebPGetInfo(b, len(b), ctypes.byref(w),
                                ctypes.byref(h)) == 1
        hd = webp_headers(b)
        assert (hd["width"], hd["height"]) == (w.value, h.value)
