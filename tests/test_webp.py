"""WebP container + VP8L codec units: encoder→decoder roundtrips over
every transform and channel count, header parsing (incl. the vendored
REAL VP8X/lossy file from CPython's test suite), sniff lockstep,
honest gates (lossy VP8, animation), budget enforcement, and hostile
payloads. Cross-implementation parity against the system libwebp
lives in tests/test_webp_crossimpl_parity.py.
"""

import struct

import numpy as np
import pytest

from meza_spark.llm import multimodal as mm
from meza_spark.llm.webp import (
    _Br, _Bw, _canonical, decode_vp8l, decode_webp, encode_webp_lossless,
    webp_headers,
)

EXT = "tests/fixtures/external"


def _px(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, c)).astype(np.uint8)


# ------------------------------------------------------------ roundtrips

@pytest.mark.parametrize("c", [1, 3, 4])
@pytest.mark.parametrize("transform", [None, "subtract_green",
                                       "predictor", "color", "palette"])
def test_roundtrip_all_transforms(c, transform):
    px = _px(13, 17, c, seed=c)
    if transform == "palette":
        px = (px // 43) * 43                 # bounded distinct colors
    b = encode_webp_lossless(px, transform=transform)
    out = decode_webp(b)
    want = np.repeat(px, 3, axis=2) if c == 1 else px
    assert out.shape == want.shape
    assert (out == want).all()


@pytest.mark.parametrize("shape", [(1, 1), (1, 31), (29, 1), (64, 3)])
def test_roundtrip_edge_dims(shape):
    px = _px(*shape, 3, seed=9)
    assert (decode_webp(encode_webp_lossless(px)) == px).all()


@pytest.mark.parametrize("nc", [2, 3, 4, 5, 16, 17, 200])
def test_palette_packing_widths(nc):
    """Palette sizes crossing every packed sub-pixel width (8/4/2/1
    pixels per green byte)."""
    rng = np.random.RandomState(nc)
    colors = rng.randint(0, 256, (nc, 3)).astype(np.uint8)
    px = colors[rng.randint(0, nc, (23, 37))]
    b = encode_webp_lossless(px, transform="palette")
    assert (decode_webp(b) == px).all()


def test_decode_pixels_dispatches_webp():
    px = _px(8, 11, 3, seed=3)
    assert (mm.decode_pixels(encode_webp_lossless(px)) == px).all()


# ------------------------------------------------------------ headers/sniff

def test_sniff_lockstep():
    b = encode_webp_lossless(_px(5, 7, 3))
    assert mm._sniff_format(b) == "webp"


def test_parse_headers_vp8l():
    b = encode_webp_lossless(_px(21, 34, 4, seed=1))
    hd = mm._parse_headers(b)
    assert hd["format"] == "webp"
    assert (hd["width"], hd["height"], hd["channels"]) == (34, 21, 4)


def test_parse_headers_real_vp8x_file():
    """The vendored CPython python.webp: VP8X canvas dims must match
    what libwebp reports for the same file (16x16, alpha)."""
    b = open(f"{EXT}/webp_vp8x_lossy_python.webp", "rb").read()
    assert mm._sniff_format(b) == "webp"
    hd = mm._parse_headers(b)
    assert (hd["format"], hd["width"], hd["height"]) == ("webp", 16, 16)
    assert hd["channels"] == 4               # VP8X alpha flag set


def test_lossy_vp8_header_branch():
    """A minimal VP8 key-frame header: dims parse without decode."""
    tag = bytes([0x00, 0x00, 0x00])          # frame tag (keyframe)
    body = tag + b"\x9d\x01\x2a" + struct.pack("<HH", 77, 55)
    riff = b"WEBPVP8 " + struct.pack("<I", len(body)) + body
    b = b"RIFF" + struct.pack("<I", len(riff)) + riff
    hd = webp_headers(b)
    assert (hd["width"], hd["height"]) == (77, 55)


# ------------------------------------------------------------ honest gates

def test_lossy_vp8_decode_is_gated():
    b = open(f"{EXT}/webp_vp8x_lossy_python.webp", "rb").read()
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        decode_webp(b)


def test_animation_is_gated():
    body = b"\x00" * 6
    riff = b"WEBPANIM" + struct.pack("<I", len(body)) + body
    b = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(NotImplementedError, match="animated"):
        decode_webp(b)


# ------------------------------------------------------------ hostile bytes

def test_budget_rejects_huge_dims_before_alloc():
    """A 5-byte header declaring 16384x16384 = 268M pixels must trip
    the shared pixel budget, not allocate."""
    bw = _Bw()
    bw.bits(0x2F, 8)
    bw.bits(16383, 14)
    bw.bits(16383, 14)
    bw.bits(0, 1)
    bw.bits(0, 3)
    payload = bw.done()
    with pytest.raises(ValueError, match="budget"):
        decode_vp8l(payload)


def test_truncation_always_raises_value_error():
    b = encode_webp_lossless(_px(9, 13, 3, seed=5))
    for cut in (4, 11, 13, 20, len(b) - 3):
        with pytest.raises(ValueError):
            decode_webp(b[:cut])


def test_bad_magic_and_empty():
    with pytest.raises(ValueError):
        decode_webp(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_webp(b"")
    with pytest.raises(ValueError):
        decode_vp8l(b"\x30\x00\x00\x00\x00")     # wrong signature byte


def test_incomplete_prefix_code_rejected():
    # two symbols can't both have length 2 alone (Kraft sum 1/2)
    with pytest.raises(ValueError, match="incomplete"):
        _canonical([2, 2] + [0] * 10)
    with pytest.raises(ValueError, match="no symbols"):
        _canonical([0] * 8)


def test_backward_reference_oob_rejected():
    """Handcraft a stream whose FIRST symbol is an LZ77 length code —
    the copy has nothing behind it and must raise, not wrap."""
    from meza_spark.llm.webp import _CL_ORDER, _emit_simple1
    bw = _Bw()
    bw.bits(0x2F, 8)
    bw.bits(3, 14)                       # 4x4
    bw.bits(3, 14)
    bw.bits(0, 1)
    bw.bits(0, 3)
    bw.bits(0, 1)                        # no transforms
    bw.bits(0, 1)                        # no color cache
    bw.bits(0, 1)                        # no meta codes
    # green: normal code with lengths {0: 1, 256: 1} — complete
    # (Kraft = 1), and symbol 256 is the first LZ77 length code.
    # Code-length code: lengths {1: 1, 18: 1} (also complete).
    bw.bits(0, 1)                        # normal code
    bw.bits(4 - 4, 4)                    # 4 CL lengths: 17,18,0,1
    for sym in _CL_ORDER[:4]:
        bw.bits({18: 1, 1: 1}.get(sym, 0), 3)
    bw.bits(1, 1)                        # explicit max_symbol:
    bw.bits(0, 3)                        # nbits = 2
    bw.bits(2, 2)                        # 2 + 2 = 4 CL reads below
    # CL canonical: sym 1 -> '0', sym 18 -> '1'
    bw.code(0, 1)                        # lengths[0] = 1
    bw.code(1, 1)                        # 18: zero-run 11+bits(7)
    bw.bits(138 - 11, 7)                 # zeros for syms 1..138
    bw.code(1, 1)
    bw.bits(117 - 11, 7)                 # zeros for syms 139..255
    bw.code(0, 1)                        # lengths[256] = 1
    for _ in range(3):                   # red / blue / alpha: const 0
        _emit_simple1(bw, 0)
    _emit_simple1(bw, 0)                 # distance: const prefix 0
    # first pixel: green '1' -> sym 256 -> copy length 1, distance
    # prefix 0 -> plane code 1 -> dist = xsize = 4 > i = 0 -> OOB
    bw.code(1, 1)
    with pytest.raises(ValueError, match="backward reference"):
        decode_vp8l(bw.done() + b"\x00" * 8)


def test_bit_reader_truncation():
    br = _Br(b"\xff")
    assert br.read(8) == 0xFF
    with pytest.raises(ValueError, match="truncated"):
        br.read(1)


# ------------------------------------------------------------ animation

def test_anim_roundtrip_and_compositing():
    """Replace → binary-alpha over-blend → dispose → replace: every
    compositing branch of the ANMF walk, checked against hand
    integer algebra (the same structure the driver gate twins)."""
    rng = np.random.RandomState(5)
    from meza_spark.llm.webp import decode_webp_frames, encode_webp_anim
    f1 = rng.randint(0, 256, (10, 14, 4)).astype(np.uint8)
    f2 = rng.randint(0, 256, (6, 8, 4)).astype(np.uint8)
    f3 = rng.randint(0, 256, (10, 14, 3)).astype(np.uint8)
    b = encode_webp_anim([f1, f2, f3], delays_ms=[20, 30, 40],
                         disposals=[False, True, False],
                         blends=[False, True, False],
                         offsets=[(0, 0), (4, 2), (0, 0)])
    frames, ts = decode_webp_frames(b)
    assert ts == [0, 20, 50]                 # cumulative START times
    assert (frames[0] == f1).all()           # replace
    base = f1[2:8, 4:12].astype(np.float64)  # over-blend, straight alpha
    fa = f2[:, :, 3:4] / 255.0
    ba = base[:, :, 3:4] / 255.0
    oa = fa + ba * (1 - fa)
    safe = np.where(oa == 0, 1.0, oa)
    exp = frames[0].copy()
    exp[2:8, 4:12, :3] = np.clip(np.round(
        (f2[:, :, :3] * fa + base[:, :, :3] * ba * (1 - fa)) / safe),
        0, 255).astype(np.uint8)
    exp[2:8, 4:12, 3] = np.clip(np.round(oa[:, :, 0] * 255),
                                0, 255).astype(np.uint8)
    assert (frames[1] == exp).all()
    # frame 2's rect disposed (cleared) before frame 3's full replace
    exp3 = np.dstack([f3, np.full((10, 14), 255, np.uint8)])
    assert (frames[2] == exp3).all()


def test_anim_dispatch_and_still_gate():
    from meza_spark.llm.webp import encode_webp_anim
    b = encode_webp_anim([_px(4, 6, 3, seed=1), _px(4, 6, 3, seed=2)])
    frames, ts = mm._video_frames_bytes(b)
    assert len(frames) == 2 and ts == [0, 40]
    with pytest.raises(NotImplementedError, match="video container"):
        decode_webp(b)                       # stills API refuses anims
    hd = mm._parse_headers(b)                # VP8X canvas dims
    assert (hd["width"], hd["height"]) == (6, 4)


def test_anim_hostile():
    from meza_spark.llm.webp import decode_webp_frames, encode_webp_anim
    b = encode_webp_anim([_px(4, 6, 3)])
    for cut in (16, 30, len(b) - 5):
        with pytest.raises(ValueError):
            decode_webp_frames(b[:cut])
    with pytest.raises(ValueError, match="not an animated"):
        decode_webp_frames(encode_webp_lossless(_px(3, 3, 3)))
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim([_px(2, 2, 3)], offsets=[(1, 0)])
    # frame rectangle outside the declared canvas
    with pytest.raises(ValueError, match="exceeds the canvas"):
        decode_webp_frames(encode_webp_anim(
            [_px(4, 6, 3)], offsets=[(4, 0)], canvas=(6, 4)))


def test_anim_total_pixel_budget():
    """Many frames × canvas must trip the cumulative budget before
    the snapshot list allocates."""
    from meza_spark.llm.webp import encode_webp_anim
    frames = [np.zeros((2, 2, 3), np.uint8)] * 3
    b = bytearray(encode_webp_anim(frames, canvas=(2, 2)))
    # inflate the declared canvas to 8000x8000 in VP8X (bytes follow
    # 'VP8X' + size(4) + flags(4): canvas w-1 / h-1 as 3-byte LE)
    i = b.index(b"VP8X") + 8 + 4
    b[i:i + 3] = (7999).to_bytes(3, "little")
    b[i + 3:i + 6] = (7999).to_bytes(3, "little")
    with pytest.raises(ValueError, match="budget|exceeds the canvas"):
        from meza_spark.llm.webp import decode_webp_frames
        decode_webp_frames(bytes(b))


# ------------------------------------------------------------ meta fields

def test_attach_media_meta_webp(spark):
    b = encode_webp_lossless(_px(6, 8, 3))
    df = spark.createDataFrame([(1, bytearray(b))], "id long, payload binary")
    row = mm.attach_media_meta(df).collect()[0]
    assert row["format"] == "webp"
    assert row["n_bytes"] == len(b)
