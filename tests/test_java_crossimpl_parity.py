"""Cross-implementation media parity: stdlib codecs vs the JDK.

Every decoder in meza_spark/llm/multimodal.py was, until this suite,
validated against fixtures produced by encoders in the same module
(plus real-file pins for MDB/XLS). This module removes that
self-reference for the whole image + audio tier by comparing against
``javax.imageio`` / ``javax.sound.sampled`` — codec implementations
with zero shared lineage — in BOTH directions:

* 18 vendored REAL files (libpng / giflib / libjpeg output collected
  from open-source doc trees — see tests/fixtures/external/
  PROVENANCE.md) are decoded by both stacks: PNG/GIF must be
  bit-exact, JPEG within the T.81 IDCT tolerance. This includes two
  REAL progressive (SOF2) JPEGs, closing the round-6 ADVICE item that
  the progressive decoder had only ever seen streams from this repo's
  own fixture encoder.
* The JDK ENCODES random images (PNG gray/RGB/RGBA, BMP, TIFF, GIF)
  → the stdlib decoders must reproduce the pixels bit-exactly.
* The stdlib ENCODERS' streams are decoded by the JDK → bit-exact,
  so _encode_png/_encode_bmp/_encode_tiff/_encode_gif are themselves
  externally validated (they matter: every golden pin in
  test_multimodal.py flows through them).
* JPEG same-stream parity: both stacks decode the SAME lossy stream
  (ours 4:4:4, ours 4:2:0, JDK 4:2:0) and must agree within a small
  bound — chroma upsampling is not pinned by T.81, so 4:2:0 streams
  get a looser bound than 4:4:4 ones.
* The JDK WRITES WAV/AIFF/AU PCM16 files from known samples → the
  stdlib audio readers must produce exact sample statistics (the JDK
  emits AIFF/AU big-endian and WAV little-endian, exercising both
  byte orders).

Java is a hard dependency of Spark itself, so ``java`` is always
present at runtime; ``javac`` (JDK vs JRE) is probed and the module
skips with a reason where absent.
"""
from __future__ import annotations

import glob
import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from meza_spark.llm import multimodal as mm

HERE = os.path.dirname(__file__)
FIXDIR = os.path.join(HERE, "fixtures", "external")
JAVA_SRC = os.path.join(HERE, "javatools")

_HAVE_JAVA = shutil.which("java") is not None and shutil.which("javac") is not None

pytestmark = pytest.mark.skipif(
    not _HAVE_JAVA, reason="JDK (java+javac) not on PATH")


# ---------------------------------------------------------------- harness

@pytest.fixture(scope="session")
def jtools(tmp_path_factory):
    """Compile the four Java oracle tools once per session."""
    out = tmp_path_factory.mktemp("jtools")
    srcs = sorted(glob.glob(os.path.join(JAVA_SRC, "*.java")))
    subprocess.run(["javac", "-d", str(out)] + srcs, check=True,
                   capture_output=True)
    return str(out)


def _jrun(jtools, cls, *args, stdin=None):
    res = subprocess.run(
        ["java", "-cp", jtools, "-Djava.awt.headless=true", cls, *args],
        input=stdin, capture_output=True)
    if res.returncode != 0:
        raise RuntimeError(f"{cls} failed: {res.stderr[:500]!r}")
    return res.stdout


def jdump(jtools, path):
    """Decode *path* with javax.imageio → (h, w, bands) uint8."""
    out = _jrun(jtools, "PixelDump", path)
    nl = out.index(b"\n")
    w, h, b = map(int, out[:nl].split())
    return np.frombuffer(out[nl + 1:], dtype=np.uint8).reshape(h, w, b)


def pix_make(jtools, arr, fmt, path):
    """Encode (h, w, c) uint8 *arr* with the JDK's *fmt* writer."""
    h, w, c = arr.shape
    _jrun(jtools, "PixelMake", fmt, path,
          stdin=f"{w} {h} {c}\n".encode() + arr.tobytes())


def _aligned(ours, theirs):
    """Channel-align the two decodes for comparison.

    The stdlib decoders keep the source's native channel count
    (gray→1, gray+alpha→2, palette→3); the JDK expands palette+tRNS
    to RGBA. Only the color channels both sides carry are compared —
    the palette RGB of a transparent entry is still an exact lookup
    on both sides, so nothing is lost by dropping the JDK's alpha.
    """
    oc, tc = ours.shape[2], theirs.shape[2]
    if ours.shape[:2] != theirs.shape[:2]:
        raise AssertionError(f"shape {ours.shape} vs {theirs.shape}")
    if oc == tc:
        return ours, theirs
    if oc == 3 and tc == 4:
        return ours, theirs[:, :, :3]
    if oc == 1 and tc == 3:
        return ours, theirs[:, :, :1]
    raise AssertionError(f"no channel rule for ours={oc} java={tc}")


def _maxdiff(ours, theirs):
    a, b = _aligned(ours, theirs)
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def _rng():
    return np.random.default_rng(0xC0DEC)


# ----------------------------------------------- real-file decode parity

REAL_LOSSLESS = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(FIXDIR, "*"))
    if p.endswith((".png", ".gif")))

REAL_JPEG = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(FIXDIR, "*.jpg")))


@pytest.mark.parametrize("name", REAL_LOSSLESS)
def test_real_lossless_parity(jtools, name):
    """Real libpng/giflib output: stdlib decode == JDK decode, bit
    for bit. Covers gray8, gray+alpha, palette 1/2/4/8-bit (with and
    without tRNS), RGB8, RGBA8, RGBA16, Adam7 interlace, GIF87a,
    GIF89a, and GIF row-interlace."""
    path = os.path.join(FIXDIR, name)
    ours = mm.decode_pixels(open(path, "rb").read())
    theirs = jdump(jtools, path)
    assert _maxdiff(ours, theirs) == 0


@pytest.mark.parametrize("name", REAL_JPEG)
def test_real_jpeg_parity(jtools, name):
    """Real libjpeg output — including two progressive (SOF2) scans —
    decoded by both stacks. T.81 leaves IDCT precision loose, so ±4
    with a tiny mean bound (measured: max 2, mean ≤ 0.09)."""
    path = os.path.join(FIXDIR, name)
    ours = mm.decode_pixels(open(path, "rb").read())
    theirs = jdump(jtools, path)
    a, b = _aligned(ours, theirs)
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 4
    assert d.mean() <= 0.2


def test_real_progressive_fixture_is_sof2():
    """Guard the fixture property the suite's claim rests on: the two
    stripe JPEGs really carry a progressive (SOF2) frame header."""
    for name in ("jpeg_sof2_thinstripe.jpg", "jpeg_sof2_fullstripe.jpg"):
        d = open(os.path.join(FIXDIR, name), "rb").read()
        i = 2
        sof = None
        while i < len(d) - 4:
            if d[i] != 0xFF:
                i += 1
                continue
            m = d[i + 1]
            if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                sof = m
                break
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            i += 2 + struct.unpack(">H", d[i + 2:i + 4])[0]
        assert sof == 0xC2, name


# ------------------------------------- JDK-encoded → stdlib decoders

def _java_encode_cases():
    rng = _rng()
    rgb = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (21, 33, 1), dtype=np.uint8)
    rgba = rng.integers(0, 256, (17, 19, 4), dtype=np.uint8)
    few = (rng.integers(0, 4, (25, 31, 3)) * 80).astype(np.uint8)
    return [("png", rgb), ("png", gray), ("png", rgba),
            ("bmp", rgb), ("tiff", rgb), ("tiff", gray), ("gif", few)]


@pytest.mark.parametrize("fmt,arr", _java_encode_cases(),
                         ids=lambda v: v if isinstance(v, str)
                         else f"c{v.shape[2]}")
def test_java_encoded_stream_decodes_bit_exact(jtools, tmp_path, fmt, arr):
    """Streams produced entirely outside this repository (the JDK's
    PNG/BMP/TIFF/GIF writers, which pick their own filter strategies,
    strip layouts and palette orders) must decode to the original
    pixels bit-exactly."""
    path = str(tmp_path / f"jenc.{fmt}")
    pix_make(jtools, arr, fmt, path)
    ours = mm.decode_pixels(open(path, "rb").read())
    assert ours.shape == arr.shape
    assert int(np.abs(ours.astype(int) - arr.astype(int)).max()) == 0


def _our_encoder_cases():
    rng = _rng()
    rgb = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (21, 33, 1), dtype=np.uint8)
    rgba = rng.integers(0, 256, (17, 19, 4), dtype=np.uint8)
    few = (rng.integers(0, 4, (25, 31, 3)) * 80).astype(np.uint8)
    return [("png_rgb", mm._encode_png, rgb),
            ("png_gray", mm._encode_png, gray),
            ("png_rgba", mm._encode_png, rgba),
            ("bmp", mm._encode_bmp, rgb),
            # OS/2 BITMAPCOREHEADER (r8, last DIB-matrix gate): the
            # JDK's BMPImageReader handles VERSION_2 core headers, so
            # it independently validates the 12-byte-header writer
            ("bmp_os2", lambda px: mm._encode_bmp(px, os2=True), rgb),
            ("tiff", mm._encode_tiff, rgb),
            ("gif", mm._encode_gif, few)]


@pytest.mark.parametrize("name,enc,arr", _our_encoder_cases(),
                         ids=lambda v: v if isinstance(v, str) else "")
def test_our_encoders_decode_bit_exact_in_java(jtools, tmp_path, name,
                                               enc, arr):
    """The fixture encoders every golden pin in test_multimodal.py
    flows through are themselves externally validated: the JDK must
    read their streams back to the exact pixels."""
    path = str(tmp_path / name)
    with open(path, "wb") as fh:
        fh.write(enc(arr))
    theirs = jdump(jtools, path)
    a, b = _aligned(arr, theirs)   # JDK may expand palette GIF to RGBA
    assert int(np.abs(a.astype(int) - b.astype(int)).max()) == 0


@pytest.mark.parametrize("ctype", ["LZW", "PackBits", "Deflate", "ZLib"])
def test_java_tiff_compressions_decode_bit_exact(jtools, tmp_path, ctype):
    """The JDK's TIFF writer at each compression it offers (its LZW
    code-stream choices, PackBits run splits, and zlib strips are all
    its own) → the stdlib TIFF decoder reproduces the pixels
    bit-exactly ('Deflate'/'ZLib' both land on Compression 8/32946,
    new this round)."""
    rng = _rng()
    arr = rng.integers(0, 256, (23, 37, 3), dtype=np.uint8)
    path = str(tmp_path / f"c.{ctype}.tiff")
    pix_make_c(jtools, arr, "tiff", path, ctype)
    ours = mm.decode_pixels(open(path, "rb").read())
    assert ours.shape == arr.shape
    assert int(np.abs(ours.astype(int) - arr.astype(int)).max()) == 0


def pix_make_c(jtools, arr, fmt, path, ctype, tiles=None):
    h, w, c = arr.shape
    extra = [str(tiles[0]), str(tiles[1])] if tiles else []
    _jrun(jtools, "PixelMake", fmt, path, ctype, *extra,
          stdin=f"{w} {h} {c}\n".encode() + arr.tobytes())


@pytest.mark.parametrize("ctype,tiles", [
    ("None", (32, 16)), ("LZW", (16, 16)), ("Deflate", (32, 32)),
    ("PackBits", (16, 32)),
])
def test_java_tiled_tiff_decodes_bit_exact(jtools, tmp_path, ctype,
                                           tiles):
    """r8: TILE-organized TIFFs (TIFF 6.0 §15 — the common GeoTIFF
    layout) written by the JDK's writer with explicit tiling, edge
    tiles padded, at every compression — the stdlib tile-walk
    reassembly must be bit-exact (a 55x41 canvas guarantees partial
    edge tiles on both axes)."""
    rng = _rng()
    arr = rng.integers(0, 256, (41, 55, 3), dtype=np.uint8)
    path = str(tmp_path / f"t.{ctype}.tiff")
    pix_make_c(jtools, arr, "tiff", path, ctype, tiles=tiles)
    raw = open(path, "rb").read()
    # confirm the writer really tiled it (tag 322 present)
    assert b"\x42\x01" in raw or b"\x01\x42" in raw
    ours = mm.decode_pixels(raw)
    assert ours.shape == arr.shape
    assert int(np.abs(ours.astype(int) - arr.astype(int)).max()) == 0


@pytest.mark.parametrize("bands,ctype", [
    (3, "BI_RGB"), (1, "BI_RGB"), (3, "BI_BITFIELDS"), (1, "BI_RLE8"),
])
def test_java_bmp_variants_decode_bit_exact(jtools, tmp_path, bands, ctype):
    """The JDK's BMP writer across its DIB repertoire — 24-bit BI_RGB,
    8-bit palette (gray input), BI_BITFIELDS masks, and BI_RLE8 runs —
    all decode bit-exactly through the widened stdlib BMP matrix."""
    rng = _rng()
    arr = rng.integers(0, 256, (19, 29, bands), dtype=np.uint8)
    path = str(tmp_path / f"{ctype}.{bands}.bmp")
    pix_make_c(jtools, arr, "bmp", path, ctype)
    ours = mm.decode_pixels(open(path, "rb").read())
    exp = arr if bands == 3 else np.repeat(arr, 3, axis=2)
    assert ours.shape == exp.shape
    assert int(np.abs(ours.astype(int) - exp.astype(int)).max()) == 0


def test_wbmp_both_directions(jtools, tmp_path):
    """WBMP (WAP-237): the JDK's writer → stdlib decoder and the
    stdlib encoder → JDK reader, both bit-exact, on a 200-px-wide
    frame (exercising the two-byte VLQ width)."""
    rng = _rng()
    bw = (rng.integers(0, 2, (45, 200)) * 255).astype(np.uint8)
    jpath = str(tmp_path / "j.wbmp")
    pix_make(jtools, np.stack([bw] * 3, axis=2), "wbmp", jpath)
    ours = mm.decode_pixels(open(jpath, "rb").read())
    assert ours.shape == (45, 200, 1)
    assert np.array_equal(ours[:, :, 0], bw)
    opath = str(tmp_path / "o.wbmp")
    with open(opath, "wb") as fh:
        fh.write(mm._encode_wbmp(bw))
    theirs = jdump(jtools, opath)
    assert np.array_equal(theirs[:, :, 0], bw)


# --------------------------------------------- JPEG same-stream parity

def _gradient():
    y, x = np.mgrid[0:48, 0:64]
    return np.stack([(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256],
                    axis=2).astype(np.uint8)


def test_jpeg_same_stream_parity_444(jtools, tmp_path):
    """Both stacks decode the SAME 4:4:4 stream (no chroma
    upsampling ambiguity): agreement within the IDCT bound on pure
    random noise, baseline AND progressive."""
    rng = _rng()
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    for tag, enc in (("base", mm._encode_jpeg),
                     ("prog", mm._encode_jpeg_progressive)):
        path = str(tmp_path / f"{tag}.jpg")
        with open(path, "wb") as fh:
            fh.write(enc(img))
        ours = mm.decode_pixels(open(path, "rb").read())
        theirs = jdump(jtools, path)
        assert _maxdiff(ours, theirs) <= 3, tag


def _sof_luma_factor(d):
    """Sampling factor byte of the first SOF component (0x22 = 4:2:0)."""
    i = 2
    while i < len(d) - 4:
        if d[i] != 0xFF:
            i += 1
            continue
        m = d[i + 1]
        if m in (0xC0, 0xC2):
            return d[i + 11]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        i += 2 + struct.unpack(">H", d[i + 2:i + 4])[0]
    raise AssertionError("no SOF marker found")


def test_jpeg_same_stream_parity_420(jtools, tmp_path):
    """4:2:0 streams from BOTH encoders: T.81 does not pin the chroma
    upsampling filter (the JDK uses a triangle filter, the stdlib
    path replicates), so the bound is looser but still tight on
    smooth content (measured: ≤6). The JDK stream is verified to
    really be subsampled so the loose bound is honestly earned."""
    img = _gradient()
    ours_path = str(tmp_path / "ours420.jpg")
    with open(ours_path, "wb") as fh:
        fh.write(mm._encode_jpeg(img, subsample=True))
    java_path = str(tmp_path / "java420.jpg")
    pix_make(jtools, img, "jpg", java_path)
    assert _sof_luma_factor(open(ours_path, "rb").read()) == 0x22
    assert _sof_luma_factor(open(java_path, "rb").read()) == 0x22
    for path in (ours_path, java_path):
        ours = mm.decode_pixels(open(path, "rb").read())
        theirs = jdump(jtools, path)
        assert _maxdiff(ours, theirs) <= 12, path


# ----------------------------------------------------- audio parity

@pytest.mark.parametrize("fmt,dec", [
    ("wav", mm._decode_wav),
    ("aiff", mm._decode_aiff),
    ("au", mm._decode_au),
])
def test_java_written_audio_decodes_exact(jtools, tmp_path, fmt, dec):
    """javax.sound.sampled writes PCM16 stereo (WAV little-endian,
    AIFF/AU big-endian) from known samples; the stdlib readers must
    reproduce the exact normalized statistics."""
    rng = _rng()
    sr, ch, n = 8000, 2, 4000
    pcm = rng.integers(-32768, 32768, (n, ch)).astype("<i2")
    path = str(tmp_path / f"s.{fmt}")
    _jrun(jtools, "SoundMake", fmt, path,
          stdin=f"{sr} {ch} {n}\n".encode() + pcm.tobytes())
    st = dec(open(path, "rb").read())
    exp = pcm.astype(np.float64).ravel() / 32768.0
    assert st["sample_rate"] == sr
    assert st["channels"] == ch
    assert st["n_samples"] == n
    assert abs(st["mean"] - float(exp.mean())) < 1e-12
    assert abs(st["rms"] - float(np.sqrt((exp * exp).mean()))) < 1e-12
    assert abs(st["peak"] - float(np.abs(exp).max())) < 1e-12


@pytest.mark.parametrize("container,codec", [
    ("wav", "ulaw"), ("wav", "alaw"), ("au", "ulaw"), ("au", "alaw"),
])
def test_g711_tables_match_jdk(jtools, tmp_path, container, codec):
    """The stdlib G.711 expansion tables (built from the ITU-T
    companding arithmetic) against companded bytes the JDK produced
    AND the JDK's own expansion of them: G.711 decode is exactly
    specified, so both stacks must reconstruct the identical int16
    stream — the stats match to the last bit."""
    rng = _rng()
    sr, ch, n = 8000, 1, 2000
    pcm = rng.integers(-32768, 32768, (n, ch)).astype("<i2")
    path = str(tmp_path / f"g.{codec}.{container}")
    _jrun(jtools, "SoundMake", container, path, codec,
          stdin=f"{sr} {ch} {n}\n".encode() + pcm.tobytes())
    dec = mm._decode_wav if container == "wav" else mm._decode_au
    st = dec(open(path, "rb").read())
    out = _jrun(jtools, "SoundDump", path)
    nl = out.index(b"\n")
    rate2, ch2, frames = map(int, out[:nl].split())
    jd = np.frombuffer(out[nl + 1:], dtype="<i2").astype(np.float64) / 32768.0
    assert (st["n_samples"], st["sample_rate"]) == (frames, rate2) == (n, sr)
    assert abs(st["mean"] - float(jd.mean())) < 1e-12
    assert abs(st["rms"] - float(np.sqrt((jd * jd).mean()))) < 1e-12
    assert abs(st["peak"] - float(np.abs(jd).max())) < 1e-12


@pytest.mark.parametrize("fmt,dec", [
    ("wav", mm._decode_wav),
    ("aiff", mm._decode_aiff),
    ("au", mm._decode_au),
])
def test_java_written_pcm24_decodes_exact(jtools, tmp_path, fmt, dec):
    """24-bit PCM (studio audio) written by the JDK — WAV 3-byte
    little-endian, AIFF/AU big-endian — decodes to exact normalized
    statistics through the new _pcm24 path."""
    rng = _rng()
    sr, ch, n = 48000, 1, 1000
    vals = rng.integers(-(1 << 23), 1 << 23, n)
    raw = b"".join(int(v).to_bytes(3, "little", signed=True)
                   for v in vals)
    path = str(tmp_path / f"s24.{fmt}")
    _jrun(jtools, "SoundMake", fmt, path, "pcm24",
          stdin=f"{sr} {ch} {n}\n".encode() + raw)
    st = dec(open(path, "rb").read())
    exp = vals.astype(np.float64) / 8388608.0
    assert st["sample_rate"] == sr and st["n_samples"] == n
    assert abs(st["mean"] - float(exp.mean())) < 1e-12
    assert abs(st["rms"] - float(np.sqrt((exp * exp).mean()))) < 1e-12
    assert abs(st["peak"] - float(np.abs(exp).max())) < 1e-12


def test_sound_harness_roundtrip(jtools, tmp_path):
    """Harness self-check: SoundMake → SoundDump round-trips the
    samples, so a byte-order bug in the Java shims cannot silently
    weaken the audio assertions above."""
    rng = _rng()
    sr, ch, n = 11025, 1, 500
    pcm = rng.integers(-32768, 32768, (n, ch)).astype("<i2")
    for fmt in ("wav", "aiff", "au"):
        path = str(tmp_path / f"rt.{fmt}")
        _jrun(jtools, "SoundMake", fmt, path,
              stdin=f"{sr} {ch} {n}\n".encode() + pcm.tobytes())
        out = _jrun(jtools, "SoundDump", path)
        nl = out.index(b"\n")
        rate, chans, frames = map(int, out[:nl].split())
        got = np.frombuffer(out[nl + 1:], dtype="<i2").reshape(frames, chans)
        assert (rate, chans, frames) == (sr, ch, n)
        assert np.array_equal(got, pcm), fmt
