"""MP3 / FLAC header metadata (round 8 — crawl-realism formats):
magic sniff in both sniffers, exact frame-walk MP3 duration (VBR-safe
by construction) pinned against a REAL gsutil-vendored MPEG-2 Layer
III file and against independent CBR byte-rate math, FLAC STREAMINFO
bit unpacking, honest decode gates, and hostile payloads. Sample
decode for both stays behind NotImplementedError (MP3 is a perceptual
codec; FLAC routes to a decoder= plugin)."""

import struct

import pytest

from meza_spark.llm import multimodal as mm

REAL_MP3 = "tests/fixtures/external/mp3_mpeg2_l3_gsutil.mp3"


def _flac_fixture(rate=44100, channels=2, bits=16, total=88200,
                  last=True, pad_first=False):
    """Minimal fLaC + STREAMINFO (+ optional leading PADDING block to
    exercise the block walk)."""
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) \
        | total
    si = struct.pack(">HH", 16, 16) + b"\x00" * 6 \
        + packed.to_bytes(8, "big") + b"\x00" * 16
    assert len(si) == 34
    out = b"fLaC"
    if pad_first:
        # PADDING (type 1) first is ILLEGAL per spec (STREAMINFO must
        # be first) but tolerated by walkers; ours walks to type 0
        out += bytes([1]) + (4).to_bytes(3, "big") + b"\x00" * 4
    out += bytes([(0x80 if last else 0) | 0]) + (34).to_bytes(3, "big") + si
    return out


def _mp3_frame_bytes(ver_bits=3, layer_bits=1, br_idx=9, sr_idx=0,
                     pad=0, mode=3, fill=0x55):
    """One syntactically valid MPEG frame header + body filled to the
    computed frame length."""
    h = (0x7FF << 21) | (ver_bits << 19) | (layer_bits << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6)
    hdr = h.to_bytes(4, "big")
    f = mm._mp3_frame(hdr, 0)
    assert f is not None
    return hdr + bytes([fill]) * (f[0] - 4), f


# ------------------------------------------------------------------ sniff

def test_sniff_magics():
    assert mm._sniff_format(b"fLaC" + b"\x00" * 8) == "flac"
    assert mm._sniff_format(b"ID3\x04\x00\x00\x00\x00\x00\x00") == "mp3"
    frame, _ = _mp3_frame_bytes()
    assert mm._sniff_format(frame) == "mp3"


@pytest.mark.parametrize("hdr", [
    b"\xff\xeb\x90\x00",     # reserved version (bits 01)
    b"\xff\xf9\x90\x00",     # reserved layer (bits 00)
    b"\xff\xfb\xf0\x00",     # bitrate index 15
    b"\xff\xfb\x9c\x00",     # sample-rate index 3
    b"\xff\x1b\x90\x00",     # broken sync (second byte)
    b"\xfe\xfb\x90\x00",     # broken sync (first byte)
])
def test_sniff_rejects_invalid_sync(hdr):
    assert mm._sniff_format(hdr + b"\x00" * 16) == "unknown"


def test_jvm_sniff_mp3_flac(spark):
    frame, _ = _mp3_frame_bytes()
    rows = [(1, bytearray(b"fLaC" + b"\x00" * 20)),
            (2, bytearray(b"ID3\x03\x00" + b"\x00" * 20)),
            (3, bytearray(frame)),
            (4, bytearray(b"\xff\xeb\x90\x00" + b"\x00" * 8))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r["format"]
           for r in mm.attach_media_meta(df).collect()}
    assert got == {1: "flac", 2: "mp3", 3: "mp3", 4: "unknown"}


# ------------------------------------------------------------------ mp3

def test_real_mp3_headers_pinned():
    """gsutil's test.mp3: ID3v2.4 skip + 45-frame walk. The pinned
    1175 ms cross-checks independently: (9436 - 32 tag bytes) * 8 /
    64000 bps = 1.1755 s."""
    b = open(REAL_MP3, "rb").read()
    assert mm._sniff_format(b) == "mp3"
    hd = mm._parse_headers(b)
    assert hd["format"] == "mp3"
    assert hd["sample_rate"] == 22050
    assert hd["channels"] == 1
    assert hd["duration_ms"] == 1175


def test_mp3_frame_walk_exact_vbr():
    """A hand-muxed VBR stream (three different bitrates): the walk
    counts real frames, so duration is exact — no Xing header, no CBR
    assumption. MPEG1 Layer III 44100: 1152 samples/frame."""
    frames = b"".join(_mp3_frame_bytes(br_idx=i)[0] for i in (5, 9, 12))
    hd = mm._parse_headers(frames)
    assert hd["sample_rate"] == 44100
    assert hd["channels"] == 1
    assert hd["duration_ms"] == 3 * 1152 * 1000 // 44100


def test_mp3_id3_skip_and_trailing_tag():
    frame, _ = _mp3_frame_bytes(ver_bits=2, layer_bits=1, sr_idx=1,
                                mode=0)  # MPEG2 L3 24000 Hz stereo
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    tag = b"TAG" + b"\x20" * 125                 # ID3v1 trailer
    hd = mm._parse_headers(id3 + frame + frame + tag)
    assert hd["sample_rate"] == 24000 and hd["channels"] == 2
    assert hd["duration_ms"] == 2 * 576 * 1000 // 24000


def test_mp3_xing_header_frame_excluded():
    """r8 review fix + r9 advice fix: a LAME-style Xing/Info VBR
    header frame is spec-valid but carries no audio — its samples
    must not count toward the duration. The tag is recognized ONLY at
    its spec offset (4-byte header + Layer III side info: 17 bytes
    for MPEG1 mono; VBRI fixed at header+32), not by substring
    search."""
    plain, _ = _mp3_frame_bytes()          # MPEG1 L3 mono, no CRC
    for marker, off in ((b"Xing", 4 + 17), (b"Info", 4 + 17),
                        (b"VBRI", 4 + 32)):
        hdr = plain[:off] + marker + b"\x00\x00\x00\x01" \
            + plain[off + 8:]
        assert len(hdr) == len(plain)
        stream = hdr + plain + plain
        got = mm._parse_headers(stream)
        assert got["duration_ms"] == 2 * 1152 * 1000 // 44100, marker
    # a marker in a NON-first frame does not suppress anything (the
    # VBR header convention is first-frame-only)
    stream = plain + hdr + plain
    assert mm._parse_headers(stream)["duration_ms"] == \
        3 * 1152 * 1000 // 44100


def test_mp3_cbr_audio_containing_info_bytes_keeps_frame():
    """r9 advice fix: a plain CBR stream whose compressed audio
    coincidentally contains the ASCII bytes 'Info' / 'Xing' at a
    NON-spec offset must not lose its first frame."""
    plain, _ = _mp3_frame_bytes()
    for marker in (b"Info", b"Xing", b"VBRI"):
        # plant the marker mid-payload, away from offsets 21 and 36
        body = plain[:80] + marker + plain[84:]
        assert len(body) == len(plain)
        stream = body + plain + plain
        assert mm._parse_headers(stream)["duration_ms"] == \
            3 * 1152 * 1000 // 44100, marker
    # stereo MPEG1 frame: side info is 32 bytes, so the tag offset is
    # 36 — a marker at the MONO offset (21) must NOT suppress there
    st, _ = _mp3_frame_bytes(mode=0, br_idx=12)
    body = st[:21] + b"Xing" + st[25:]
    stream = body + st
    assert mm._parse_headers(stream)["duration_ms"] == \
        2 * 1152 * 1000 // 44100
    # ...but at the stereo offset (36) it does
    body = st[:36] + b"Xing" + st[40:]
    stream = body + st
    assert mm._parse_headers(stream)["duration_ms"] == \
        1 * 1152 * 1000 // 44100


def test_mp3_layer2_and_padding():
    f1, (ln1, s1, r1, _) = _mp3_frame_bytes(layer_bits=2, br_idx=8,
                                            pad=1)
    # MPEG1 Layer II index 8 = 128 kbps; padded frame adds one byte
    assert s1 == 1152 and ln1 == 144 * 128000 // 44100 + 1
    hd = mm._parse_headers(f1)
    assert hd["duration_ms"] == 1152 * 1000 // 44100


def test_mp3_hostile_never_bombs():
    b = open(REAL_MP3, "rb").read()
    for cut in (3, 10, 33, 40, 200, len(b) - 7):
        out = mm._parse_headers(b[:cut])
        assert isinstance(out, dict)         # lenient, no raise
    # garbage after ID3 header with a huge syncsafe size
    junk = b"ID3\x04\x00\x00\x0f\x7f\x7f\x7f" + b"\xff" * 64
    assert mm._parse_headers(junk)["duration_ms"] is None


def test_mp3_decode_is_gated():
    b = open(REAL_MP3, "rb").read()
    with pytest.raises(NotImplementedError, match="perceptual"):
        mm._decode_audio_bytes(b)


# ------------------------------------------------------------------ flac

def test_flac_streaminfo_fields():
    hd = mm._parse_headers(_flac_fixture())
    assert hd["format"] == "flac"
    assert hd["sample_rate"] == 44100
    assert hd["channels"] == 2
    assert hd["duration_ms"] == 2000
    # mono 8-channel-max edges, odd rate, 36-bit sample count
    hd = mm._parse_headers(_flac_fixture(rate=96000, channels=8,
                                         bits=24, total=(1 << 35) + 7))
    assert hd["channels"] == 8
    assert hd["duration_ms"] == ((1 << 35) + 7) * 1000 // 96000
    # STREAMINFO behind a padding block still found
    hd = mm._parse_headers(_flac_fixture(pad_first=True, last=False))
    assert hd["sample_rate"] == 44100


# ------------------------------------------------------------- ogg/ebml

def _ogg_page(body, granule, seq, flags=0, serial=7):
    segs = []
    rem = len(body)
    while rem >= 255:
        segs.append(255)
        rem -= 255
    segs.append(rem)
    hdr = (b"OggS" + bytes([0, flags])
           + granule.to_bytes(8, "little", signed=True)
           + serial.to_bytes(4, "little") + seq.to_bytes(4, "little")
           + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs))
    return hdr + body


def test_ogg_vorbis_headers():
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<I", 44100) + b"\x00" * 16)
    b = (_ogg_page(ident, 0, 0, flags=0x02)
         + _ogg_page(b"\x00" * 20, 88200, 1)
         + _ogg_page(b"\x00" * 10, 132300, 2, flags=0x04))
    assert mm._sniff_format(b) == "ogg"
    hd = mm._parse_headers(b)
    assert hd["format"] == "ogg"
    assert hd["sample_rate"] == 44100 and hd["channels"] == 2
    assert hd["duration_ms"] == 132300 * 1000 // 44100
    with pytest.raises(NotImplementedError, match="perceptual"):
        mm._decode_audio_bytes(b)


def test_ogg_opus_headers():
    head = (b"OpusHead" + bytes([1, 1])
            + struct.pack("<H", 312) + struct.pack("<I", 16000)
            + b"\x00\x00\x00")
    b = (_ogg_page(head, 0, 0, flags=0x02)
         + _ogg_page(b"\x00" * 30, 48000 + 312, 1, flags=0x04))
    hd = mm._parse_headers(b)
    # Opus always decodes at 48 kHz regardless of the input rate field
    assert hd["sample_rate"] == 48000 and hd["channels"] == 1
    assert hd["duration_ms"] == 1000


def test_ogg_hostile():
    ident = b"\x01vorbis" + b"\x00" * 20
    good = _ogg_page(ident, 0, 0, flags=0x02)
    for cut in (3, 10, 26, len(good) - 2):
        out = mm._parse_headers(good[:cut])
        assert isinstance(out, dict)     # lenient, never raises
    # -1 granule (no packet finishes on the page) must not poison
    b = _ogg_page(ident, -1, 0, flags=0x02)
    assert mm._parse_headers(b)["duration_ms"] is None


def _ebml(doctype):
    body = (b"\x42\x82" + bytes([0x80 | len(doctype)])
            + doctype)                       # DocType element
    return b"\x1aE\xdf\xa3" + bytes([0x80 | len(body)]) + body


def test_ebml_doctype():
    for doctype, want in ((b"matroska", "mkv"), (b"webm", "webm"),
                          (b"other", "ebml")):
        b = _ebml(doctype) + b"\x00" * 8
        assert mm._sniff_format(b) == "ebml"
        assert mm._parse_headers(b)["format"] == want
    # truncated / hostile vints stay lenient (padded past the
    # 12-byte parse floor)
    assert mm._parse_headers(
        b"\x1aE\xdf\xa3\xff" + b" " * 8)["format"] == "ebml"
    assert mm._parse_headers(
        b"\x1aE\xdf\xa3\x00\x00" + b" " * 8)["format"] == "ebml"


def test_jvm_sniff_ogg_ebml(spark):
    rows = [(1, bytearray(b"OggS" + b"\x00" * 30)),
            (2, bytearray(b"\x1aE\xdf\xa3" + b"\x00" * 10))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r["format"]
           for r in mm.attach_media_meta(df).collect()}
    assert got == {1: "ogg", 2: "ebml"}


def test_flac_hostile_headers():
    assert mm._parse_headers(b"fLaC")["sample_rate"] is None
    assert mm._parse_headers(b"fLaC\x00\x00\x00")["sample_rate"] is None
    trunc = _flac_fixture()[:20]
    assert mm._parse_headers(trunc)["sample_rate"] is None
    # a frameless stream parses headers but cannot decode samples
    with pytest.raises(ValueError, match="no frames"):
        mm._decode_audio_bytes(_flac_fixture())
