"""Focused pins for the round-9 fifth-pass LUT decode internals.

The LUT fast paths (VP8L `_read_sym`, JPEG `huff`, FLAC `unary` /
`_fixed_reconstruct`) must be BIT-IDENTICAL to the bit-walk /
arbitrary-precision forms they replace, including on the >8-bit-code
fallback and truncation edges the gate fixtures rarely reach. Each
test here drives one of those edges directly against a
reference-by-construction answer.
"""

import random

import numpy as np
import pytest

from meza_spark.llm.flac import _BrMSB, _FIXED_COEFS, _fixed_reconstruct
from meza_spark.llm.multimodal import _huff_decode_table, _JpegBitReader
from meza_spark.llm.webp import _Br, _Bw, _canonical, _read_sym


def _skewed_lengths():
    """A complete VP8L code with lengths 1..10 — forces both LUT hits
    (len ≤ 8) and LUT-miss bit-walks (len 9-10) in one table."""
    lens = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10]
    assert sum(1 << (10 - ln) for ln in lens) == 1 << 10  # Kraft exact
    return lens


def test_vp8l_lut_matches_bitwalk_through_long_codes():
    lens = _skewed_lengths()
    tab = _canonical(lens)
    assert tab[0] == "map" and tab[1] == 10
    _, _, table, lut = tab
    # the LUT never contradicts the map: replay each code's exact bit
    # pattern and check _read_sym returns its symbol
    for (ln, codev), sym in table.items():
        bw = _Bw()
        bw.code(codev, ln)
        bw.bits(0, 16)  # slack so the peek has bits to read
        br = _Br(bw.done())
        assert _read_sym(br, tab) == sym
        # exactly ln bits consumed (pos counts buffered bytes; nbits
        # is what remains unconsumed of them)
        assert br.pos * 8 - br.nbits == ln
    # long codes (9-10 bits) must be LUT misses, short ones hits
    for (ln, codev), sym in table.items():
        if ln <= 8:
            continue
        # every 8-bit prefix window of a long code is None in the LUT
        idx = 0
        for i in range(8):
            idx |= ((codev >> (ln - 1 - i)) & 1) << i
        assert lut[idx] is None


def test_vp8l_lut_stream_decodes_symbol_sequence():
    lens = _skewed_lengths()
    tab = _canonical(lens)
    _, _, table, _ = tab
    by_sym = {s: (ln, c) for (ln, c), s in table.items()}
    rng = random.Random(7)
    syms = [rng.randrange(len(lens)) for _ in range(500)]
    bw = _Bw()
    for s in syms:
        ln, c = by_sym[s]
        bw.code(c, ln)
    br = _Br(bw.done())
    assert [_read_sym(br, tab) for _ in syms] == syms


def test_vp8l_lut_truncation_still_raises():
    lens = _skewed_lengths()
    tab = _canonical(lens)
    _, _, table, _ = tab
    # a lone 10-bit code cut to its first byte must raise, not decode
    (ln, codev) = next((ln, c) for (ln, c) in table if ln == 10)
    bw = _Bw()
    bw.code(codev, ln)
    data = bw.done()[:1]
    with pytest.raises(ValueError, match="truncated"):
        _read_sym(_Br(data), tab)


def test_jpeg_lut_matches_map_on_standard_ac_geometry():
    # the standard AC-luminance BITS vector: codes span 2..16 bits, so
    # both the contiguous-LUT path and the 9-16-bit fallback are live
    bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    vals = list(range(sum(bits)))
    lut, tmap = _huff_decode_table(bits, vals)
    enc = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    rng = random.Random(11)
    syms = [rng.choice(vals) for _ in range(400)]
    # write MSB-first with JPEG byte-stuffing (FF -> FF 00), then
    # decode with huff()
    acc, n = 0, 0
    out = bytearray()

    def put(byte):
        out.append(byte)
        if byte == 0xFF:
            out.append(0x00)

    for s in syms:
        c, ln = enc[s]
        acc = (acc << ln) | c
        n += ln
        while n >= 8:
            put((acc >> (n - 8)) & 0xFF)
            n -= 8
            acc &= (1 << n) - 1
    if n:
        put(((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xFF)
    r = _JpegBitReader(bytes(out), 0)
    assert [r.huff((lut, tmap)) for _ in syms] == syms
    # LUT slots agree with the map everywhere they claim a code
    for idx in range(256):
        e = lut[idx]
        if e is None:
            continue
        v, ln = e
        assert tmap[(ln, idx >> (8 - ln))] == v


def test_flac_unary_chunk_scan_matches_bit_semantics():
    # runs crossing byte boundaries, zero-run bytes, and the sanity
    # bound must behave exactly like per-bit reads
    bw_bits = []
    runs = [0, 1, 7, 8, 9, 30, 2, 0, 40]
    for q in runs:
        bw_bits.extend([0] * q + [1])
    # pack MSB-first
    data = bytearray()
    acc = n = 0
    for b in bw_bits:
        acc = (acc << 1) | b
        n += 1
        if n == 8:
            data.append(acc)
            acc = n = 0
    if n:
        data.append(acc << (8 - n))
    br = _BrMSB(bytes(data))
    assert [br.unary() for _ in runs] == runs
    # truncation: an all-zero tail raises
    br2 = _BrMSB(b"\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        br2.unary()
    # sanity bound
    br3 = _BrMSB(b"\x00" * 64)
    with pytest.raises(ValueError, match="sanity"):
        br3.unary(limit=100)


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_flac_fixed_reconstruct_matches_python_loop(order):
    rng = random.Random(order)
    warm = [rng.randrange(-1 << 15, 1 << 15) for _ in range(order)]
    res = [rng.randrange(-1 << 17, 1 << 17) for _ in range(300)]
    coefs = _FIXED_COEFS[order]
    ref = list(warm)
    for r in res:
        ref.append(r + sum(c * ref[-1 - i] for i, c in enumerate(coefs)))
    got = _fixed_reconstruct(warm, res, order)
    assert got == ref  # full sample list: warm-up + reconstructed tail


def test_flac_fixed_reconstruct_guard_falls_back_on_hostile():
    # residuals near int64 must refuse the numpy path (None), and the
    # decoder's Python fallback then reproduces arbitrary precision
    huge = [(1 << 61), -(1 << 61), (1 << 61)]
    assert _fixed_reconstruct([1, 2], huge, 2) is None
    assert _fixed_reconstruct([1], [1 << 63], 1) is None  # OverflowError path
    # empty residual block (blocksize == order) stays fine
    assert _fixed_reconstruct([5, 9], [], 2) == [5, 9]


def test_tiff_large_tag_vectors_keep_exact_semantics():
    # the >64-entry frombuffer path: a 16-bit palette TIFF round-trips
    # bit-exactly in BOTH byte orders (the ColorMap rides the ndarray
    # branch; strip tables stay Python ints), and a ColorMap that is
    # too short still raises the usable-ColorMap error
    from meza_spark.llm.multimodal import _decode_tiff, _encode_tiff

    k = np.arange(65536, dtype=np.int64)
    pal = np.stack([(k * 3 + 11) % 256, (k * 5 + 29) % 256,
                    (k * 7 + 3) % 256], axis=1).astype(np.uint8)
    idx = ((np.arange(16 * 8, dtype=np.int64) * 31 + 7) % 65536) \
        .astype(np.uint16).reshape(8, 16, 1)
    for be in (False, True):
        b = _encode_tiff(idx, palette=pal, big_endian=be)
        out = _decode_tiff(b)
        expect = pal[idx[:, :, 0]]
        assert out.shape == (8, 16, 3)
        assert (out == expect).all()
    # 8-bit palette (256-entry map = 768 values, still > 64)
    pal8 = pal[:256]
    idx8 = (np.arange(6 * 7) % 256).astype(np.uint8).reshape(6, 7, 1)
    out8 = _decode_tiff(_encode_tiff(idx8, palette=pal8))
    assert (out8 == pal8[idx8[:, :, 0]]).all()
    # short ColorMap: truncate the encoded map by rewriting the count
    b = bytearray(_encode_tiff(idx, palette=pal))
    # find the ColorMap tag (320) in the IFD and halve its count
    import struct as _s
    ifd = _s.unpack("<I", b[4:8])[0]
    n = _s.unpack("<H", b[ifd:ifd + 2])[0]
    for i in range(n):
        e0 = ifd + 2 + i * 12
        if _s.unpack("<H", b[e0:e0 + 2])[0] == 320:
            cnt = _s.unpack("<I", b[e0 + 4:e0 + 8])[0]
            b[e0 + 4:e0 + 8] = _s.pack("<I", cnt // 2)
            break
    with pytest.raises(ValueError, match="ColorMap"):
        _decode_tiff(bytes(b))
