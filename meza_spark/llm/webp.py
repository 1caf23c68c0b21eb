"""WebP container + VP8L (lossless) codec — pure stdlib + numpy.

Implements the public *WebP Lossless Bitstream Specification*
(https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification)
and RIFF container layout (RFC 9649): a COMPLETE VP8L decoder — all
four transforms (predictor / color / subtract-green / color-indexing
with packed sub-pixels), meta-Huffman groups, LZ77 backward
references with the 120-entry 2D distance map, and the color cache —
plus a deliberately small VP8L *encoder* (literal-only entropy
coding, optional single transform) used to synthesize real,
spec-valid fixtures for the driver gates.

Lossy VP8 frames are a perceptual DCT codec outside the pure-stdlib
charter; :func:`decode_webp` raises ``NotImplementedError`` for them
so ``decode_video``/``decode_image`` callers can route to the
``decoder=`` plugin, exactly like H.264 in MP4.

Cross-implementation validation: tests/test_webp_crossimpl_parity.py
drives the system ``libwebp.so`` (the reference implementation) via
ctypes in BOTH directions — libwebp-encoded streams (which exercise
LZ77, color cache, and all transforms) must decode bit-exact here,
and streams encoded here must decode bit-exact under libwebp.

Scale notes: decode is row-local (one payload per call, zero
shuffle); every allocation is gated by the shared
``MAX_DECODE_PIXELS`` budget BEFORE it happens, so a hostile
200-byte header declaring 16383x16383 cannot OOM an executor.
"""

from __future__ import annotations

import struct

__all__ = ["decode_webp", "decode_webp_frames", "encode_webp_anim",
           "encode_webp_lossless", "webp_headers"]

# widest legal VP8L dimension (14-bit field) — used for sanity only
_VP8L_MAX_DIM = 1 << 14

# Distance codes 1..120 address a 2D neighborhood; the byte packs
# (yoffset << 4) | (8 - xoffset) per the spec's code-to-plane table.
_CODE_TO_PLANE = bytes([
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70,
])

# order in which code-length-code lengths are stored (spec §6.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
             11, 12, 13, 14, 15)


class _Br:
    """LSB-first bit reader over a bytes payload (VP8L convention)."""

    __slots__ = ("d", "n", "pos", "acc", "nbits")

    def __init__(self, d: bytes, pos: int = 0):
        self.d = d
        self.n = len(d)
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, k: int) -> int:
        while self.nbits < k:
            if self.pos >= self.n:
                raise ValueError("truncated VP8L stream")
            self.acc |= self.d[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.nbits -= k
        return v


class _Bw:
    """LSB-first bit writer (inverse of :class:`_Br`)."""

    __slots__ = ("acc", "n", "out")

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def bits(self, v: int, k: int) -> None:
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, c: int, length: int) -> None:
        """Huffman codes are emitted MSB-of-code first (deflate rule):
        in this LSB-first writer that is a single field write of the
        code value bit-reversed over its length."""
        self.bits((_REV8[c & 0xFF] << 8
                   | _REV8[(c >> 8) & 0xFF]) >> (16 - length), length)

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


_REV8 = tuple(int(f"{i:08b}"[::-1], 2) for i in range(256))


def _canonical(lengths):
    """Code lengths → decode table.

    Returns ``("const", sym)`` for a single-symbol code (0 bits read
    per symbol, libwebp's special case) or ``("map", maxlen, {(len,
    code): sym}, lut)`` for a canonical prefix code, which must be
    exactly complete (Kraft sum == 1) — libwebp rejects both over-
    and under-subscribed multi-symbol codes and so do we. ``lut`` is
    a 256-entry table over the next 8 stream bits: ``(sym, len)`` for
    codes of ≤8 bits, ``None`` where the 8-bit window is a proper
    prefix of a longer code (the bit-walk fallback handles those).
    The stream is LSB-first per byte while codes assemble MSB-first,
    so a code's LUT slots are the bit-reversal of its code value with
    the 8-len slack bits free.
    """
    pairs = sorted((ln, s) for s, ln in enumerate(lengths) if ln)
    if not pairs:
        raise ValueError("VP8L code with no symbols")
    if len(pairs) == 1:
        return ("const", pairs[0][1])
    maxlen = pairs[-1][0]
    if maxlen > 15:
        raise ValueError("VP8L code length exceeds 15")
    if sum(1 << (maxlen - ln) for ln, _ in pairs) != (1 << maxlen):
        raise ValueError("incomplete VP8L prefix code")
    table = {}
    lut = [None] * 256
    codev = 0
    prev = 0
    for ln, s in pairs:
        codev <<= (ln - prev)
        prev = ln
        table[(ln, codev)] = s
        if ln <= 8:
            base = _REV8[(codev << (8 - ln)) & 0xFF]
            lut[base::1 << ln] = [(s, ln)] * (256 >> ln)
        codev += 1
    return ("map", maxlen, table, lut)


def _read_sym(br: _Br, tab) -> int:
    if tab[0] == "const":
        return tab[1]
    _, maxlen, table, lut = tab
    # Fast path: peek 8 bits (zero-padded only at EOF) and resolve
    # ≤8-bit codes in one LUT hit. Nothing is consumed on a miss, so
    # the bit-walk below sees the identical stream; a LUT hit whose
    # length exceeds the real bits left means the walk would have hit
    # EOF mid-code — same truncation error, raised here.
    if br.nbits < 8:
        while br.nbits < 8 and br.pos < br.n:
            br.acc |= br.d[br.pos] << br.nbits
            br.pos += 1
            br.nbits += 8
    e = lut[br.acc & 0xFF]
    if e is not None:
        s, ln = e
        if ln <= br.nbits:
            br.acc >>= ln
            br.nbits -= ln
            return s
        raise ValueError("truncated VP8L stream")
    codev = 0
    for ln in range(1, maxlen + 1):
        codev = (codev << 1) | br.read(1)
        s = table.get((ln, codev))
        if s is not None:
            return s
    raise ValueError("bad VP8L huffman code")


def _read_code(br: _Br, alphabet: int):
    """Read one prefix code (spec §6.2.3): 'simple' (1-2 symbols) or
    'normal' (code lengths coded by a code-length code)."""
    if br.read(1):                                    # simple
        nsym = br.read(1) + 1
        sym0 = br.read(8) if br.read(1) else br.read(1)
        if sym0 >= alphabet:
            raise ValueError("VP8L simple-code symbol out of range")
        if nsym == 1:
            return ("const", sym0)
        sym1 = br.read(8)
        if sym1 >= alphabet or sym1 == sym0:
            raise ValueError("VP8L simple-code symbol out of range")
        lengths = [0] * alphabet
        lengths[sym0] = lengths[sym1] = 1
        return _canonical(lengths)
    ncodes = br.read(4) + 4
    if ncodes > len(_CL_ORDER):
        raise ValueError("too many code-length codes")
    cl_lens = [0] * 19
    for i in range(ncodes):
        cl_lens[_CL_ORDER[i]] = br.read(3)
    cl_tab = _canonical(cl_lens)
    if br.read(1):                                    # explicit max symbol
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
        if max_symbol > alphabet:
            raise ValueError("VP8L max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    sym = 0
    prev_len = 8                                      # spec default
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = _read_sym(br, cl_tab)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                rep, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                rep, fill = 3 + br.read(3), 0
            elif cl == 18:
                rep, fill = 11 + br.read(7), 0
            else:
                raise ValueError("bad code-length symbol")
            if sym + rep > alphabet:
                raise ValueError("VP8L code-length repeat overflow")
            for _ in range(rep):
                lengths[sym] = fill
                sym += 1
    return _canonical(lengths)


def _prefix_value(sym: int, br: _Br) -> int:
    """LZ77 length/distance prefix symbol → value (spec §5.2.2)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_to_dist(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    v = _CODE_TO_PLANE[code - 1]
    dist = (v >> 4) * xsize + (8 - (v & 0xF))
    return dist if dist >= 1 else 1


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _check_budget(w: int, h: int) -> None:
    # late import: multimodal imports this module, avoid a cycle
    from meza_spark.llm.multimodal import _check_pixels
    _check_pixels(h, w, "vp8l")


def _decode_entropy_image(br: _Br, w: int, h: int, is_level0: bool,
                          transforms=None):
    """Spec 'decode image stream': transforms (level 0 only), color
    cache, (meta-)prefix codes, LZ77-coded ARGB pixels. Returns a
    list of w*h uint32 ARGB values; appends (type, data, dims) tuples
    to ``transforms`` in read order."""
    _check_budget(w, h)
    xsize = w
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 2:                            # subtract green
                transforms.append((2, None, (xsize, h)))
            elif ttype in (0, 1):                     # predictor / color
                bits = br.read(3) + 2
                sw, sh = _subsample(xsize, bits), _subsample(h, bits)
                sub = _decode_entropy_image(br, sw, sh, False)
                transforms.append((ttype, (bits, sub), (xsize, h)))
            else:                                     # color indexing
                ncolors = br.read(8) + 1
                pal = _decode_entropy_image(br, ncolors, 1, False)
                # palette entries are delta-coded per channel
                for i in range(1, ncolors):
                    pal[i] = _add_px(pal[i], pal[i - 1])
                wbits = (0 if ncolors > 16 else
                         1 if ncolors > 4 else
                         2 if ncolors > 2 else 3)
                transforms.append((3, (wbits, pal), (xsize, h)))
                xsize = _subsample(xsize, wbits)
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("bad VP8L color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    hbits = 0
    hxs = 1
    ngroups = 1
    if is_level0 and br.read(1):                      # meta prefix codes
        hbits = br.read(3) + 2
        hxs = _subsample(xsize, hbits)
        meta = _decode_entropy_image(
            br, hxs, _subsample(h, hbits), False)
        meta = [(px >> 8) & 0xFFFF for px in meta]
        ngroups = max(meta) + 1
    alpha_g = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(ngroups):
        groups.append((_read_code(br, alpha_g), _read_code(br, 256),
                       _read_code(br, 256), _read_code(br, 256),
                       _read_code(br, 40)))

    npix = xsize * h
    data = [0] * npix
    i = 0
    x = 0
    g = groups[0]
    shift = 32 - cache_bits if cache_bits else 0
    while i < npix:
        if meta is not None:
            g = groups[meta[((i // xsize) >> hbits) * hxs + (x >> hbits)]]
        s = _read_sym(br, g[0])
        if s < 256:
            red = _read_sym(br, g[1])
            blue = _read_sym(br, g[2])
            alpha = _read_sym(br, g[3])
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            data[i] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
            i += 1
            x += 1
            if x == xsize:
                x = 0
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist = _plane_to_dist(
                xsize, _prefix_value(_read_sym(br, g[4]), br))
            if dist > i or i + length > npix:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = data[i - dist]
                data[i] = px
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
                i += 1
            x = i % xsize
        else:
            if cache is None or s - 280 >= len(cache):
                raise ValueError("VP8L color-cache index out of range")
            data[i] = cache[s - 280]
            i += 1
            x += 1
            if x == xsize:
                x = 0
    return data


def _add_px(a: int, b: int) -> int:
    """Per-channel mod-256 pixel addition."""
    return (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00) | \
           (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)


def _avg2(a: int, b: int) -> int:
    """Per-channel (a + b) >> 1 without carries across channels."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _chans(p: int):
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _select(left: int, top: int, tl: int) -> int:
    la, lr, lg, lb = _chans(left)
    ta, tr, tg, tb = _chans(top)
    ca, cr, cg, cb = _chans(tl)
    p_l = (abs(ta - ca) + abs(tr - cr) + abs(tg - cg) + abs(tb - cb))
    p_t = (abs(la - ca) + abs(lr - cr) + abs(lg - cg) + abs(lb - cb))
    return left if p_l < p_t else top


def _cas_full(left: int, top: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((left >> sh) & 0xFF) + ((top >> sh) & 0xFF)
                   - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _cas_half(avg: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        d = ((avg >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        # C truncating division, not Python floor
        c = _clamp(((avg >> sh) & 0xFF) + (d // 2 if d >= 0
                                           else -((-d) // 2)))
        out |= c << sh
    return out


def _predict(mode: int, left: int, top: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        return _select(left, top, tl)
    if mode == 12:
        return _cas_full(left, top, tl)
    if mode == 13:
        return _cas_half(_avg2(left, top), tl)
    raise ValueError("bad VP8L predictor mode")


def _inv_predictor(data, w: int, h: int, bits: int, sub):
    """Inverse predictor transform: residual + prediction from the
    already-reconstructed neighborhood, per-channel mod 256. Linear
    array semantics per the spec: TR of the rightmost column is the
    first pixel of the SAME row (index i - w + 1)."""
    sw = _subsample(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = data[i - 1]                    # forced L
            elif x == 0:
                pred = data[i - w]                    # forced T
            else:
                mode = (sub[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
                pred = _predict(mode, data[i - 1], data[i - w],
                                data[i - w + 1], data[i - w - 1])
            data[i] = _add_px(data[i], pred)


def _s8(v: int) -> int:
    return v - 256 if v > 127 else v


def _inv_color_transform(data, w: int, h: int, bits: int, sub):
    sw = _subsample(w, bits)
    for y in range(h):
        srow = (y >> bits) * sw
        row = y * w
        for x in range(w):
            cte = sub[srow + (x >> bits)]
            g2r = _s8(cte & 0xFF)
            g2b = _s8((cte >> 8) & 0xFF)
            r2b = _s8((cte >> 16) & 0xFF)
            px = data[row + x]
            green = _s8((px >> 8) & 0xFF)
            red = ((px >> 16) & 0xFF) + ((g2r * green) >> 5)
            red &= 0xFF
            blue = (px & 0xFF) + ((g2b * green) >> 5)
            blue += (r2b * _s8(red)) >> 5
            data[row + x] = (px & 0xFF00FF00) | (red << 16) | (blue & 0xFF)


def _inv_subtract_green(data):
    for i, px in enumerate(data):
        g = (px >> 8) & 0xFF
        r = ((px >> 16) + g) & 0xFF
        b = (px + g) & 0xFF
        data[i] = (px & 0xFF00FF00) | (r << 16) | b


def _inv_color_index(data, w: int, h: int, wbits: int, pal):
    """Expand packed palette indices (spec §4.2.4): out-of-range
    indices map to 0x00000000, matching libwebp's zero-padded map."""
    out = [0] * (w * h)
    ppb = 1 << wbits                                  # sub-pixels/byte
    subw = _subsample(w, wbits)
    bitw = 8 >> wbits
    mask = (1 << bitw) - 1
    npal = len(pal)
    for y in range(h):
        row = y * w
        srow = y * subw
        for x in range(w):
            packed = (data[srow + (x >> wbits)] >> 8) & 0xFF
            idx = (packed >> (bitw * (x % ppb))) & mask
            out[row + x] = pal[idx] if idx < npal else 0
    data[:] = out


def decode_vp8l(payload: bytes):
    """VP8L chunk payload → (h, w, c) uint8 RGB(A) numpy array.

    c follows the header's alpha-is-used flag (4 when set, else 3) —
    deterministic from the bytes alone, matching how libwebp reports
    ``has_alpha`` for lossless streams.
    """
    import numpy as np

    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _Br(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_used = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    _check_budget(w, h)
    transforms = []
    data = _decode_entropy_image(br, w, h, True, transforms)
    for ttype, tdata, (tw, th) in reversed(transforms):
        if ttype == 0:
            _inv_predictor(data, tw, th, *tdata)
        elif ttype == 1:
            _inv_color_transform(data, tw, th, *tdata)
        elif ttype == 2:
            _inv_subtract_green(data)
        else:
            _inv_color_index(data, tw, th, *tdata)
    arr = np.array(data, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = (arr >> 24) & 0xFF
    return rgba if alpha_used else np.ascontiguousarray(rgba[..., :3])


def _webp_chunks(b: bytes):
    """RIFF sub-chunk walk (chunks are word-aligned)."""
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        if pos + 8 + sz > len(b):
            raise ValueError("truncated WebP chunk")
        yield tag, pos + 8, pos + 8 + sz
        pos += 8 + sz + (sz & 1)


def decode_webp(b: bytes):
    """WebP container → pixels. VP8L (lossless) decodes for real;
    lossy VP8 and animations raise ``NotImplementedError`` so callers
    route them to the external ``decoder=`` plugin, like H.264."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    saw_lossy = saw_anim = False
    for tag, s, e in _webp_chunks(b):
        if tag == b"VP8L":
            return decode_vp8l(b[s:e])
        if tag == b"VP8 ":
            saw_lossy = True
        elif tag == b"ANIM":
            saw_anim = True
    if saw_anim:
        raise NotImplementedError(
            "animated WebP is a video container here — use "
            "decode_video/frame_sample (decode_webp_frames walks "
            "VP8L-framed animations for real)")
    if saw_lossy:
        raise NotImplementedError(
            "lossy VP8 WebP needs an external decoder= plugin "
            "(perceptual DCT codec, outside the pure-stdlib charter)")
    raise ValueError("WebP container with no image chunk")


def webp_headers(b: bytes) -> dict:
    """Header-only dims/channels for the WebP branch of
    ``parse_media_headers`` — VP8X canvas size, VP8L 14-bit fields,
    or the lossy VP8 key-frame start code, whichever comes first."""
    out = {"format": "webp", "width": None, "height": None,
           "channels": None}
    try:
        for tag, s, e in _webp_chunks(b):
            if tag == b"VP8X" and e - s >= 10:
                out["width"] = 1 + int.from_bytes(b[s + 4:s + 7], "little")
                out["height"] = 1 + int.from_bytes(b[s + 7:s + 10],
                                                   "little")
                out["channels"] = 4 if b[s] & 0x10 else 3
                return out
            if tag == b"VP8L" and e - s >= 5 and b[s] == 0x2F:
                v = int.from_bytes(b[s + 1:s + 5], "little")
                out["width"] = (v & 0x3FFF) + 1
                out["height"] = ((v >> 14) & 0x3FFF) + 1
                out["channels"] = 4 if (v >> 28) & 1 else 3
                return out
            if tag == b"VP8 " and e - s >= 10 \
                    and b[s + 3:s + 6] == b"\x9d\x01\x2a":
                out["width"] = int.from_bytes(
                    b[s + 6:s + 8], "little") & 0x3FFF
                out["height"] = int.from_bytes(
                    b[s + 8:s + 10], "little") & 0x3FFF
                out["channels"] = 3
                return out
    except (ValueError, struct.error, IndexError):
        pass                           # header-only parse stays lenient
    return out


# ---------------------------------------------------------------- encoder

def _emit_flat256(bw: _Bw, alphabet: int) -> None:
    """Normal prefix code: symbols 0..255 all length 8 (a complete
    8-bit code; any trailing length/distance symbols get length 0).
    Emitted via the code-length code {8:1, 16:2, 18:2}."""
    bw.bits(0, 1)                                     # not simple
    bw.bits(12 - 4, 4)                                # 12 CL lengths
    cl = {17: 0, 18: 2, 0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0,
          16: 2, 6: 0, 7: 0, 8: 1}
    for i in range(12):
        bw.bits(cl[_CL_ORDER[i]], 3)
    bw.bits(0, 1)                                     # no max_symbol
    # canonical CL code: 8 -> '0'; 16 -> '10'; 18 -> '11'
    bw.code(0, 1)                                     # literal length 8
    reps, rem = divmod(255, 6)
    for _ in range(reps):                             # 16: repeat prev 6x
        bw.code(0b10, 2)
        bw.bits(3, 2)                                 # 3 + extra = 6
    if rem:
        if rem < 3:
            raise AssertionError("unreachable: 255 = 6k + 3")
        bw.code(0b10, 2)
        bw.bits(rem - 3, 2)
    if alphabet > 256:
        zeros = alphabet - 256                        # 24 length codes
        bw.code(0b11, 2)                              # 18: zero run
        bw.bits(zeros - 11, 7)


def _emit_simple1(bw: _Bw, sym: int) -> None:
    bw.bits(1, 1)                                     # simple
    bw.bits(0, 1)                                     # one symbol
    if sym < 2:
        bw.bits(0, 1)
        bw.bits(sym, 1)
    else:
        bw.bits(1, 1)
        bw.bits(sym, 8)


def _emit_literal_image(bw: _Bw, argb, const_alpha,
                        level0: bool = False) -> None:
    """Entropy-image body shared by the main image and sub-images:
    no color cache, flat literal codes, unused distance code. Only
    the level-0 (main) image carries the meta-prefix-codes bit."""
    bw.bits(0, 1)                                     # no color cache
    if level0:
        bw.bits(0, 1)                                 # no meta codes
    _emit_flat256(bw, 280)                            # green
    _emit_flat256(bw, 256)                            # red
    _emit_flat256(bw, 256)                            # blue
    if const_alpha is not None:
        _emit_simple1(bw, const_alpha)                # 0 bits/pixel
    else:
        _emit_flat256(bw, 256)
    _emit_simple1(bw, 0)                              # distance (unused)
    for px in argb:
        bw.code((px >> 8) & 0xFF, 8)
        bw.code((px >> 16) & 0xFF, 8)
        bw.code(px & 0xFF, 8)
        if const_alpha is None:
            bw.code((px >> 24) & 0xFF, 8)


def encode_webp_lossless(px, transform: str | None = None) -> bytes:
    """(h, w, c) uint8 → spec-valid lossless WebP bytes.

    Literal-only entropy coding (flat 8-bit codes — real, complete
    canonical prefix codes, just not tuned), optionally behind ONE
    forward transform to exercise each decoder inverse path:
    ``subtract_green``, ``predictor`` (left-predicts with the spec's
    forced edge rules), ``color`` (constant transform element), or
    ``palette`` (delta-coded color map, packed sub-pixels when <= 16
    colors). Validated against libwebp's decoder in
    tests/test_webp_crossimpl_parity.py.
    """
    payload = _vp8l_payload(px, transform)
    riff_body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) \
        + payload + (b"\x00" if len(payload) & 1 else b"")
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _vp8l_payload(px, transform: str | None = None) -> bytes:
    """Encoder core: pixels → a raw VP8L chunk payload (shared by the
    still-image wrapper above and the ANMF frames of
    :func:`encode_webp_anim`)."""
    import numpy as np

    arr = np.asarray(px, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if not (1 <= w <= _VP8L_MAX_DIM and 1 <= h <= _VP8L_MAX_DIM):
        raise ValueError("VP8L dimensions out of range")
    has_alpha = c == 4
    if c == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif c not in (3, 4):
        raise ValueError("expected 1, 3, or 4 channels")
    a = (arr[..., 3].astype(np.uint32) if has_alpha
         else np.full((h, w), 255, np.uint32))
    argb = ((a << 24) | (arr[..., 0].astype(np.uint32) << 16)
            | (arr[..., 1].astype(np.uint32) << 8)
            | arr[..., 2].astype(np.uint32)).reshape(-1).tolist()

    bw = _Bw()
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if has_alpha else 0, 1)
    bw.bits(0, 3)                                     # version

    const_alpha = None if has_alpha else 0xFF
    if transform == "subtract_green":
        bw.bits(1, 1)
        bw.bits(2, 2)
        for i, p in enumerate(argb):
            g = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) - g) & 0xFF
            b = ((p & 0xFF) - g) & 0xFF
            argb[i] = (p & 0xFF00FF00) | (r << 16) | b
    elif transform == "predictor":
        bw.bits(1, 1)
        bw.bits(0, 2)
        bits = 9                                      # 512-pixel blocks
        bw.bits(bits - 2, 3)
        sw, sh = _subsample(w, bits), _subsample(h, bits)
        sub = [0xFF000000 | (1 << 8)] * (sw * sh)     # mode 1 = L
        bw2_pixels = list(argb)
        out = list(argb)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if i == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = bw2_pixels[i - 1]
                elif x == 0:
                    pred = bw2_pixels[i - w]
                else:
                    pred = bw2_pixels[i - 1]          # mode 1
                out[i] = _sub_px(bw2_pixels[i], pred)
        argb = out
        _emit_literal_image(bw, sub, None)
    elif transform == "color":
        bw.bits(1, 1)
        bw.bits(1, 2)
        bits = 9
        bw.bits(bits - 2, 3)
        g2r, g2b, r2b = 37, 228, 12                   # arbitrary element
        sw, sh = _subsample(w, bits), _subsample(h, bits)
        sub = [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r] * (sw * sh)
        for i, p in enumerate(argb):
            green = _s8((p >> 8) & 0xFF)
            red0 = (p >> 16) & 0xFF
            nr = (red0 - ((_s8(g2r) * green) >> 5)) & 0xFF
            nb = ((p & 0xFF) - ((_s8(g2b) * green) >> 5)
                  - ((_s8(r2b) * _s8(red0)) >> 5)) & 0xFF
            argb[i] = (p & 0xFF00FF00) | (nr << 16) | nb
        _emit_literal_image(bw, sub, None)
    elif transform == "palette":
        colors = []
        index = {}
        for p in argb:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise ValueError("palette transform needs <= 256 colors")
        bw.bits(1, 1)
        bw.bits(3, 2)
        nc = len(colors)
        bw.bits(nc - 1, 8)
        deltas = [colors[0]] + [_sub_px(colors[i], colors[i - 1])
                                for i in range(1, nc)]
        _emit_literal_image(bw, deltas, None)
        wbits = (0 if nc > 16 else 1 if nc > 4 else 2 if nc > 2 else 3)
        ppb = 1 << wbits
        bitw = 8 >> wbits
        subw = _subsample(w, wbits)
        packed = [0] * (subw * h)
        for y in range(h):
            for x in range(w):
                packed[y * subw + (x >> wbits)] |= \
                    index[argb[y * w + x]] << (bitw * (x % ppb)) << 8
        argb = [0xFF000000 | p for p in packed]
        w = subw
        const_alpha = 0xFF
    elif transform is not None:
        raise ValueError(f"unknown encode transform {transform!r}")
    bw.bits(0, 1)                                     # end of transforms
    _emit_literal_image(bw, argb, const_alpha, level0=True)
    return bw.done()


def _sub_px(a: int, b: int) -> int:
    """Per-channel mod-256 pixel subtraction (forward transforms)."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


# ------------------------------------------------------- animated WebP

def decode_webp_frames(b: bytes):
    """FULL animated-WebP walk (the public WebP container spec,
    VP8X + ANIM + ANMF): each lossless (VP8L) frame decodes through
    :func:`decode_vp8l` and composites onto an RGBA canvas honoring
    the ANMF blend bit (unset = straight-alpha over, set = replace)
    and disposal bit (1 = clear the frame rectangle). Disposal fills
    with TRANSPARENT BLACK, matching libwebp's AnimDecoder and every
    browser (the spec nominally says "background color" but the
    reference implementation ignores the ANIM background for
    compositing). Returns ``(frames, start_timestamps_ms)`` — canvas
    snapshots (h, w, 4) and cumulative frame START times (the
    GIF/APNG convention of :func:`_video_frames_bytes`). Lossy (VP8)
    frames raise ``NotImplementedError``; a non-animated WebP raises
    ValueError.
    """
    import numpy as np

    from meza_spark.llm.multimodal import MAX_DECODE_PIXELS, _check_pixels

    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    canvas_wh = None
    anim = False
    anmfs = []
    for tag, s, e in _webp_chunks(b):
        if tag == b"VP8X" and e - s >= 10:
            canvas_wh = (1 + int.from_bytes(b[s + 4:s + 7], "little"),
                         1 + int.from_bytes(b[s + 7:s + 10], "little"))
        elif tag == b"ANIM":
            anim = True
        elif tag == b"ANMF" and e - s >= 16:
            anmfs.append((s, e))
    if not anim or canvas_wh is None:
        raise ValueError("not an animated WebP (no VP8X+ANIM)")
    if not anmfs:
        raise ValueError("animated WebP with no frames")
    w, h = canvas_wh
    _check_pixels(h, w, "animated WebP")
    if len(anmfs) * w * h > MAX_DECODE_PIXELS:
        raise ValueError("animated WebP exceeds the total-pixel "
                         "decode budget")
    canvas = np.zeros((h, w, 4), np.uint8)
    frames, stamps = [], []
    t = 0
    for s, e in anmfs:
        x0 = 2 * int.from_bytes(b[s:s + 3], "little")
        y0 = 2 * int.from_bytes(b[s + 3:s + 6], "little")
        fw = 1 + int.from_bytes(b[s + 6:s + 9], "little")
        fh = 1 + int.from_bytes(b[s + 9:s + 12], "little")
        dur = int.from_bytes(b[s + 12:s + 15], "little")
        flags = b[s + 15]
        if x0 + fw > w or y0 + fh > h:
            raise ValueError("ANMF frame exceeds the canvas")
        rgba = None
        pos = s + 16
        while pos + 8 <= e:                    # frame's image chunks
            tag = b[pos:pos + 4]
            sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
            if pos + 8 + sz > e:
                raise ValueError("truncated ANMF sub-chunk")
            if tag == b"VP8L":
                px = decode_vp8l(b[pos + 8:pos + 8 + sz])
                if px.shape[:2] != (fh, fw):
                    raise ValueError("ANMF dims disagree with VP8L")
                if px.shape[2] == 3:
                    px = np.dstack([px, np.full((fh, fw), 255, np.uint8)])
                rgba = px
            elif tag == b"VP8 ":
                raise NotImplementedError(
                    "lossy VP8 animation frame needs a decoder= plugin")
            pos += 8 + sz + (sz & 1)
        if rgba is None:
            raise ValueError("ANMF frame with no image chunk")
        region = canvas[y0:y0 + fh, x0:x0 + fw]
        if flags & 0x02:                       # do-not-blend: replace
            region[:] = rgba
        else:                                  # straight-alpha over
            fa = rgba[:, :, 3:4].astype(np.float64) / 255.0
            ba = region[:, :, 3:4].astype(np.float64) / 255.0
            oa = fa + ba * (1 - fa)
            safe = np.where(oa == 0, 1.0, oa)
            orgb = (rgba[:, :, :3] * fa
                    + region[:, :, :3] * ba * (1 - fa)) / safe
            region[:, :, :3] = np.clip(np.round(orgb), 0,
                                       255).astype(np.uint8)
            region[:, :, 3] = np.clip(np.round(oa[:, :, 0] * 255), 0,
                                      255).astype(np.uint8)
        frames.append(canvas.copy())
        stamps.append(t)                       # frame START time (the
        t += dur                               # GIF/APNG convention)
        if flags & 0x01:                       # dispose: clear rect
            canvas[y0:y0 + fh, x0:x0 + fw] = 0
    return frames, stamps


def encode_webp_anim(frames, delays_ms=None, disposals=None,
                     blends=None, offsets=None, canvas=None) -> bytes:
    """RGBA/RGB frames → animated WebP (VP8X + ANIM + ANMF with VP8L
    lossless frame payloads) — the fixture muxer for
    :func:`decode_webp_frames`. ``blends[i]`` True = alpha-blend
    (flag bit CLEAR), ``disposals[i]`` True = clear the rect after
    display. Frame offsets must be even (the ANMF fields store
    coordinates divided by 2)."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    n = len(frames)
    delays_ms = delays_ms or [40] * n
    disposals = disposals or [False] * n
    blends = blends or [False] * n
    offsets = offsets or [(0, 0)] * n
    if canvas is None:
        canvas = (max(o[0] + f.shape[1] for o, f in zip(offsets, frames)),
                  max(o[1] + f.shape[0] for o, f in zip(offsets, frames)))
    cw, ch = canvas
    has_alpha = any(f.ndim == 3 and f.shape[2] == 4 for f in frames)
    vp8x = bytes([(0x10 if has_alpha else 0) | 0x02]) + b"\x00" * 3 \
        + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    body = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = b"\x00" * 4 + struct.pack("<H", 0)      # bg color + loop=∞
    body += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for f, d, disp, blend, (x0, y0) in zip(frames, delays_ms, disposals,
                                           blends, offsets):
        if x0 % 2 or y0 % 2:
            raise ValueError("ANMF offsets must be even")
        fh, fw = f.shape[:2]
        payload = _vp8l_payload(f)
        sub = b"VP8L" + struct.pack("<I", len(payload)) + payload \
            + (b"\x00" if len(payload) & 1 else b"")
        hdr = (x0 // 2).to_bytes(3, "little") \
            + (y0 // 2).to_bytes(3, "little") \
            + (fw - 1).to_bytes(3, "little") \
            + (fh - 1).to_bytes(3, "little") \
            + int(d).to_bytes(3, "little") \
            + bytes([(0 if blend else 0x02) | (0x01 if disp else 0)])
        anmf = hdr + sub
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf \
            + (b"\x00" if len(anmf) & 1 else b"")
    riff_body = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
