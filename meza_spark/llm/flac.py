"""FLAC codec — pure stdlib + numpy, from the public format spec
(RFC 9639 / xiph.org FLAC format): a COMPLETE decoder for all four
subframe types (CONSTANT / VERBATIM / FIXED 0-4 / LPC up to order 32),
Rice-coded residual partitions with both 4- and 5-bit parameter widths
and raw-bits escapes, wasted-bits shifts, all four channel
decorrelations (independent, left/side, right/side, mid/side), UTF-8
coded frame numbers, and the full integrity ladder — per-header CRC-8,
per-frame CRC-16, and the STREAMINFO MD5 signature over the decoded
samples — plus a fixture ENCODER that can be forced down every one of
those paths.

FLAC is fully algorithmic (no empirical probability tables), so the
whole codec derives from the spec; the three embedded checksums mean a
decoded stream whose CRC-8/CRC-16/MD5 all verify was read the way its
encoder meant it. Everything is row-local and budget-gated
(MAX_AUDIO_BYTES before any allocation).
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["decode_flac", "encode_flac"]

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFS = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1),
                4: (4, -6, 4, -1)}


def _crc_tables():
    t8, t16 = [], []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
        t8.append(c)
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
        t16.append(c)
    return tuple(t8), tuple(t16)


_CRC8_TABLE, _CRC16_TABLE = _crc_tables()


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0
    (table-driven; check value crc8(b"123456789") == 0xF4)."""
    crc = 0
    t = _CRC8_TABLE
    for byte in data:
        crc = t[crc ^ byte]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0
    (table-driven; check value crc16(b"123456789") == 0xFEE8)."""
    crc = 0
    t = _CRC16_TABLE
    for byte in data:
        crc = ((crc << 8) & 0xFF00) ^ t[(crc >> 8) ^ byte]
    return crc


class _BrMSB:
    """MSB-first bit reader (FLAC's big-endian bit packing)."""

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
                raise ValueError("truncated FLAC stream")
            self.acc = (self.acc << 8) | self.d[self.pos]
            self.pos += 1
            self.nbits += 8
        v = (self.acc >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1
        return v

    def sread(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self, limit: int = 1 << 20) -> int:
        # Scan whole buffered chunks for the terminating 1-bit via
        # bit_length instead of per-bit read(1) calls: the top valid
        # bit of ``acc`` sits at position nbits-1, so the run of
        # leading zeros is nbits - acc.bit_length().
        q = 0
        while True:
            if self.nbits == 0:
                if self.pos >= self.n:
                    raise ValueError("truncated FLAC stream")
                self.acc = self.d[self.pos]
                self.pos += 1
                self.nbits = 8
            if self.acc == 0:
                q += self.nbits
                self.nbits = 0
                if q > limit:
                    raise ValueError(
                        "FLAC unary run exceeds sanity bound")
                continue
            lead = self.nbits - self.acc.bit_length()
            q += lead
            if q > limit:
                raise ValueError("FLAC unary run exceeds sanity bound")
            self.nbits -= lead + 1
            self.acc &= (1 << self.nbits) - 1
            return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def byte_pos(self) -> int:
        if self.nbits % 8:
            raise ValueError("FLAC reader not byte-aligned")
        return self.pos - self.nbits // 8


class _BwMSB:
    """MSB-first bit writer (inverse of :class:`_BrMSB`)."""

    __slots__ = ("acc", "n", "out")

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def swrite(self, v: int, k: int) -> None:
        self.write(v & ((1 << k) - 1), k)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def pad(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def done(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _utf8_coded(v: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame/sample numbers (up to 36
    bits, 7 bytes max)."""
    if v < 0x80:
        return bytes([v])
    out = []
    for nbytes in range(2, 8):
        if v < (1 << (nbytes * 5 + 1)) or nbytes == 7:
            lead = (0xFF << (8 - nbytes)) & 0xFF
            shift = 6 * (nbytes - 1)
            first = lead | ((v >> shift) & ((1 << (7 - nbytes)) - 1))
            out.append(first)
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((v >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode(br: _BrMSB) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for i in range(7):
        if not (b0 >> (7 - i)) & 1:
            break
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad FLAC coded number")
    v = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _BrMSB, blocksize: int, order: int):
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide "
                         "the block size")
    out = []
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC predictor order exceeds partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * count)
            else:
                out.extend(br.sread(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _write_residual(bw: _BwMSB, res, order: int, blocksize: int,
                    porder: int = 0, param: int | None = None,
                    method: int = 0, escape_raw: int | None = None):
    bw.write(method, 2)
    pbits = 4 + method
    escape = (1 << pbits) - 1
    bw.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        part = res[idx:idx + count]
        idx += count
        if escape_raw is not None:
            bw.write(escape, pbits)
            bw.write(escape_raw, 5)
            if escape_raw:
                for r in part:
                    bw.swrite(r, escape_raw)
            continue
        if param is None:
            # smallest parameter that keeps every unary quotient short
            mx = max((abs(r) for r in part), default=0)
            k = 0
            while (mx >> k) > 7:
                k += 1
            k = min(k, escape - 1)
        else:
            k = param
        bw.write(k, pbits)
        for r in part:
            v = (r << 1) if r >= 0 else ((-r) << 1) - 1
            bw.unary(v >> k)
            bw.write(v & ((1 << k) - 1), k)


def _fixed_reconstruct(warm, res, order):
    """Exact FIXED-predictor inversion as ``order`` cumulative sums.

    A FIXED subframe's residual is the order-th difference of the
    samples, so reconstruction is repeated prefix summation seeded by
    the warm-up samples' difference ladder (np.diff(warm, n=j)[0] is
    the j-th difference at position j). int64 numpy cumsums are exact
    under the per-level magnitude bound checked below; a stream whose
    residual magnitudes could overflow (only possible for invalid
    streams — valid samples are bounded by bps+order bits) returns
    None and the caller runs the arbitrary-precision Python loop, so
    behavior is bit-identical for every input."""
    if order == 0:
        return list(res)
    import numpy as np
    n = len(res) + 1
    try:
        cur = np.asarray(res, dtype=np.int64)
        w = np.asarray(warm, dtype=np.int64)
    except OverflowError:
        return None
    for j in range(order - 1, -1, -1):
        seed = int(np.diff(w, n=j)[0]) if j else int(w[0])
        if cur.size:
            mx = max(int(cur.max()), -int(cur.min()))
        else:
            mx = 0
        if mx * n + abs(seed) >= (1 << 62):
            return None
        cur = np.concatenate(([seed], cur)).cumsum()
    return cur.tolist()


def _decode_subframe(br: _BrMSB, blocksize: int, bps: int):
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:                                   # CONSTANT
        out = [br.sread(eff)] * blocksize
    elif stype == 1:                                 # VERBATIM
        out = [br.sread(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:                           # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("FLAC fixed order exceeds block size")
        warm = [br.sread(eff) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = _fixed_reconstruct(warm, res, order)
        if out is None:                              # hostile magnitudes
            out = list(warm)
            coefs = _FIXED_COEFS[order]
            for r in res:
                out.append(r + sum(c * out[-1 - i]
                                   for i, c in enumerate(coefs)))
    elif stype >= 32:                                # LPC
        order = (stype & 31) + 1
        if order > blocksize:
            raise ValueError("FLAC LPC order exceeds block size")
        out = [br.sread(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = br.sread(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.sread(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        for r in res:
            pred = sum(c * out[-1 - i] for i, c in enumerate(coefs))
            out.append(r + (pred >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(b: bytes, verify_md5: bool = True) -> dict:
    """Full FLAC decode → the shared audio-stats dict (sample_rate /
    channels / n_samples / duration_ms / mean / rms / peak over
    normalized samples, matching the WAV/AIFF/.au decoders).

    Every frame's CRC-8 (header) and CRC-16 (whole frame) are
    verified, and when STREAMINFO carries a non-zero MD5 signature
    the decoded samples must hash to it (``verify_md5=False`` skips
    only the MD5). Unsupported/reserved bitstream constructs raise
    skippable ``ValueError``.
    """
    import numpy as np

    from meza_spark.llm.multimodal import MAX_AUDIO_BYTES, _audio_stats

    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    if len(b) > MAX_AUDIO_BYTES:
        raise ValueError("FLAC payload exceeds the audio byte budget")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(b):
        last, typ = b[pos] & 0x80, b[pos] & 0x7F
        ln = int.from_bytes(b[pos + 1:pos + 4], "big")
        if pos + 4 + ln > len(b):
            raise ValueError("truncated FLAC metadata block")
        if typ == 0:
            streaminfo = b[pos + 4:pos + 4 + ln]
        elif typ == 127:
            raise ValueError("invalid FLAC metadata block type")
        pos += 4 + ln
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC without STREAMINFO")
    packed = int.from_bytes(streaminfo[10:18], "big")
    si_rate = packed >> 44
    si_channels = ((packed >> 41) & 7) + 1
    si_bps = ((packed >> 36) & 0x1F) + 1
    si_total = packed & ((1 << 36) - 1)
    md5 = streaminfo[18:34]
    if si_rate == 0:
        raise ValueError("FLAC STREAMINFO with zero sample rate")
    if si_total and si_total * si_channels * 4 > MAX_AUDIO_BYTES:
        raise ValueError("FLAC exceeds the decoded-audio budget")

    channels_out = None
    chunks = []                        # per-frame (blocksize, nch)
    #                                    int32 arrays — numpy, not
    #                                    boxed-int lists, and 4 bytes
    #                                    per element to MATCH the
    #                                    budget's ×4 multiplier, so
    #                                    real memory tracks the budget
    #                                    (review find r8; advice r9).
    #                                    FLAC samples are ≤32 bits by
    #                                    spec, so int32 is lossless.
    total = 0
    hasher = hashlib.md5() if verify_md5 else None
    while pos < len(b):
        frame_start = pos
        br = _BrMSB(b, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        br.read(1)                                   # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        _utf8_decode(br)                             # frame/sample no.
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _RATE_CODES:
            rate = _RATE_CODES[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            raise ValueError("invalid FLAC sample rate code")
        # RFC 9639 §9.1.3: a frame's explicit rate code must agree
        # with STREAMINFO — mirror the channel-count check so the
        # returned stats (keyed to si_rate) can't silently diverge
        # from what any frame declared (advice fix, r9)
        if rate != si_rate:
            raise ValueError("FLAC frame rate disagrees w/ STREAMINFO")
        if ch_code <= 7:
            nch, decor = ch_code + 1, None
        elif ch_code <= 10:
            nch, decor = 2, ch_code
        else:
            raise ValueError("reserved FLAC channel assignment")
        bps = si_bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if bps is None:
            raise ValueError("reserved FLAC sample size code")
        hdr_end = br.byte_pos() if br.nbits % 8 == 0 else None
        if hdr_end is None:
            raise ValueError("FLAC header not byte-aligned")
        if _crc8(b[frame_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if si_total and total + blocksize > si_total:
            raise ValueError("FLAC frames exceed STREAMINFO total")
        if (total + blocksize) * nch * 4 > MAX_AUDIO_BYTES:
            raise ValueError("FLAC exceeds the decoded-audio budget")

        chans = []
        for ci in range(nch):
            sub_bps = bps
            if (decor == 8 and ci == 1) or (decor == 9 and ci == 0) \
                    or (decor == 10 and ci == 1):
                sub_bps += 1                         # the side channel
            chans.append(_decode_subframe(br, blocksize, sub_bps))
        br.align()
        crc_end = br.byte_pos()
        if crc_end + 2 > len(b):
            raise ValueError("truncated FLAC frame footer")
        if _crc16(b[frame_start:crc_end]) != \
                struct.unpack(">H", b[crc_end:crc_end + 2])[0]:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = crc_end + 2

        if decor == 8:                               # left/side
            left = chans[0]
            chans = [left, [l - s for l, s in zip(left, chans[1])]]
        elif decor == 9:                             # right/side
            right = chans[1]
            chans = [[r + s for r, s in zip(right, chans[0])], right]
        elif decor == 10:                            # mid/side
            left, right = [], []
            for m, s in zip(chans[0], chans[1]):
                mm2 = (m << 1) | (s & 1)
                left.append((mm2 + s) >> 1)
                right.append((mm2 - s) >> 1)
            chans = [left, right]
        if channels_out is None:
            channels_out = nch
        elif nch != channels_out:
            raise ValueError("FLAC channel count changes mid-stream")
        frame_arr = np.empty((blocksize, nch), dtype=np.int32)
        for ci in range(nch):
            # hostile LPC coefficients can blow decoded Python ints
            # past any fixed width — reject as a skippable ValueError
            # instead of an uncaught numpy OverflowError
            try:
                col = np.asarray(chans[ci], dtype=np.int64)
            except OverflowError:
                raise ValueError("FLAC decoded sample out of range")
            if col.size and (int(col.min()) < -(1 << 31)
                             or int(col.max()) > (1 << 31) - 1):
                raise ValueError("FLAC decoded sample exceeds 32 bits")
            frame_arr[:, ci] = col
        chunks.append(frame_arr)
        total += blocksize
        if hasher is not None:
            nbytes = (bps + 7) // 8
            flat = frame_arr.reshape(-1)
            le = np.zeros((flat.size, nbytes), np.uint8)
            for byte_i in range(nbytes):
                le[:, byte_i] = (flat >> (8 * byte_i)) & 0xFF
            hasher.update(le.tobytes())

    if channels_out is None:
        raise ValueError("FLAC stream with no frames")
    if si_total and total != si_total:
        raise ValueError("FLAC sample count disagrees with STREAMINFO")
    if hasher is not None and md5 != b"\x00" * 16 \
            and hasher.digest() != md5:
        raise ValueError("FLAC MD5 signature mismatch — corrupt "
                         "stream or decoder divergence")
    arr = np.concatenate(chunks).reshape(-1).astype(np.float64)
    arr /= float(1 << (si_bps - 1))
    return _audio_stats(arr, si_rate, channels_out)


def encode_flac(samples, rate: int = 44100, bps: int = 16,
                subframe: str = "fixed", order: int = 2,
                partition_order: int = 0, blocksize: int = 4096,
                stereo_mode: str | None = None, wasted: int = 0,
                rice_method: int = 0, escape_raw: int | None = None,
                lpc_coefs=None, lpc_shift: int = 9,
                variable_blocking: bool = False) -> bytes:
    """Samples → a spec-valid FLAC stream (fixture encoder able to
    force every decoder path): ``subframe`` in constant / verbatim /
    fixed / lpc, Rice 4- or 5-bit parameter width (``rice_method``),
    raw-bits escape partitions (``escape_raw``), multi-partition
    residuals, wasted-bits shifts, and stereo decorrelation
    left_side / right_side / mid_side. ``samples`` is (n,) mono or
    (n, channels) int. STREAMINFO carries the true MD5, so
    :func:`decode_flac` cross-checks the whole pipe."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if wasted:
        if ((arr >> wasted) << wasted != arr).any():
            raise ValueError("samples not divisible for wasted bits")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.min() < lo or arr.max() > hi:
        raise ValueError("samples exceed the declared bit depth")

    md5 = hashlib.md5()
    nbytes = (bps + 7) // 8
    flat = arr.reshape(-1)
    le = np.zeros((flat.size, nbytes), np.uint8)
    for byte_i in range(nbytes):
        le[:, byte_i] = (flat >> (8 * byte_i)) & 0xFF
    md5.update(le.tobytes())

    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    # STREAMINFO min/max block size (advice fix, r9): the stream is
    # fixed-chunked at `blocksize`, and RFC 9639 §8.2 exempts the
    # LAST block from the declared minimum — so a multi-block stream
    # correctly declares min == max == blocksize even when the final
    # block is short.  A single-block stream's only block IS the last
    # block (still exempt), but max must cover it and both fields
    # must be ≥ the spec floor of 16.
    if n > blocksize:
        si_min = si_max = blocksize
    else:
        si_min = si_max = max(n, 16)
    si = struct.pack(">HH", si_min, si_max) \
        + b"\x00" * 6 + packed.to_bytes(8, "big") + md5.digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + si

    def encode_channel(bw, xs, eff_bps, mode):
        xs = [int(v) for v in xs]
        # The predictor order must not exceed the block size (the
        # decoder rightly rejects such subframes): a final short block
        # with fewer samples than `order` clamps to its own length —
        # for every block with bs >= order (i.e. every previously
        # decodable stream) the emitted bytes are unchanged.
        # Hypothesis-found: n=65, blocksize=64, fixed order 2 left a
        # 1-sample last block carrying an order-2 subframe.
        border = min(order, len(xs)) if mode in ("fixed", "lpc") \
            else order
        bw.write(0, 1)                               # padding bit
        stype = {"constant": 0, "verbatim": 1,
                 "fixed": 8 + border, "lpc": 32 + (border - 1)}[mode]
        bw.write(stype, 6)
        if wasted:
            bw.write(1, 1)
            bw.unary(wasted - 1)
            xs = [v >> wasted for v in xs]
            ebps = eff_bps - wasted
        else:
            bw.write(0, 1)
            ebps = eff_bps
        if mode == "constant":
            bw.swrite(xs[0], ebps)
            return
        if mode == "verbatim":
            for v in xs:
                bw.swrite(v, ebps)
            return
        if mode == "fixed":
            coefs = _FIXED_COEFS[border]
            shift = 0
        else:
            coefs = list(lpc_coefs or [1 << lpc_shift])[:border]
            while len(coefs) < border:
                coefs.append(0)
            shift = lpc_shift
        for v in xs[:border]:
            bw.swrite(v, ebps)
        res = []
        for i in range(border, len(xs)):
            pred = sum(c * xs[i - 1 - k] for k, c in enumerate(coefs))
            res.append(xs[i] - (pred >> shift if mode == "lpc"
                                else pred))
        if mode == "lpc":
            prec = max(max(abs(c) for c in coefs).bit_length() + 1, 2)
            if prec > 15:
                raise ValueError("LPC coefficients too wide")
            bw.write(prec - 1, 4)
            bw.swrite(shift, 5)
            for c in coefs:
                bw.swrite(c, prec)
        _write_residual(bw, res, border, len(xs), partition_order,
                        method=rice_method, escape_raw=escape_raw)

    fi = 0
    for start in range(0, n, blocksize):
        block = arr[start:start + blocksize]
        bs = block.shape[0]
        bw = _BwMSB()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(1 if variable_blocking else 0, 1)
        bw.write(7, 4)                               # 16-bit bs-1 field
        bw.write(0, 4)                               # rate: STREAMINFO
        decor = None
        if nch == 2 and stereo_mode:
            decor = {"left_side": 8, "right_side": 9,
                     "mid_side": 10}[stereo_mode]
            bw.write(decor, 4)
        else:
            bw.write(nch - 1, 4)
        bw.write(0, 3)                               # bps: STREAMINFO
        bw.write(0, 1)
        for byte in _utf8_coded(start if variable_blocking else fi):
            bw.write(byte, 8)
        bw.write(bs - 1, 16)
        hdr = bw.done()                              # byte-aligned here
        bw = _BwMSB()
        if decor == 8:                               # left/side
            side = block[:, 0] - block[:, 1]
            encode_channel(bw, block[:, 0], bps, subframe)
            encode_channel(bw, side, bps + 1, subframe)
        elif decor == 9:                             # right/side
            side = block[:, 0] - block[:, 1]
            encode_channel(bw, side, bps + 1, subframe)
            encode_channel(bw, block[:, 1], bps, subframe)
        elif decor == 10:                            # mid/side
            s = block[:, 0] - block[:, 1]
            m = (block[:, 0] + block[:, 1]) >> 1
            encode_channel(bw, m, bps, subframe)
            encode_channel(bw, s, bps + 1, subframe)
        else:
            for ci in range(nch):
                encode_channel(bw, block[:, ci], bps, subframe)
        frame = hdr + bytes([_crc8(hdr)]) + bw.done()
        out += frame + struct.pack(">H", _crc16(frame))
        fi += 1
    return bytes(out)
