"""Pure-stdlib AES (FIPS-197) — the block cipher PDF standard
security uses for /V 4 (AESV2, AES-128-CBC) and /V 5 (AESV3,
AES-256-CBC) crypt filters (ISO 32000-1/-2 §7.6).

Scope: exactly what the PDF decryptor and its fixture encoder need —
ECB encrypt/decrypt, CBC over whole payloads, and PKCS#7 padding.
The core is the classic 32-bit T-table software construction (four
1 KiB lookup tables folding SubBytes+ShiftRows+MixColumns into one
XOR chain per column — the public design every software AES since
the Rijndael reference uses), because the R6 password hash
(ISO 32000-2 algorithm 2.B) runs thousands of block encryptions per
password and a naive byte-matrix implementation is ~10× too slow
even for fixtures. Tables are COMPUTED from the spec's GF(2^8)
algebra at import, not pasted, so they provably match FIPS-197.

Validated against the FIPS-197 appendix-C vectors (all key sizes)
and the NIST SP 800-38A CBC vectors in tests/test_pdf_heif_svg.py.

A hot 100 TB path would swap in a JVM or native cipher behind the
same call shape; here decryption is row-local inside the Arrow
batch and payloads are small.
"""

from __future__ import annotations

from functools import lru_cache

# ------------------------------------------------------ table generation


def _build_sbox() -> tuple[bytes, bytes]:
    """S-box from the public AES definition (multiplicative inverse
    in GF(2^8) + the §5.1.1 affine transform) — computed, not pasted."""
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by the generator 3 = x ^ (x<<1) with reduction
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = bytearray(256)
    for a in range(256):
        b = inv(a)
        r = 0x63
        for k in range(8):
            bit = ((b >> k) ^ (b >> ((k + 4) % 8))
                   ^ (b >> ((k + 5) % 8)) ^ (b >> ((k + 6) % 8))
                   ^ (b >> ((k + 7) % 8))) & 1
            r ^= bit << k
        sbox[a] = r
    inv_sbox = bytearray(256)
    for a in range(256):
        inv_sbox[sbox[a]] = a
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80,
         0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_t_tables():
    """Encryption tables: T_i[x] is the MixColumns contribution of
    S[x] arriving in byte position i of the column; decryption
    tables U_i likewise over InvS[x] with the 14/9/13/11 row."""
    t = [[0] * 256 for _ in range(4)]
    u = [[0] * 256 for _ in range(4)]
    # T_j byte i = M[i][j] * S[x], M = the MixColumns matrix
    # [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]]; U_j likewise over
    # InvS[x] with the InvMixColumns matrix
    m = ((2, 3, 1, 1), (1, 2, 3, 1), (1, 1, 2, 3), (3, 1, 1, 2))
    mi = ((14, 11, 13, 9), (9, 14, 11, 13),
          (13, 9, 14, 11), (11, 13, 9, 14))
    for x in range(256):
        s = _SBOX[x]
        si = _INV_SBOX[x]
        for j in range(4):
            t[j][x] = ((_gmul(m[0][j], s) << 24)
                       | (_gmul(m[1][j], s) << 16)
                       | (_gmul(m[2][j], s) << 8)
                       | _gmul(m[3][j], s))
            u[j][x] = ((_gmul(mi[0][j], si) << 24)
                       | (_gmul(mi[1][j], si) << 16)
                       | (_gmul(mi[2][j], si) << 8)
                       | _gmul(mi[3][j], si))
    return ([tuple(r) for r in t], [tuple(r) for r in u])


(_T0, _T1, _T2, _T3), (_U0, _U1, _U2, _U3) = _build_t_tables()


def _imc_word(w: int) -> int:
    """InvMixColumns of one column word (for the equivalent inverse
    cipher's transformed round keys)."""
    b0, b1, b2, b3 = w >> 24, (w >> 16) & 255, (w >> 8) & 255, w & 255
    return ((_gmul(14, b0) ^ _gmul(11, b1) ^ _gmul(13, b2)
             ^ _gmul(9, b3)) << 24 \
        | (_gmul(9, b0) ^ _gmul(14, b1) ^ _gmul(11, b2)
           ^ _gmul(13, b3)) << 16 \
        | (_gmul(13, b0) ^ _gmul(9, b1) ^ _gmul(14, b2)
           ^ _gmul(11, b3)) << 8 \
        | (_gmul(11, b0) ^ _gmul(13, b1) ^ _gmul(9, b2)
           ^ _gmul(14, b3)))


# -------------------------------------------------------- key schedule

@lru_cache(maxsize=64)
def _round_keys(key: bytes) -> tuple:
    """Key schedule → tuple of per-round 4-word tuples. Cached: PDF
    decryption reuses one file key across every object."""
    nk = len(key) // 4
    if len(key) % 4 or nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24 or 32 bytes")
    nr = nk + 6
    w = [int.from_bytes(key[4 * i:4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF          # RotWord
            t = ((_SBOX[t >> 24] << 24) | (_SBOX[(t >> 16) & 255] << 16)
                 | (_SBOX[(t >> 8) & 255] << 8) | _SBOX[t & 255])
            t ^= _RCON[i // nk - 1] << 24
        elif nk > 6 and i % nk == 4:
            t = ((_SBOX[t >> 24] << 24) | (_SBOX[(t >> 16) & 255] << 16)
                 | (_SBOX[(t >> 8) & 255] << 8) | _SBOX[t & 255])
        w.append(w[i - nk] ^ t)
    return tuple(tuple(w[4 * r:4 * r + 4]) for r in range(nr + 1))


@lru_cache(maxsize=64)
def _inv_round_keys(key: bytes) -> tuple:
    """Equivalent-inverse-cipher keys: reversed, with InvMixColumns
    applied to the interior rounds."""
    rk = _round_keys(key)
    nr = len(rk) - 1
    out = [rk[nr]]
    for r in range(nr - 1, 0, -1):
        out.append(tuple(_imc_word(w) for w in rk[r]))
    out.append(rk[0])
    return tuple(out)


# ------------------------------------------------------------- core

def _encrypt_block_words(rk, s0, s1, s2, s3):
    t0, t1, t2, t3 = _T0, _T1, _T2, _T3
    k = rk[0]
    s0 ^= k[0]
    s1 ^= k[1]
    s2 ^= k[2]
    s3 ^= k[3]
    nr = len(rk) - 1
    for r in range(1, nr):
        k = rk[r]
        n0 = (t0[s0 >> 24] ^ t1[(s1 >> 16) & 255]
              ^ t2[(s2 >> 8) & 255] ^ t3[s3 & 255] ^ k[0])
        n1 = (t0[s1 >> 24] ^ t1[(s2 >> 16) & 255]
              ^ t2[(s3 >> 8) & 255] ^ t3[s0 & 255] ^ k[1])
        n2 = (t0[s2 >> 24] ^ t1[(s3 >> 16) & 255]
              ^ t2[(s0 >> 8) & 255] ^ t3[s1 & 255] ^ k[2])
        n3 = (t0[s3 >> 24] ^ t1[(s0 >> 16) & 255]
              ^ t2[(s1 >> 8) & 255] ^ t3[s2 & 255] ^ k[3])
        s0, s1, s2, s3 = n0, n1, n2, n3
    sb = _SBOX
    k = rk[nr]
    o0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 255] << 16)
          | (sb[(s2 >> 8) & 255] << 8) | sb[s3 & 255]) ^ k[0]
    o1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 255] << 16)
          | (sb[(s3 >> 8) & 255] << 8) | sb[s0 & 255]) ^ k[1]
    o2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 255] << 16)
          | (sb[(s0 >> 8) & 255] << 8) | sb[s1 & 255]) ^ k[2]
    o3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 255] << 16)
          | (sb[(s1 >> 8) & 255] << 8) | sb[s2 & 255]) ^ k[3]
    return o0, o1, o2, o3


def _decrypt_block_words(ik, s0, s1, s2, s3):
    u0, u1, u2, u3 = _U0, _U1, _U2, _U3
    k = ik[0]
    s0 ^= k[0]
    s1 ^= k[1]
    s2 ^= k[2]
    s3 ^= k[3]
    nr = len(ik) - 1
    for r in range(1, nr):
        k = ik[r]
        n0 = (u0[s0 >> 24] ^ u1[(s3 >> 16) & 255]
              ^ u2[(s2 >> 8) & 255] ^ u3[s1 & 255] ^ k[0])
        n1 = (u0[s1 >> 24] ^ u1[(s0 >> 16) & 255]
              ^ u2[(s3 >> 8) & 255] ^ u3[s2 & 255] ^ k[1])
        n2 = (u0[s2 >> 24] ^ u1[(s1 >> 16) & 255]
              ^ u2[(s0 >> 8) & 255] ^ u3[s3 & 255] ^ k[2])
        n3 = (u0[s3 >> 24] ^ u1[(s2 >> 16) & 255]
              ^ u2[(s1 >> 8) & 255] ^ u3[s0 & 255] ^ k[3])
        s0, s1, s2, s3 = n0, n1, n2, n3
    sb = _INV_SBOX
    k = ik[nr]
    o0 = ((sb[s0 >> 24] << 24) | (sb[(s3 >> 16) & 255] << 16)
          | (sb[(s2 >> 8) & 255] << 8) | sb[s1 & 255]) ^ k[0]
    o1 = ((sb[s1 >> 24] << 24) | (sb[(s0 >> 16) & 255] << 16)
          | (sb[(s3 >> 8) & 255] << 8) | sb[s2 & 255]) ^ k[1]
    o2 = ((sb[s2 >> 24] << 24) | (sb[(s1 >> 16) & 255] << 16)
          | (sb[(s0 >> 8) & 255] << 8) | sb[s3 & 255]) ^ k[2]
    o3 = ((sb[s3 >> 24] << 24) | (sb[(s2 >> 16) & 255] << 16)
          | (sb[(s1 >> 8) & 255] << 8) | sb[s0 & 255]) ^ k[3]
    return o0, o1, o2, o3


import struct as _struct

_W4 = _struct.Struct(">4I")


# -------------------------------------------------------------- modes

def aes_ecb_encrypt(key: bytes, block: bytes) -> bytes:
    """ECB encrypt (the /Perms entry of AES-256 PDFs)."""
    if len(block) % 16:
        raise ValueError("AES ECB input must be 16-byte aligned")
    rk = _round_keys(key)
    out = bytearray(len(block))
    for i in range(0, len(block), 16):
        _W4.pack_into(out, i, *_encrypt_block_words(
            rk, *_W4.unpack_from(block, i)))
    return bytes(out)


def aes_ecb_decrypt(key: bytes, block: bytes) -> bytes:
    if len(block) % 16:
        raise ValueError("AES ECB input must be 16-byte aligned")
    ik = _inv_round_keys(key)
    out = bytearray(len(block))
    for i in range(0, len(block), 16):
        _W4.pack_into(out, i, *_decrypt_block_words(
            ik, *_W4.unpack_from(block, i)))
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt, NO padding (callers pad; the R6 hash and the
    /UE//OE wrapping are exact-multiple by construction)."""
    if len(iv) != 16 or len(data) % 16:
        raise ValueError("AES CBC input must be 16-byte aligned")
    rk = _round_keys(key)
    out = bytearray(len(data))
    p0, p1, p2, p3 = _W4.unpack(iv)
    for i in range(0, len(data), 16):
        b0, b1, b2, b3 = _W4.unpack_from(data, i)
        p0, p1, p2, p3 = _encrypt_block_words(
            rk, b0 ^ p0, b1 ^ p1, b2 ^ p2, b3 ^ p3)
        _W4.pack_into(out, i, p0, p1, p2, p3)
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt, NO padding strip."""
    if len(iv) != 16 or len(data) % 16:
        raise ValueError("AES CBC input must be 16-byte aligned")
    ik = _inv_round_keys(key)
    out = bytearray(len(data))
    p0, p1, p2, p3 = _W4.unpack(iv)
    for i in range(0, len(data), 16):
        c0, c1, c2, c3 = _W4.unpack_from(data, i)
        d0, d1, d2, d3 = _decrypt_block_words(ik, c0, c1, c2, c3)
        _W4.pack_into(out, i, d0 ^ p0, d1 ^ p1, d2 ^ p2, d3 ^ p3)
        p0, p1, p2, p3 = c0, c1, c2, c3
    return bytes(out)


def pkcs7_pad(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def pkcs7_unpad(data: bytes) -> bytes:
    if not data or len(data) % 16:
        raise ValueError("bad AES-CBC payload length")
    n = data[-1]
    if not 1 <= n <= 16 or data[-n:] != bytes([n]) * n:
        raise ValueError("bad AES-CBC padding")
    return data[:-n]
