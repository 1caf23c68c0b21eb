"""Zip-document (DOCX / PPTX / ODT / EPUB) extraction tier — round 9.

Roundtrips through the spec-built fixture encoders, member-inspection
sniffing, budget gates (declared-size bomb, member count, encrypted
members, lying local headers), hostile XML, the Spark operator, and
the real-file pins available on this box (any .docx/.odt the system
ships)."""

import io
import zipfile

import pytest

import meza_spark.llm.office as O
from meza_spark.llm.office import (
    encode_docx, encode_epub, encode_odt, encode_pptx,
    extract_docx_bytes, extract_epub_bytes, extract_odt_bytes,
    extract_office_bytes, extract_pptx_bytes, sniff_zip_doc,
)

P1 = "The quick brown fox & friends <jump> over 3 lazy dogs."
P2 = "Second paragraph with   three spaces and a trailing dot."


# ------------------------------------------------------------ roundtrips

@pytest.mark.parametrize("enc,fmt,sep", [
    (encode_docx, "docx", "\n"),
    (encode_pptx, "pptx", "\n\n"),
    (encode_odt, "odt", "\n"),
    (encode_epub, "epub", "\n\n"),
])
def test_two_part_roundtrip(enc, fmt, sep):
    b = enc([P1, P2], title="My Title")
    r = extract_office_bytes(b)
    assert r["format"] == fmt
    assert r["n_parts"] == 2
    assert r["title"] == "My Title"
    assert r["text"] == P1 + sep + P2


@pytest.mark.parametrize("enc", [encode_docx, encode_pptx,
                                 encode_odt, encode_epub])
def test_untitled_and_single_part(enc):
    r = extract_office_bytes(enc("solo text"))
    assert r["text"] == "solo text"
    # encode_epub synthesizes 'untitled'; the others omit the part
    assert r["title"] in (None, "untitled")


def test_docx_controls_roundtrip():
    """Embedded newlines ride w:br, tabs survive as literal w:t
    bytes (xml:space='preserve'), empty paragraphs survive."""
    r = extract_docx_bytes(encode_docx(["a\nb", "", "c\td", " lead"]))
    assert r["text"] == "a\nb\n\nc\td\n lead"
    assert r["n_paragraphs"] == 4


def test_odt_controls_roundtrip():
    """Tabs and newlines ride text:tab / text:line-break; text:s
    expansion honors the c= count."""
    r = extract_odt_bytes(encode_odt(["a\tb\nc"]))
    assert r["text"] == "a\tb\nc"
    content = (
        "<?xml version=\"1.0\"?><office:document-content "
        "xmlns:office=\"%s\" xmlns:text=\"%s\"><office:body>"
        "<office:text><text:p>a<text:s text:c=\"3\"/>b</text:p>"
        "</office:text></office:body></office:document-content>"
        % (O._NS_ODF_OFFICE, O._NS_ODF_TEXT))
    b = O._zip_parts({
        "mimetype": "application/vnd.oasis.opendocument.text",
        "content.xml": content}, stored_first="mimetype")
    assert extract_odt_bytes(b)["text"] == "a   b"


def test_pptx_slide_numeric_order():
    """slide10.xml must sort AFTER slide2.xml (numeric, not lexical)."""
    b = encode_pptx(["s%d" % i for i in range(1, 12)])
    r = extract_pptx_bytes(b)
    assert r["text"].split("\n\n") == ["s%d" % i for i in range(1, 12)]
    assert r["n_slides"] == 11


def test_epub_spine_order_and_nested_blocks():
    """Spine order (not zip member order) drives the text; nested
    divs/sections add no duplicate breaks."""
    parts = {
        "mimetype": "application/epub+zip",
        "META-INF/container.xml":
            "<?xml version=\"1.0\"?><container xmlns=\"%s\">"
            "<rootfiles><rootfile full-path=\"a/pkg.opf\"/></rootfiles>"
            "</container>" % O._NS_OCF,
        "a/pkg.opf":
            "<?xml version=\"1.0\"?><package xmlns=\"%s\">"
            "<metadata xmlns:dc=\"%s\"><dc:title>B</dc:title></metadata>"
            "<manifest>"
            "<item id=\"x\" href=\"x.xhtml\"/>"
            "<item id=\"y\" href=\"sub/y.xhtml\"/>"
            "</manifest><spine>"
            "<itemref idref=\"y\"/><itemref idref=\"x\"/>"
            "</spine></package>" % (O._NS_OPF, O._NS_DC),
        "a/x.xhtml":
            "<html xmlns=\"%s\"><body><p>second</p></body></html>"
            % O._NS_XHTML,
        "a/sub/y.xhtml":
            "<html xmlns=\"%s\"><body><div><section><p>first</p>"
            "</section></div><p><b>bo</b>ld</p></body></html>"
            % O._NS_XHTML,
    }
    r = extract_epub_bytes(O._zip_parts(parts, stored_first="mimetype"))
    assert r["text"] == "first\nbold\n\nsecond"
    assert r["title"] == "B"


def test_epub_script_style_head_dropped():
    parts = {
        "mimetype": "application/epub+zip",
        "META-INF/container.xml":
            "<?xml version=\"1.0\"?><container xmlns=\"%s\">"
            "<rootfiles><rootfile full-path=\"p.opf\"/></rootfiles>"
            "</container>" % O._NS_OCF,
        "p.opf":
            "<package xmlns=\"%s\"><manifest>"
            "<item id=\"c\" href=\"c.xhtml\"/></manifest>"
            "<spine><itemref idref=\"c\"/></spine></package>" % O._NS_OPF,
        "c.xhtml":
            "<html xmlns=\"%s\"><head><title>drop me</title>"
            "<style>p {{color: red}}</style></head>"
            "<body><p>keep</p><script>var x = 1;</script></body></html>"
            % O._NS_XHTML,
    }
    r = extract_epub_bytes(O._zip_parts(parts, stored_first="mimetype"))
    assert r["text"] == "keep"
    assert r["title"] is None


# ----------------------------------------------------------------- sniff

def test_sniff_all_flavors():
    assert sniff_zip_doc(encode_docx(["x"])) == "docx"
    assert sniff_zip_doc(encode_pptx(["x"])) == "pptx"
    assert sniff_zip_doc(encode_odt(["x"])) == "odt"
    assert sniff_zip_doc(encode_epub(["x"])) == "epub"
    # plain archive
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("readme.txt", "hi")
    assert sniff_zip_doc(buf.getvalue()) == "zip"
    with pytest.raises(ValueError, match="not a zip"):
        sniff_zip_doc(b"%PDF-1.4")


def test_sniff_lockstep_with_media_sniffers():
    """The top-level media sniff reports 'zip' for any PK container;
    the flavor refinement is office.py's member walk."""
    from meza_spark.llm.multimodal import _sniff_format

    assert _sniff_format(encode_docx(["x"])) == "zip"
    assert _sniff_format(encode_epub(["x"])) == "zip"
    assert _sniff_format(b"PK no control bytes") == "unknown"


def test_xlsx_and_ods_route_to_the_spreadsheet_gate():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", "<workbook/>")
    with pytest.raises(ValueError, match="read_xls"):
        extract_office_bytes(buf.getvalue())
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype",
                   "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", "<x/>")
    with pytest.raises(ValueError, match="read_xls"):
        extract_office_bytes(buf.getvalue())


def test_plain_zip_is_not_a_document():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("data.bin", "xx")
    with pytest.raises(ValueError, match="plain zip"):
        extract_office_bytes(buf.getvalue())


# ----------------------------------------------------------- budget gates

def test_declared_size_bomb_fails_before_alloc(monkeypatch):
    """A central directory declaring > MAX_DECOMPRESSED total must
    ValueError WITHOUT reading member data (the tile-grid rule)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", "tiny")
    raw = bytearray(buf.getvalue())
    monkeypatch.setattr(O, "MAX_DECOMPRESSED", 2)
    with pytest.raises(ValueError, match="budget|hostile size"):
        O._open_zip(bytes(raw))


def test_member_count_cap(monkeypatch):
    monkeypatch.setattr(O, "MAX_MEMBERS", 3)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for i in range(4):
            z.writestr("m%d" % i, "x")
    with pytest.raises(ValueError, match="too many members"):
        O._open_zip(buf.getvalue())


def test_container_byte_budget(monkeypatch):
    monkeypatch.setattr(O, "MAX_DOC_BYTES", 8)
    with pytest.raises(ValueError, match="byte budget"):
        O._open_zip(b"PK\x03\x04" + b"\x00" * 32)


def test_encrypted_member_is_an_honest_gate():
    b = encode_docx(["secret"])
    z = zipfile.ZipFile(io.BytesIO(b))
    # flip the encryption flag bit in the central directory record
    import re
    raw = bytearray(b)
    # central-dir file header: PK\x01\x02 ver(2) ver2(2) flags(2)
    i = raw.find(b"PK\x01\x02")
    assert i > 0
    raw[i + 8] |= 0x01
    with pytest.raises(ValueError, match="encrypted zip member"):
        O._open_zip(bytes(raw))
    del z, re


def test_lying_local_header_detected():
    """_read_member enforces the declared size DURING the read."""
    b = encode_docx(["payload"])
    z = O._open_zip(b)
    inf = z.getinfo("word/document.xml")
    inf.file_size -= 5                      # lie: declare less
    with pytest.raises(ValueError,
                       match="larger than its declared|bad zip member"):
        O._read_member(z, "word/document.xml")


def test_missing_member_and_bad_xml():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", "<w:document not closed")
    with pytest.raises(ValueError, match="bad word/document.xml XML"):
        extract_office_bytes(buf.getvalue())
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
    with pytest.raises(ValueError, match="zip member missing"):
        extract_office_bytes(buf2.getvalue())


def test_epub_href_escape_blocked():
    parts = {
        "mimetype": "application/epub+zip",
        "META-INF/container.xml":
            "<container xmlns=\"%s\"><rootfiles>"
            "<rootfile full-path=\"a/p.opf\"/></rootfiles></container>"
            % O._NS_OCF,
        "a/p.opf":
            "<package xmlns=\"%s\"><manifest>"
            "<item id=\"c\" href=\"../../etc/passwd\"/></manifest>"
            "<spine><itemref idref=\"c\"/></spine></package>" % O._NS_OPF,
    }
    with pytest.raises(ValueError, match="escapes the container"):
        extract_epub_bytes(O._zip_parts(parts, stored_first="mimetype"))


def test_truncation_fuzz_never_crashes():
    """Every truncation of every flavor raises ValueError (or
    extracts) — no typed escapes."""
    for enc in (encode_docx, encode_pptx, encode_odt, encode_epub):
        b = enc([P1, P2])
        for n in range(0, len(b), 7):
            try:
                extract_office_bytes(b[:n])
            except ValueError:
                pass


def test_mutation_fuzz_never_crashes():
    import random

    rng = random.Random(99)
    for enc in (encode_docx, encode_epub):
        b = bytearray(enc([P1]))
        for _ in range(300):
            i = rng.randrange(len(b))
            old = b[i]
            b[i] = rng.randrange(256)
            try:
                extract_office_bytes(bytes(b))
            except ValueError:
                pass
            b[i] = old


# ------------------------------------------------------------ spark layer

def test_office_text_spark(spark):
    from meza_spark.llm.office import office_text

    rows = [
        (1, bytearray(encode_docx([P1, P2], title="D"))),
        (2, bytearray(encode_pptx(["s1", "s2"]))),
        (3, bytearray(encode_odt([P1]))),
        (4, bytearray(encode_epub(["c1", "c2"], title="E"))),
        (5, bytearray(b"PK\x03\x04 garbage not a zip")),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in office_text(df).collect()}
    assert out[1]["format"] == "docx"
    assert out[1]["text"] == P1 + "\n" + P2
    assert out[1]["title"] == "D"
    assert out[2]["format"] == "pptx" and out[2]["n_parts"] == 2
    assert out[3]["format"] == "odt" and out[3]["text"] == P1
    assert out[4]["format"] == "epub" and out[4]["title"] == "E"
    assert out[5]["error"] is not None and out[5]["format"] is None
    assert 6 not in out                       # null payload skipped
    # row-local: the plan must contain no Exchange
    plan = out and office_text(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------- real-file pins

_DOCUTILS_ODT = ("/root/.pyenv/versions/3.11.7/lib/python3.11/"
                 "site-packages/docutils/writers/odf_odt/styles.odt")


def test_real_libreoffice_odt_pin():
    """The one real Office document this image ships: docutils'
    styles.odt — produced by a REAL LibreOffice (full OCF layout:
    manifest.rdf, styles.xml, Thumbnails, Configurations2). Pins the
    extraction against the file's actual structure, cross-validating
    the member walk against an independent producer the way the JDK
    suite does for the image codecs."""
    import hashlib
    import os

    if not os.path.exists(_DOCUTILS_ODT):
        pytest.skip("docutils styles.odt not on this image")
    with open(_DOCUTILS_ODT, "rb") as f:
        b = f.read()
    assert sniff_zip_doc(b) == "odt"
    r = extract_office_bytes(b)
    assert r["format"] == "odt"
    assert r["n_parts"] == 25
    assert r["text"].startswith(
        "Table style 0 (rststyle-table-0)")
    assert "Do not change the name of this table" in r["text"]
    assert hashlib.sha256(r["text"].encode()).hexdigest() == (
        _DOCUTILS_ODT_SHA)


_DOCUTILS_ODT_SHA = (
    "d0f053a5f4e4afa27bfeb2f51709d0dde91a6f065f3583a42edd172b789d0fe9")


def test_real_system_documents_if_any():
    """Opportunistic: extract every .docx/.odt/.epub the container OS
    ships (none is guaranteed); assert non-empty text, no crash."""
    import glob

    hits = []
    for pat in ("/usr/share/**/*.docx", "/usr/share/**/*.odt",
                "/usr/share/**/*.epub", "/usr/share/**/*.pptx"):
        hits += glob.glob(pat, recursive=True)
    if not hits:
        pytest.skip("no system Office/EPUB files on this image")
    for path in hits[:20]:
        with open(path, "rb") as f:
            b = f.read()
        try:
            r = extract_office_bytes(b)
        except ValueError:
            continue
        assert isinstance(r["text"], str)
