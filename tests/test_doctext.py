"""Unified document dispatch (round 9): magic-byte routing across
the whole content tier, the gzip layer, honest gates for media and
binary, and the Spark operator."""

import gzip

import pytest

import meza_spark.llm.doctext as D
from meza_spark.llm.doctext import document_text, extract_document_bytes
from meza_spark.llm.office import encode_docx, encode_epub
from meza_spark.llm.pdf import encode_pdf
from meza_spark.llm.rtf import encode_rtf

T = "Dispatch me to the right tier, please & thanks <ok>."


def test_routes_by_magic_not_extension():
    assert extract_document_bytes(encode_pdf([T]))["format"] == "pdf"
    assert extract_document_bytes(encode_docx([T]))["format"] == "docx"
    assert extract_document_bytes(encode_epub([T]))["format"] == "epub"
    assert extract_document_bytes(encode_rtf([T]))["format"] == "rtf"
    for b in (encode_pdf([T]), encode_docx([T]), encode_rtf([T])):
        assert extract_document_bytes(b)["text"] == T


def test_html_route():
    page = ("<!DOCTYPE html><html><head><title>Ti</title></head>"
            "<body><p>hello world body</p></body></html>").encode()
    r = extract_document_bytes(page)
    assert r["format"] == "html"
    assert r["title"] == "Ti"
    assert r["text"] == "hello world body"
    # leading whitespace before the doctype still routes
    assert extract_document_bytes(b"  \n" + page)["format"] == "html"


def test_txt_and_gzip_routes():
    r = extract_document_bytes(T.encode())
    assert r["format"] == "txt" and r["text"] == T
    assert extract_document_bytes(b"a\nb\nc")["n_parts"] == 3
    r = extract_document_bytes(gzip.compress(T.encode(), mtime=0))
    assert r["format"] == "txt" and r["text"] == T
    r = extract_document_bytes(gzip.compress(encode_rtf([T], title="x"),
                                             mtime=0))
    assert r["format"] == "rtf" and r["text"] == T and r["title"] == "x"


def test_honest_gates():
    with pytest.raises(ValueError, match="empty"):
        extract_document_bytes(b"")
    with pytest.raises(ValueError, match="decode_image"):
        extract_document_bytes(b"\x89PNG\r\n\x1a\n1234")
    with pytest.raises(ValueError, match="NUL bytes"):
        extract_document_bytes(b"text with \x00 inside")
    with pytest.raises(ValueError, match="nested gzip"):
        extract_document_bytes(gzip.compress(gzip.compress(b"x")))
    with pytest.raises(ValueError, match="bad gzip"):
        extract_document_bytes(b"\x1f\x8b\x00broken")


def test_gzip_budgets(monkeypatch):
    monkeypatch.setattr(D, "MAX_GZIP_OUT", 16)
    with pytest.raises(ValueError, match="decompressed budget"):
        extract_document_bytes(gzip.compress(b"y" * 64))
    monkeypatch.setattr(D, "MAX_GZIP_IN", 4)
    with pytest.raises(ValueError, match="byte budget"):
        extract_document_bytes(b"\x1f\x8b" + b"\x00" * 16)


def test_truncation_fuzz_never_crashes():
    payloads = [encode_pdf([T]), encode_docx([T]), encode_rtf([T]),
                gzip.compress(T.encode())]
    for b in payloads:
        for n in range(0, len(b), 5):
            try:
                extract_document_bytes(b[:n])
            except ValueError:
                pass


def test_document_text_spark(spark):
    rows = [
        (1, bytearray(encode_pdf([T]))),
        (2, bytearray(encode_docx([T], title="W"))),
        (3, bytearray(encode_rtf([T]))),
        (4, bytearray(gzip.compress(T.encode(), mtime=0))),
        (5, bytearray(b"\xff\xd8\xffJPEG-ish")),
        (6, bytearray(T.encode())),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in document_text(df).collect()}
    assert {out[i]["format"] for i in (1, 2, 3)} == {"pdf", "docx",
                                                     "rtf"}
    for i in (1, 2, 3, 4, 6):
        assert out[i]["text"] == T, i
    assert out[2]["title"] == "W"
    assert out[5]["error"] is not None
    plan = document_text(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
