"""RTF extraction tier (round 9): the group-stack machine against
the public RTF 1.x spec semantics — destinations, escapes, \\uN
fallback accounting, code pages, budgets, hostile fuzz, the Spark
operator, and sniff lockstep."""

import pytest

from meza_spark.llm.rtf import encode_rtf, extract_rtf_bytes


P1 = "Hello & world <1> with (parens) and 100% text."
P2 = "Second paragraph, quite ordinary."


def test_roundtrip_two_paragraphs_and_title():
    r = extract_rtf_bytes(encode_rtf([P1, P2], title="My Ti"))
    assert r["text"] == P1 + "\n" + P2
    assert r["title"] == "My Ti"


def test_roundtrip_escapes_and_controls():
    r = extract_rtf_bytes(encode_rtf(
        ["braces {x} and \\ back", "tab\there\nline"]))
    assert r["text"] == "braces {x} and \\ back\ntab\there\nline"


def test_roundtrip_unicode_and_codepage():
    """é rides \\'e9 (cp1252), € and 中 ride \\uN? with fallback."""
    r = extract_rtf_bytes(encode_rtf(["caf\xe9 € 中"]))
    assert r["text"] == "caf\xe9 € 中"


def test_version_digit_and_raw_newlines_not_text():
    assert extract_rtf_bytes(
        b"{\\rtf1\\ansi x\r\ny\\par z}")["text"] == "xy\nz"


def test_destination_groups_skipped():
    raw = (b"{\\rtf1{\\fonttbl{\\f0 Arial;}}{\\colortbl;\\red1;}"
           b"{\\stylesheet{\\s1 Heading;}}{\\*\\generator Word 11}"
           b"{\\*\\mystery hidden stuff}visible}")
    assert extract_rtf_bytes(raw)["text"] == "visible"


def test_field_result_kept_instruction_hidden():
    raw = (b"{\\rtf1{\\field{\\*\\fldinst HYPERLINK \"http://x\"}"
           b"{\\fldrslt shown link}}}")
    assert extract_rtf_bytes(raw)["text"] == "shown link"


def test_uc_fallback_skip_counts():
    # \uc2: TWO fallback bytes swallowed after \uN
    assert extract_rtf_bytes(
        b"{\\rtf1\\uc2 \\u20013 ab after}")["text"] == "中 after"
    # fallback may be a \'hh escape or a control word, each one unit
    assert extract_rtf_bytes(
        b"{\\rtf1\\uc1 \\u233 \\'3f!}")["text"] == "\xe9!"
    # group pop restores the parent's \uc
    assert extract_rtf_bytes(
        b"{\\rtf1\\uc1 {\\uc3 }\\u65 ?rest}")["text"] == "Arest"


def test_negative_u_and_surrogates():
    # signed-16-bit convention: \u-3977 == U+F077 (private use)
    assert extract_rtf_bytes(
        b"{\\rtf1\\uc1 \\u-3977 ?x}")["text"] == "x"
    # lone surrogate halves are dropped, fallback still swallowed
    assert extract_rtf_bytes(
        b"{\\rtf1\\uc1 \\u-10179 ?y}")["text"] == "y"
    # a PAIR of \uN surrogates combines into the astral code point
    assert extract_rtf_bytes(
        b"{\\rtf1\\uc1 \\u-10179 ?\\u-8704 ?x}")["text"] == "\U0001F600x"
    # encoder side emits the pair form
    assert extract_rtf_bytes(
        encode_rtf(["emoji \U0001F600 and \U0001D11E clef"]))["text"] \
        == "emoji \U0001F600 and \U0001D11E clef"


def test_symbols_table():
    r = extract_rtf_bytes(
        b"{\\rtf1 a\\emdash b\\~c\\-d\\_e}")
    assert r["text"] == "a—b\xa0cd-e"


def test_bin_skips_raw_bytes():
    raw = b"{\\rtf1 a\\bin5 \\pictb}"
    # 5 raw bytes after \bin5's space: '\pict' — NOT parsed as a word
    assert extract_rtf_bytes(raw)["text"] == "ab"


def test_info_without_title_contributes_nothing():
    raw = b"{\\rtf1{\\info{\\author Someone}}body}"
    r = extract_rtf_bytes(raw)
    assert r["text"] == "body"
    assert r["title"] is None


def test_hostile_shapes():
    with pytest.raises(ValueError, match="not an RTF"):
        extract_rtf_bytes(b"plain text")
    with pytest.raises(ValueError, match="nesting too deep"):
        extract_rtf_bytes(b"{\\rtf1" + b"{" * 400 + b"}" * 400 + b"}")
    with pytest.raises(ValueError, match="hex escape"):
        extract_rtf_bytes(b"{\\rtf1 \\'zz}")
    with pytest.raises(ValueError, match="byte budget"):
        import meza_spark.llm.rtf as R
        old = R.MAX_RTF_BYTES
        R.MAX_RTF_BYTES = 4
        try:
            extract_rtf_bytes(b"{\\rtf1 hello}")
        finally:
            R.MAX_RTF_BYTES = old


def test_output_budget(monkeypatch):
    import meza_spark.llm.rtf as R

    monkeypatch.setattr(R, "MAX_TEXT_CHARS", 8)
    with pytest.raises(ValueError, match="output budget"):
        extract_rtf_bytes(b"{\\rtf1 0123456789abcdef}")


def test_truncation_fuzz_never_crashes():
    b = encode_rtf([P1, P2], title="T")
    for n in range(len(b)):
        try:
            extract_rtf_bytes(b[:n])
        except ValueError:
            pass


def test_mutation_fuzz_never_crashes():
    import random

    rng = random.Random(7)
    b = bytearray(encode_rtf(["caf\xe9 € body", P2], title="T"))
    for _ in range(500):
        i = rng.randrange(len(b))
        old = b[i]
        b[i] = rng.randrange(256)
        try:
            extract_rtf_bytes(bytes(b))
        except ValueError:
            pass
        b[i] = old


def test_sniff_lockstep():
    from meza_spark.llm.multimodal import _sniff_format

    assert _sniff_format(encode_rtf(["x"])) == "rtf"
    assert _sniff_format(b"{ \\rtf no}") == "unknown"


def test_rtf_text_spark(spark):
    from meza_spark.llm.rtf import rtf_text

    rows = [
        (1, bytearray(encode_rtf([P1, P2], title="D"))),
        (2, bytearray(b"{\\rtf1 tiny}")),
        (3, bytearray(b"not rtf at all")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in rtf_text(df).collect()}
    assert out[1]["text"] == P1 + "\n" + P2 and out[1]["title"] == "D"
    assert out[2]["text"] == "tiny"
    assert out[3]["error"] is not None
    assert 4 not in out
    plan = rtf_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
