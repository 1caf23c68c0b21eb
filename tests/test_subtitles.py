"""SRT / WebVTT subtitle extraction (llm/subtitles.py)."""

import pytest

from meza_spark.llm.doctext import extract_document_bytes
from meza_spark.llm.subtitles import (MAX_SUB_BYTES, encode_srt,
                                      encode_vtt,
                                      extract_subtitles_bytes,
                                      parse_srt, parse_vtt,
                                      subtitle_cues)

CUES = [(0, 1500, "first cue"), (1500, 3000, "second\nline two")]


def test_srt_roundtrip():
    assert parse_srt(encode_srt(CUES).decode()) == [
        (1, 0, 1500, "first cue"), (2, 1500, 3000, "second\nline two")]


def test_vtt_roundtrip_with_note():
    got = parse_vtt(encode_vtt(CUES, note="generator meta").decode())
    assert got == [(1, 0, 1500, "first cue"),
                   (2, 1500, 3000, "second\nline two")]


def test_vtt_features():
    raw = ("WEBVTT - title line\n\n"
           "cue-one\n01:02.345 --> 01:03.000 align:start line:0\n"
           "<v Speaker><i>styled</i> text</v>\n\n"
           "NOTE a comment block\nspanning lines\n\n"
           "STYLE\n::cue { color: red }\n\n"
           "7\n00:00:05.000 --> 00:00:06.000\nplain\n")
    got = parse_vtt(raw)
    # numeric cue identifiers override the running index (SRT-style);
    # non-numeric ones ('cue-one') are opaque
    assert got == [(1, 62_345, 63_000, "styled text"),
                   (7, 5_000, 6_000, "plain")]


def test_srt_explicit_counters_kept():
    raw = "17\n00:00:01,000 --> 00:00:02,000\nx\n"
    assert parse_srt(raw) == [(17, 1000, 2000, "x")]


def test_crlf_and_bom():
    raw = b"\xef\xbb\xbf1\r\n00:00:01,000 --> 00:00:02,000\r\nbody\r\n"
    r = extract_subtitles_bytes(raw)
    assert (r["format"], r["text"]) == ("srt", "body")


def test_hour_overflow_timestamps():
    raw = "1\n125:59:59,999 --> 126:00:00,000\nlong stream\n"
    cues = parse_srt(raw)
    assert cues[0][1] == ((125 * 60 + 59) * 60 + 59) * 1000 + 999


def test_srt_malformed_block_raises():
    with pytest.raises(ValueError, match="malformed SRT block"):
        parse_srt("1\nnot a timestamp\ntext\n")


def test_backwards_cue_raises():
    with pytest.raises(ValueError, match="ends before it starts"):
        parse_srt("1\n00:00:02,000 --> 00:00:01,000\nx\n")


def test_budget_and_hostiles():
    with pytest.raises(ValueError, match="empty"):
        extract_subtitles_bytes(b"")
    with pytest.raises(ValueError, match="byte budget"):
        extract_subtitles_bytes(b"WEBVTT" + b"\n" * (MAX_SUB_BYTES + 1))
    with pytest.raises(ValueError, match="not a subtitle"):
        extract_subtitles_bytes(b"plain prose, no cues")


def test_flatten_and_duration():
    r = extract_subtitles_bytes(encode_vtt(CUES))
    assert r == {"format": "vtt", "text": "first cue\nsecond\nline two",
                 "n_parts": 2, "duration_ms": 3000}


# -------------------------------------------------------- doctext route

def test_doctext_routes_vtt_and_srt():
    r = extract_document_bytes(encode_vtt(CUES))
    assert (r["format"], r["n_parts"]) == ("vtt", 2)
    r = extract_document_bytes(encode_srt(CUES))
    assert (r["format"], r["text"].split("\n")[0]) == ("srt", "first cue")


def test_doctext_numbered_prose_stays_txt():
    # a numbered list is NOT an SRT (no timestamp arrow)
    assert extract_document_bytes(b"1\nfirst item\n2\nsecond")["format"] == "txt"


# ---------------------------------------------------------- spark layer

def test_subtitle_cues_operator(spark):
    rows = [(1, bytearray(encode_srt(CUES))),
            (2, bytearray(b"not subtitles")), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {}
    for r in subtitle_cues(df).collect():
        got.setdefault(r["media_id"], []).append(r)
    cues = sorted(got[1], key=lambda r: r["cue_idx"])
    assert [(c["cue_idx"], c["start_ms"], c["end_ms"], c["cue_text"])
            for c in cues] == [(1, 0, 1500, "first cue"),
                               (2, 1500, 3000, "second\nline two")]
    assert got[2][0]["error"] is not None
    assert 3 not in got


def test_subtitle_cues_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "media_id long, payload binary")
    plan = subtitle_cues(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
