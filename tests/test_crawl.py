"""Crawl-frontier operators (llm/crawl.py): robots.txt + sitemaps."""

import pytest

from meza_spark.llm.crawl import (MAX_ROBOTS_BYTES, encode_sitemap,
                                  parse_robots, parse_sitemap_bytes,
                                  robots_allowed, robots_filter,
                                  sitemap_urls)

ROBOTS = """# fixture
User-agent: mezabot
Disallow: /private/
Allow: /private/ok/
Disallow: /*.pdf$

User-agent: *
Disallow: /
"""


@pytest.mark.parametrize("agent,path,want", [
    ("mezabot", "/public/x", True),          # unmatched → allow
    ("mezabot", "/private/x", False),
    ("mezabot", "/private/ok/x", True),      # longer Allow wins
    ("mezabot", "/docs/a.pdf", False),       # wildcard + $ anchor
    ("mezabot", "/docs/a.pdfx", True),       # anchor must hold
    ("mezabot-news", "/private/x", False),   # agent prefix match
    ("otherbot", "/anything", False),        # * fallback group
])
def test_rfc9309_decisions(agent, path, want):
    assert robots_allowed(parse_robots(ROBOTS), agent, path) is want


def test_allow_wins_equal_length_tie():
    g = parse_robots("User-agent: *\nAllow: /p\nDisallow: /p\n")
    assert robots_allowed(g, "any", "/p") is True


def test_empty_disallow_allows_all():
    g = parse_robots("User-agent: *\nDisallow:\n")
    assert robots_allowed(g, "any", "/anything") is True


def test_stacked_agents_share_group():
    g = parse_robots("User-agent: a\nUser-agent: b\nDisallow: /x\n")
    assert robots_allowed(g, "a", "/x/1") is False
    assert robots_allowed(g, "b", "/x/1") is False


def test_no_matching_group_allows():
    g = parse_robots("User-agent: otherbot\nDisallow: /\n")
    assert robots_allowed(g, "mezabot", "/x") is True


def test_robots_budgets():
    with pytest.raises(ValueError, match="byte budget"):
        parse_robots("x" * (MAX_ROBOTS_BYTES + 1))
    many = "User-agent: *\n" + "Disallow: /x\n" * 10_001
    with pytest.raises(ValueError, match="rule count"):
        parse_robots(many)


# ------------------------------------------------------------ sitemaps

ENTRIES = [("http://x/1", "2024-01-01", "daily", "0.8"),
           ("http://x/2", None, None, None)]


@pytest.mark.parametrize("gz", [False, True])
def test_sitemap_roundtrip(gz):
    r = parse_sitemap_bytes(encode_sitemap(ENTRIES, gz=gz))
    assert r == {"kind": "urlset", "entries": ENTRIES}


def test_sitemap_index():
    b = encode_sitemap([("http://x/s1.xml", None, None, None)],
                       index=True)
    assert parse_sitemap_bytes(b) == {
        "kind": "index", "entries": [("http://x/s1.xml", None, None,
                                      None)]}


def test_sitemap_without_namespace_parses():
    raw = (b"<?xml version='1.0'?><urlset>"
           b"<url><loc>http://n/1</loc></url></urlset>")
    assert parse_sitemap_bytes(raw)["entries"] == [
        ("http://n/1", None, None, None)]


def test_sitemap_hostiles():
    with pytest.raises(ValueError, match="empty"):
        parse_sitemap_bytes(b"")
    with pytest.raises(ValueError, match="bad sitemap XML"):
        parse_sitemap_bytes(b"<urlset><url>")
    with pytest.raises(ValueError, match="not a sitemap root"):
        parse_sitemap_bytes(b"<html></html>")
    with pytest.raises(ValueError, match="bad gzip"):
        parse_sitemap_bytes(b"\x1f\x8b\x08\x00junk")


def test_sitemap_escaped_urls_roundtrip():
    url = "http://x/?a=1&b=<2>"
    r = parse_sitemap_bytes(encode_sitemap([(url, None, None, None)]))
    assert r["entries"][0][0] == url


# ---------------------------------------------------------- spark layer

def test_robots_filter_operator(spark):
    rows = [(1, ROBOTS, "/private/x"), (2, ROBOTS, "/public/x"),
            (3, None, "/x"), (4, "Disallow: [", "/x")]
    df = spark.createDataFrame(
        rows, "id long, robots_txt string, path string")
    got = {r["id"]: r["allowed"]
           for r in robots_filter(df, agent="mezabot").collect()}
    # id=4: the stray Disallow has no User-agent line, so it belongs
    # to NO group and the default-allow applies
    assert got == {1: False, 2: True, 3: True, 4: True}


def test_sitemap_urls_operator(spark):
    rows = [(1, bytearray(encode_sitemap(ENTRIES))),
            (2, bytearray(b"junk")), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {}
    for r in sitemap_urls(df).collect():
        got.setdefault(r["media_id"], []).append(r)
    rows1 = sorted(got[1], key=lambda r: r["url_idx"])
    assert [(r["loc"], r["lastmod"], r["changefreq"], r["priority"])
            for r in rows1] == ENTRIES
    assert got[2][0]["error"] is not None
    assert 3 not in got


def test_crawl_operators_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "media_id long, payload binary")
    plan = sitemap_urls(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
