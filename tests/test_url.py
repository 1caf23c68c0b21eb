"""URL feature extraction units."""

from meza_spark.llm.url import url_features


def test_url_features_parse(spark):
    rows = [
        (1, "https://www.example.co.uk/a/b/c?x=1"),
        (2, "http://sub.site.com/page"),
        (3, "https://10.0.0.1/admin"),
        (4, "ftp://files.example.org/"),
        (5, "not a url"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    out = {r["id"]: r for r in url_features(df).collect()}
    assert out[1]["scheme"] == "https"
    assert out[1]["host"] == "www.example.co.uk"
    assert out[1]["reg_domain"] == "example.co.uk"
    assert out[1]["path_depth"] == 3
    assert out[1]["has_query"] is True
    assert out[2]["reg_domain"] == "site.com"
    assert out[2]["has_query"] is False
    assert out[3]["is_ip_host"] is True
    assert out[3]["reg_domain"] == "10.0.0.1"
    assert out[4]["scheme"] == "ftp"
    assert out[5]["host"] == "" and out[5]["scheme"] == ""


def test_canonical_url_rules(spark):
    from meza_spark.llm.url import canonical_url

    cases = {
        # case-fold + default port + tracking strip + sort + fragment
        "HTTPS://WWW.Ex.COM:443/P/Q/?utm_source=x&b=2&a=1#f":
            "https://ex.com/P/Q?a=1&b=2",
        # http default port, bare root slash collapses
        "http://ex.com:80/": "http://ex.com",
        # non-default port survives; ref param dies, the rest stays
        "http://ex.com:8080/a?ref=feed&z=1": "http://ex.com:8080/a?z=1",
        # all params tracking -> no query at all
        "https://sub.ex.co.uk/a/b/?fbclid=1&gclid=2":
            "https://sub.ex.co.uk/a/b",
        # param ORDER normalizes (the dedup-bucket property)
        "https://ex.com/a?z=9&a=1&m=5": "https://ex.com/a?a=1&m=5&z=9",
        # no path, no query
        "https://ex.com": "https://ex.com",
        # 'refresh=1' must NOT be eaten by the 'ref' rule (anchored =)
        "https://ex.com/a?refresh=1": "https://ex.com/a?refresh=1",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["canonical_url"]
           for r in canonical_url(df).collect()}
    assert got == cases


def test_canonical_url_dedup_bucketing(spark):
    from meza_spark.llm.url import canonical_url

    # three spellings of one page + one genuinely different page
    df = spark.createDataFrame(
        [("https://www.ex.com/a?x=1&y=2",),
         ("HTTPS://EX.COM:443/a/?y=2&x=1&utm_medium=m",),
         ("https://ex.com/a?y=2&x=1#top",),
         ("https://ex.com/b?x=1",)], "url string")
    n = (canonical_url(df).select("canonical_url").distinct().count())
    assert n == 2
