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
