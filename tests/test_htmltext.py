"""HTML → text extraction with boilerplate removal (llm/htmltext.py)."""

import pytest
from pyspark.sql import functions as F

from meza_spark.llm.htmltext import extract_page, extract_text

PAGE = """<!doctype html>
<html><head>
  <title>  The &amp; Title </title>
  <style>body { color: red }</style>
  <script>var x = "<p>not text</p>";</script>
</head><body>
  <nav><a href="/">Home</a> <a href="/a">About</a>
    some chrome text that is long enough to pass the word rule</nav>
  <h1>A heading of several words</h1>
  <p>This is the first real paragraph with plenty of words in it.</p>
  <div><a href="x">one</a> <a href="y">two</a>
  <a href="z">linkfarm three</a> ok</div>
  <p>tiny</p>
  <p>Second real paragraph,&nbsp;with an entity and
     a <a href="q">single link</a> inside a lot of prose text.</p>
  <footer>copyright chrome line with enough words to pass</footer>
</body></html>"""


def test_extract_page_boilerplate_rules():
    title, text, kept, dropped = extract_page(PAGE)
    assert title == "The & Title"
    lines = text.split("\n")
    assert lines[0] == "A heading of several words"
    assert lines[1].startswith("This is the first real paragraph")
    assert lines[2].startswith("Second real paragraph")
    assert kept == 3
    # dropped: nav block, linkfarm (density), tiny (min_words), footer
    assert dropped == 4
    assert "Home" not in text and "linkfarm" not in text
    assert "not text" not in text and "color: red" not in text


def test_thresholds_are_tunable():
    _, text, kept, _ = extract_page(PAGE, min_words=1,
                                    max_link_density=1.0,
                                    drop_chrome=False)
    # everything survives with the rules disabled
    assert "tiny" in text and "linkfarm" in text and "Home" in text
    assert kept == 7


def test_degenerate_inputs():
    assert extract_page("") == (None, None, 0, 0)
    assert extract_page(None) == (None, None, 0, 0)
    t, x, k, d = extract_page("just bare text with no tags at all")
    assert x == "just bare text with no tags at all" and k == 1
    # malformed nesting must not raise
    t, x, k, d = extract_page("<p>ok words here<div></p></nav></div>")
    assert "ok words here" in x


def test_spark_udf_matches_local(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "<p>short page with enough words</p>"),
         (3, None)],
        "doc_id long, html string")
    out = (extract_text(df, "html")
           .select("doc_id", "page.*").orderBy("doc_id").collect())
    for row in out:
        local = extract_page(
            {1: PAGE, 2: "<p>short page with enough words</p>",
             3: None}[row["doc_id"]])
        assert (row["title"], row["text"], row["n_blocks_kept"],
                row["n_blocks_dropped"]) == local


def test_no_shuffle_in_plan(spark):
    df = spark.createDataFrame([(1, "<p>a b c</p>")],
                               "doc_id long, html string")
    plan = extract_text(df, "html")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
