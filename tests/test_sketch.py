"""Tests for meza_spark.llm.sketch (count-min)."""

import numpy as np
from pyspark.sql import functions as F

from meza_spark.llm.sketch import CountMinSketch, build_cms, cms_lookup
from meza_spark.util import explain_str


def _skewed(spark):
    # key-i appears i times for i in 1..40 (820 rows), plus one hot
    # key with 500 occurrences
    rows = [(f"k{i}",) for i in range(1, 41) for _ in range(i)]
    rows += [("hot",)] * 500
    return spark.createDataFrame(rows, ["k"])


def test_cms_never_undercounts(spark):
    df = _skewed(spark)
    cms = build_cms(df, "k", eps=1e-3, delta=0.01)
    est = cms.estimate([f"k{i}" for i in range(1, 41)] + ["hot"])
    truth = np.array(list(range(1, 41)) + [500])
    assert (est >= truth).all()
    # with width >> distinct keys, estimates are exact
    assert (est == truth).all()


def test_cms_overcount_bounded_small_width(spark):
    df = _skewed(spark)
    n = df.count()
    eps = 0.05
    cms = build_cms(df, "k", eps=eps, delta=0.01)
    est = cms.estimate(["hot"])
    assert est[0] >= 500
    assert est[0] <= 500 + eps * n * 3   # generous ε-bound margin


def test_cms_merge_equals_full_build(spark):
    df = _skewed(spark)
    a = df.where(F.crc32(F.col("k")) % 2 == 0)
    b = df.where(F.crc32(F.col("k")) % 2 == 1)
    full = build_cms(df, "k", depth=4, width=1024)
    merged = build_cms(a, "k", depth=4, width=1024).merge(
        build_cms(b, "k", depth=4, width=1024))
    assert (full.table == merged.table).all()


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 2)], ["k", "wt"])
    cms = build_cms(df, "k", weight_col="wt", depth=4, width=256)
    assert cms.estimate(["a"])[0] == 15
    assert cms.estimate(["b"])[0] == 2


def test_cms_lookup_join_free(spark):
    df = _skewed(spark)
    cms = build_cms(df, "k", depth=4, width=2048)
    probed = cms_lookup(df.limit(50), "k", cms)
    plan = explain_str(probed, "simple")
    assert "Join" not in plan
    got = {r["k"]: r["est_count"] for r in probed.collect()}
    assert got["k40"] == 40 if "k40" in got else True
    assert all(v >= 1 for v in got.values())


def test_cms_params():
    d, w = CountMinSketch.params(eps=0.001, delta=0.01)
    assert d == 5                      # ceil(ln 100)
    assert w == 2719                   # ceil(e/0.001)
