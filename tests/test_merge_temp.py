"""merge_into upsert semantics + temperature sampling + semantic dedup."""

import numpy as np
from pyspark.sql import functions as F

from meza_spark.process import merge_into


def _frames(spark):
    t = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, val double")
    s = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)],
        "k long, name string, val double")
    return t, s


def test_merge_upsert(spark):
    t, s = _frames(spark)
    out = {r["k"]: (r["name"], r["val"])
           for r in merge_into(t, s, on="k").collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0),
                   3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_update_subset_and_no_insert(spark):
    t, s = _frames(spark)
    out = {r["k"]: (r["name"], r["val"])
           for r in merge_into(t, s, on="k", update_cols=["val"],
                               insert=False).collect()}
    # name kept from target, val updated, no new row 4
    assert out == {1: ("a", 10.0), 2: ("b", 99.0), 3: ("c", 30.0)}


def test_merge_delete_unmatched(spark):
    t, s = _frames(spark)
    out = {r["k"] for r in
           merge_into(t, s, on="k", delete_unmatched=True).collect()}
    assert out == {2, 4}  # full sync to source keyset


def test_merge_source_missing_columns(spark):
    t, _ = _frames(spark)
    s = spark.createDataFrame([(2, 77.0)], "k long, val double")
    out = {r["k"]: (r["name"], r["val"])
           for r in merge_into(t, s, on="k",
                               update_cols=["val"]).collect()}
    assert out[2] == ("b", 77.0)


def test_temperature_sample(spark):
    from meza_spark.llm.sampling import temperature_sample

    df = spark.range(11000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 10000, "big").otherwise("small").alias("src"))
    out = temperature_sample(df, "k", "src", alpha=0.5, seed=1)
    by = {r["src"]: r["n"] for r in
          out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # smallest stratum keeps all rows; big is downsampled at
    # (10000/1000)^(0.5-1) = 10^-0.5 ≈ 0.316
    assert by["small"] == 1000
    assert 2800 < by["big"] < 3500
    # alpha=1 is a no-op
    assert temperature_sample(df, "k", "src", alpha=1.0).count() == 11000
    # partitioning-invariant
    a = {r["k"] for r in out.collect()}
    b = {r["k"] for r in temperature_sample(
        df.repartition(13), "k", "src", alpha=0.5, seed=1).collect()}
    assert a == b


def test_semantic_dedup(spark):
    from meza_spark.llm.cluster import semantic_dedup

    rng = np.random.default_rng(5)
    centers = rng.normal(0, 3, (4, 8))
    rows = []
    # 40 base vectors + 40 near-clones (tiny perturbation, cosine≈1)
    for i in range(40):
        v = centers[i % 4] + rng.normal(0, 0.3, 8)
        rows.append((i, [float(x) for x in v]))
        w = v * 1.0001
        rows.append((100 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(df, k_clusters=4, threshold=0.999,
                          fit_sample=80, seed=7)
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # every clone pair collapses (transitive merges may drop both ids
    # of a pair into an earlier representative — never keep both)
    assert 4 <= len(ids) <= 45
    for i in range(40):
        assert not (i in ids and 100 + i in ids)


def test_snapshot_diff_classes(spark):
    from meza_spark.process import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long")
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "k long, s string, v long")
    out = {r["k"]: (r["change"], r["s"], r["v"])
           for r in snapshot_diff(old, new, on="k").collect()}
    assert out[1] == ("unchanged", "a", 10)
    assert out[2] == ("changed", "B", 20)     # new-side values win
    assert out[3] == ("removed", "c", 30)     # old-side values kept
    assert out[4] == ("unchanged", None, 40)  # null-safe compare
    assert out[5] == ("added", "e", 50)


def test_snapshot_diff_compare_subset(spark):
    from meza_spark.process import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1)], "k long, s string, v long")
    new = spark.createDataFrame([(1, "a", 2)], "k long, s string, v long")
    # v excluded from comparison -> unchanged despite differing
    out = snapshot_diff(old, new, on="k", compare_cols=["s"]).collect()
    assert out[0]["change"] == "unchanged" and out[0]["v"] == 2
