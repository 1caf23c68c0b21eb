"""Tests for meza_spark.quality.check and process.scd2_intervals."""

import datetime as dt

from pyspark.sql import functions as F

from meza_spark import process as pr
from meza_spark.quality import check
from meza_spark.util import explain_str


def test_check_rule_kinds(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "F", "a@x.com"),
         (2, -5.0, "Z", None),          # range + regex violations
         (2, 20.0, "O", "bad"),         # dup key + regex(email) viol.
         (None, 5.0, "P", "c@y.org")],  # null key
        ["k", "v", "s", "email"])
    ref = spark.createDataFrame([(1,), (2,)], ["k"])
    out = {r["rule"]: r["violations"] for r in check(df, [
        {"type": "not_null", "field": "k"},
        {"type": "unique", "fields": ["k"]},
        {"type": "range", "field": "v", "lo": 0.0, "hi": 100.0},
        {"type": "regex", "field": "s", "pattern": "[FOP]"},
        {"name": "email_ok", "type": "regex", "field": "email",
         "pattern": r"[^@]+@[^@]+\.[^@]+"},
        {"name": "fk", "type": "ref", "field": "k", "ref": ref,
         "ref_field": "k"},
        {"name": "pos", "type": "predicate", "cond": F.col("v") > 0},
    ]).collect()}
    assert out["not_null_k"] == 1
    assert out["unique_k"] == 1          # key 2 appears twice → 1 extra
    assert out["range_v"] == 1           # -5
    assert out["regex_s"] == 1           # Z
    assert out["email_ok"] == 1          # "bad" (nulls don't violate)
    assert out["fk"] == 0                # nulls don't violate FK
    assert out["pos"] == 1               # -5 fails predicate


def test_check_clean_table_and_order(spark):
    df = spark.createDataFrame([(1,), (2,)], ["k"])
    rules = [{"type": "not_null", "field": "k"},
             {"type": "unique", "fields": ["k"]}]
    rows = check(df, rules).collect()
    assert [r["violations"] for r in rows] == [0, 0]


def test_check_single_scan_for_row_local_rules(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    out = check(df, [
        {"type": "not_null", "field": "k"},
        {"type": "range", "field": "k", "lo": 0, "hi": 1000},
        {"type": "predicate", "cond": F.col("k") >= 0},
    ])
    plan = explain_str(out, "simple")
    assert plan.count("Scan") <= 1       # all fold into one aggregate


def test_scd2_intervals_collapse(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    df = spark.createDataFrame(
        [(1, 1, ts(0), "a"), (2, 1, ts(10), "a"),   # unchanged run
         (3, 1, ts(20), "b"), (4, 1, ts(30), "a"),
         (5, 2, ts(0), "x")],
        ["event_id", "user_id", "ts", "et"])
    out = pr.scd2_intervals(df, "user_id", "ts", attrs=["et"],
                            collapse=True, tiebreak="event_id")
    rows = {r["event_id"]: r for r in out.collect()}
    assert set(rows) == {1, 3, 4, 5}     # event 2 collapsed away
    assert rows[1]["valid_to"] == ts(20)  # run 'a' spans to the change
    assert rows[3]["valid_to"] == ts(30)
    assert rows[4]["valid_to"] is None    # open interval
    assert rows[5]["valid_to"] is None


def test_scd2_no_collapse_one_interval_per_event(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t0, "a"), (2, 1, t0 + dt.timedelta(hours=1), "a")],
        ["event_id", "user_id", "ts", "et"])
    out = pr.scd2_intervals(df, "user_id", "ts", tiebreak="event_id")
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["valid_to"] == t0 + dt.timedelta(hours=1)
    assert rows[2]["valid_to"] is None


def test_observed_metrics_piggyback(spark):
    from meza_spark.quality import observed_metrics

    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else float(i)) for i in range(100)],
        "id long, v double")
    idf, obs = observed_metrics(df, ["v"])
    # metrics ride the caller's own action — no second scan
    assert idf.count() == 100
    got = obs.get
    assert got["n_rows"] == 100 and got["v_nulls"] == 20
    assert got["v_min"] == 1.0 and got["v_max"] == 99.0


def test_observed_metrics_streaming_name_form(spark, tmp_path):
    from meza_spark.quality import observed_metrics

    src = tmp_path / "obs_src"
    src.mkdir()
    spark.createDataFrame([(1, 2.0), (2, None)], "id long, v double") \
        .coalesce(1).write.mode("append").parquet(str(src))
    sdf = (spark.readStream.schema("id long, v double")
           .parquet(str(src)))
    out, obs = observed_metrics(sdf, ["v"], name="m")
    assert obs is None and out.isStreaming
    q = (out.writeStream.format("memory").queryName("obs_sink")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    progress = [p for p in q.recentProgress if p["observedMetrics"]]
    q.stop()
    m = progress[-1]["observedMetrics"]["m"]
    assert m["n_rows"] == 2 and m["v_nulls"] == 1


def test_partition_stats_flags_skew(spark):
    from meza_spark.quality import partition_stats

    df = spark.createDataFrame([(i,) for i in range(90)], "id long")
    # force a fat partition: everything hashes to ONE of 3 partitions,
    # leaving two EMPTY — the case the aggregate form can't see
    skewed = df.repartition(3, (F.col("id") * 0).cast("int"))
    got = {r["partition_id"]: (r["n_rows"], r["skew"])
           for r in partition_stats(skewed).collect()}
    assert len(got) == 3                       # empty partitions REPORT
    rows = sorted(n for n, _ in got.values())
    assert rows == [0, 0, 90]                  # two empty + one fat
    hot = max(got.values())
    assert hot == (90, 3.0)                    # 90 rows = 3x the mean
    # balanced frame: every partition near skew 1
    bal = partition_stats(df.repartition(3, "id")).collect()
    assert len(bal) == 3
    assert all(abs(r["skew"] - 1.0) < 0.5 for r in bal)
