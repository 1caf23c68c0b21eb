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
