"""Funnel + cohort retention (analytics.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from meza_spark.analytics import cohort_retention, funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, t)
         for i, (u, t, d, h) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string")


def test_funnel_order_matters(spark):
    rows = [
        (1, "view", 1, 0), (1, "click", 1, 1), (1, "buy", 1, 2),  # full
        (2, "view", 2, 0), (2, "click", 2, 1),                    # 2 steps
        (3, "click", 3, 0), (3, "view", 3, 1),   # wrong order: view only
        (4, "buy", 4, 0),                        # never entered
    ]
    out = {r["step"]: r["users"]
           for r in funnel(_ev(spark, rows),
                           ["view", "click", "buy"]).collect()}
    assert out == {"view": 3, "click": 2, "buy": 1}


def test_funnel_within_window(spark):
    rows = [
        (1, "view", 1, 0), (1, "click", 1, 1),    # 1h gap
        (2, "view", 2, 0), (2, "click", 3, 0),    # 24h gap
    ]
    strict = {r["step"]: r["users"]
              for r in funnel(_ev(spark, rows), ["view", "click"],
                              within_seconds=7200).collect()}
    assert strict == {"view": 2, "click": 1}
    loose = {r["step"]: r["users"]
             for r in funnel(_ev(spark, rows), ["view", "click"]).collect()}
    assert loose["click"] == 2


def test_funnel_reuses_min_qualifying_time(spark):
    # step-2 events BEFORE step 1 don't count, later ones do; step 3
    # must be after the FIRST qualifying step 2
    rows = [(1, "a", 2, 0), (1, "b", 1, 0), (1, "b", 2, 5),
            (1, "c", 2, 3)]                       # c between b1 and b2
    out = {r["step"]: r["users"]
           for r in funnel(_ev(spark, rows), ["a", "b", "c"]).collect()}
    assert out == {"a": 1, "b": 1, "c": 0}


def test_funnel_validates(spark):
    with pytest.raises(ValueError, match="at least one step"):
        funnel(_ev(spark, []), [])


def test_cohort_retention_weekly(spark):
    rows = [
        (1, "x", 1, 0), (1, "x", 9, 0),    # cohort wk of Jan 1; wk+1
        (2, "x", 2, 0), (2, "x", 3, 0),    # same cohort, wk 0 twice
        (3, "x", 9, 0),                     # cohort wk of Jan 8
    ]
    out = {(str(r["cohort"]), r["period_n"]): r["users"]
           for r in cohort_retention(_ev(spark, rows)).collect()}
    assert out == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
                   ("2024-01-08", 0): 1}


def test_cohort_monthly_and_bounds(spark):
    rows = [(1, "x", 1, 0), (1, "x", 30, 0)]
    out = cohort_retention(_ev(spark, rows), period="month").collect()
    assert {(r["period_n"], r["users"]) for r in out} == {(0, 1)}
    with pytest.raises(ValueError, match="unsupported period"):
        cohort_retention(_ev(spark, rows), period="fortnight")
