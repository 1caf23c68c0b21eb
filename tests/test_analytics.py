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


def test_moving_zscore_exact_and_guards(spark):
    import math

    from meza_spark.analytics import moving_zscore

    vals = [10.0, 10.0, 10.0, 10.0, 50.0, 10.0]
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, i), "s", v)
         for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id string, value double")
    out = {r["event_id"]: r["z_micro"]
           for r in moving_zscore(df, "user_id", "ts", "value",
                                  window=4).collect()}
    # first rows: window too small (rows 0-2 have <3 preceding points)
    assert out[0] is None and out[1] is None and out[2] is None
    # row 3: window all-equal -> zero variance -> null
    assert out[3] is None
    # row 4: spike vs flat window of 10s -> zero variance -> null
    assert out[4] is None
    # row 5: window [10,10,10,50]: mean 20, sample std 20 -> z = -0.5
    assert out[5] == -500000
    # exact replica in plain python (micro-int pipeline)
    q = [v * 1_000_000 for v in vals[1:5]]
    n, s1 = 4.0, float(sum(q))
    s2 = float(sum(x * x for x in q))
    var = (n * s2 - s1 * s1) / (n * (n - 1))
    z = (vals[5] * 1e6 - s1 / n) / math.sqrt(var)
    assert out[5] == math.floor(z * 1e6 + 0.5)


def test_moving_zscore_partition_isolation(spark):
    from meza_spark.analytics import moving_zscore

    rows = [(i, dt.datetime(2024, 1, 1, i % 12), f"u{i % 2}",
             float(i)) for i in range(24)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, value double")
    a = sorted(map(tuple, moving_zscore(
        df.repartition(7), "user_id", "ts", "value",
        tiebreak="event_id").collect()))
    b = sorted(map(tuple, moving_zscore(
        df.coalesce(1), "user_id", "ts", "value",
        tiebreak="event_id").collect()))
    assert a == b


def test_cusum_exact_replica_and_alarm(spark):
    import math

    from meza_spark.analytics import cusum

    # step change at index 6: flat 10s then flat 20s
    vals = [10.0, 10.0, 10.0, 10.0, 10.0, 10.0,
            20.0, 20.0, 20.0, 20.0, 20.0, 20.0]
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, i), "s", v)
         for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id string, value double")
    out = {r["event_id"]: (r["cusum_hi_micro"], r["cusum_lo_micro"],
                           r["alarm"])
           for r in cusum(df, "user_id", "ts", "value",
                          slack=1.0, threshold=8.0).collect()}
    # exact replica: C_t = max(0, C_{t-1} + y_t) at scale n
    vq = [math.floor(v * 1e6 + 0.5) for v in vals]
    n, T, su = len(vq), sum(vq), 1_000_000
    chi = clo = 0
    for i, x in enumerate(vq):
        chi = max(0, chi + (n * x - T - n * su))
        clo = max(0, clo + (T - n * x - n * su))
        assert out[i] == (chi // n, clo // n,
                          chi // n >= 8_000_000 or clo // n >= 8_000_000)
    # the low side accumulates during the flat-10 prefix, the high
    # side after the shift; the final row must be in alarm
    assert out[11][2] is True


def test_cusum_known_target_and_partitioning_invariance(spark):
    from meza_spark.analytics import cusum

    rows = [(i, dt.datetime(2024, 1, 1, i % 12), f"u{i % 2}",
             float(i % 7)) for i in range(24)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, value double")
    a = sorted(map(tuple, cusum(
        df.repartition(7), "user_id", "ts", "value", target=3.0,
        tiebreak="event_id").collect()))
    b = sorted(map(tuple, cusum(
        df.coalesce(1), "user_id", "ts", "value", target=3.0,
        tiebreak="event_id").collect()))
    assert a == b
    # known-target mode: deviation is plain x - target (scale 1)
    one = {r["event_id"]: r["cusum_hi_micro"] for r in cusum(
        df, "user_id", "ts", "value", target=0.0,
        tiebreak="event_id").collect()}
    # per-series running sum of values (all >= 0, so max-identity is
    # the plain cumulative sum)
    for key in ("u0", "u1"):
        ser = sorted([(t, i, v) for i, t, u, v in
                      [(r[0], r[1], r[2], r[3]) for r in rows]
                      if u == key])
        run = 0
        for t, i, v in ser:
            run += int(v * 1e6)
            assert one[i] == run
