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


def test_funnel_step_names_are_data_not_sql(spark):
    """Step names containing quotes/backslashes must come back verbatim
    — the unpivot is built with the Column API, never lexed as SQL
    (round-4 ADVICE: the interpolated stack() string mis-lexed these)."""
    evil = ["it's a view", 'say "click"', "back\\slash buy"]
    rows = [(1, evil[0], 1, 0), (1, evil[1], 1, 1), (1, evil[2], 1, 2),
            (2, evil[0], 2, 0)]
    out = {r["step"]: r["users"]
           for r in funnel(_ev(spark, rows), evil).collect()}
    assert out == {evil[0]: 2, evil[1]: 1, evil[2]: 1}


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


def test_ewma_exact_replica_and_head(spark):
    import math

    from meza_spark.analytics import ewma

    vals = [10.0, 20.0, 40.0, 10.0, 30.0, 50.0, 20.0]
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, i), "s", v)
         for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id string, value double")
    got = {r["event_id"]: r["ewma_micro"]
           for r in ewma(df, "user_id", "ts", "value",
                         alpha_num=3, alpha_den=10, window=4).collect()}
    W, keep, den = 4, 7, 10
    wint = [keep ** j * den ** (W - 1 - j) for j in range(W)]
    vq = [math.floor(v * 1e6 + 0.5) for v in vals]
    for t in range(len(vals)):
        xs = vq[max(0, t - W + 1):t + 1]
        n = len(xs)
        num = sum(x * wint[n - 1 - i] for i, x in enumerate(xs))
        assert got[t] == num // sum(wint[:n])
    # head row (n=1): EWMA of one point is the point itself
    assert got[0] == 10_000_000
    with pytest.raises(ValueError):
        ewma(df, "user_id", "ts", "value", alpha_num=5, alpha_den=5)


def test_ewma_partitioning_invariance(spark):
    from meza_spark.analytics import ewma

    rows = [(i, dt.datetime(2024, 1, 1, i % 20), f"u{i % 3}",
             float((i * 37) % 100)) for i in range(60)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, value double")
    a = sorted((r["event_id"], r["ewma_micro"]) for r in ewma(
        df.repartition(11), "user_id", "ts", "value",
        tiebreak="event_id").collect())
    b = sorted((r["event_id"], r["ewma_micro"]) for r in ewma(
        df.coalesce(1), "user_id", "ts", "value",
        tiebreak="event_id").collect())
    assert a == b


def test_attribution_models_exact(spark):
    from meza_spark.analytics import attribution

    rows = [
        # user 1: view@1, click@2, view@3, buy@4 -> 3 touches
        (1, dt.datetime(2024, 1, 1, 1), 1, "view"),
        (2, dt.datetime(2024, 1, 1, 2), 1, "click"),
        (3, dt.datetime(2024, 1, 1, 3), 1, "view"),
        (4, dt.datetime(2024, 1, 1, 4), 1, "buy"),
        # user 2: click@1, buy@2 -> 1 touch
        (5, dt.datetime(2024, 1, 1, 1), 2, "click"),
        (6, dt.datetime(2024, 1, 1, 2), 2, "buy"),
        # user 3: buy with no preceding touch -> unattributed
        (7, dt.datetime(2024, 1, 1, 2), 3, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")

    def run(model):
        return {r["channel"]: (r["credit_micro"], r["n_conversions"])
                for r in attribution(df, "buy", ["view", "click"],
                                     model=model,
                                     tiebreak="event_id").collect()}

    # linear: user1 333333x3 with remainder 1 to the EARLIEST (view@1)
    lin = run("linear")
    assert lin == {"view": (666667, 1), "click": (1333333, 2)}
    assert sum(v[0] for v in lin.values()) == 2_000_000  # reconciles
    assert run("last_touch") == {"view": (1000000, 1),
                                 "click": (1000000, 1)}
    assert run("first_touch") == {"view": (1000000, 1),
                                  "click": (1000000, 1)}
    with pytest.raises(ValueError):
        attribution(df, "buy", ["view"], model="u_shaped")


def test_attribution_lookback_bounds_the_join(spark):
    from meza_spark.analytics import attribution

    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 1, "view"),   # 4h before buy
        (2, dt.datetime(2024, 1, 1, 3), 1, "click"),  # 1h before buy
        (3, dt.datetime(2024, 1, 1, 4), 1, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r["channel"]: r["credit_micro"]
           for r in attribution(df, "buy", ["view", "click"],
                                model="linear", lookback_seconds=7200,
                                tiebreak="event_id").collect()}
    # the 4h-old view falls outside the 2h lookback
    assert got == {"click": 1000000}


def test_rfm_scores_and_approx_path(spark):
    from meza_spark.analytics import rfm

    # 5 users, strictly increasing activity in every dimension
    rows = []
    for u in range(1, 6):
        for e in range(u):
            rows.append((u * 100 + e, dt.datetime(2024, 1, u, e), u,
                         float(u * 10)))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r["user_id"]: r for r in
           rfm(df, "user_id", "ts", "value", n_bins=5).collect()}
    # user u: frequency u, monetary u*10*u, last day u -> rank u in
    # every dimension, so scores are exactly u and segment 'uuu'
    for u in range(1, 6):
        r = got[u]
        assert (r["r_score"], r["f_score"], r["m_score"]) == (u, u, u)
        assert r["segment"] == f"{u}{u}{u}"
        assert r["frequency"] == u
        assert r["monetary_micro"] == u * u * 10 * 1000000
    # approx path: same shape, scores within 1 of exact on this data
    ap = {r["user_id"]: r for r in
          rfm(df, "user_id", "ts", "value", n_bins=5,
              exact=False).collect()}
    for u in range(1, 6):
        assert abs(ap[u]["f_score"] - got[u]["f_score"]) <= 1
    # event_filter restricts which events count
    only_big = rfm(df, "user_id", "ts", "value",
                   event_filter=F.col("value") >= 30.0)
    assert only_big.count() == 3


def _series(spark, n=400, series=3):
    import math
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
             i % 7, f"t{i % series}",
             round(50 + 30 * math.sin(i / 9.0) + (i % 13) * 1.7
                   + (40 if i > 300 and i % series == 0 else 0), 3))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_zscore_fast_path_parity(spark):
    """exact=False (IEEE window avg/stddev) must track the
    hash-gated exact path within ±1 micro — same API, same nulls."""
    from meza_spark.analytics import moving_zscore

    ev = _series(spark)
    a = {r["event_id"]: r["z_micro"] for r in moving_zscore(
        ev, "event_type", "ts", "value", window=24,
        tiebreak="event_id").collect()}
    b = {r["event_id"]: r["z_micro"] for r in moving_zscore(
        ev, "event_type", "ts", "value", window=24,
        tiebreak="event_id", exact=False).collect()}
    assert set(a) == set(b)
    nulls_a = {k for k, v in a.items() if v is None}
    nulls_b = {k for k, v in b.items() if v is None}
    assert nulls_a == nulls_b
    diffs = [abs(a[k] - b[k]) for k in a if a[k] is not None]
    assert diffs and max(diffs) <= 1


def test_cusum_fast_path_parity(spark):
    from meza_spark.analytics import cusum

    ev = _series(spark)
    a = {r["event_id"]: (r["cusum_hi_micro"], r["cusum_lo_micro"])
         for r in cusum(ev, "event_type", "ts", "value", slack=5.0,
                        tiebreak="event_id").collect()}
    b = {r["event_id"]: (r["cusum_hi_micro"], r["cusum_lo_micro"])
         for r in cusum(ev, "event_type", "ts", "value", slack=5.0,
                        tiebreak="event_id", exact=False).collect()}
    assert set(a) == set(b)
    worst = max(max(abs(a[k][0] - b[k][0]), abs(a[k][1] - b[k][1]))
                for k in a)
    # float running sums drift with series length; micro-units of a
    # ~1e2-magnitude statistic keep it within a few last digits
    assert worst <= 5


def test_ewma_fast_path_parity(spark):
    from meza_spark.analytics import ewma

    ev = _series(spark)
    a = {r["event_id"]: r["ewma_micro"] for r in ewma(
        ev, "event_type", "ts", "value", alpha_num=3, alpha_den=10,
        window=8, tiebreak="event_id").collect()}
    b = {r["event_id"]: r["ewma_micro"] for r in ewma(
        ev, "event_type", "ts", "value", alpha_num=3, alpha_den=10,
        window=8, tiebreak="event_id", exact=False).collect()}
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) <= 1
    # the fast path has no integer-weight ceiling: a window the exact
    # path refuses runs fine
    import pytest as _pt
    with _pt.raises(ValueError, match="decimal"):
        ewma(ev, "event_type", "ts", "value", alpha_num=3,
             alpha_den=10, window=40)
    ewma(ev, "event_type", "ts", "value", alpha_num=3, alpha_den=10,
         window=40, exact=False).collect()


def test_moving_zscore_running_sum_rewrite_with_nulls(spark):
    """Pin the r9 running-sum-difference rewrite against a literal
    python sliding-frame replica on a longer series with NULL values
    interleaved: the trailing count/sums must skip nulls exactly as
    the direct frame aggregation did, and short/zero-variance heads
    must stay null."""
    import math

    from meza_spark.analytics import moving_zscore

    vals = [5.0, None, 7.0, 11.0, None, 13.0, 2.0, 2.0, 9.0, None,
            4.0, 17.0, 6.0, 6.0, 6.0, 8.0]
    w, mp = 4, 3
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, i % 24), "s", v)
         for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id string, value double")
    got = {r["event_id"]: r["z_micro"]
           for r in moving_zscore(df.repartition(5), "user_id", "ts",
                                  "value", window=w, min_points=mp,
                                  tiebreak="event_id").collect()}
    for i, v in enumerate(vals):
        frame = [x for x in vals[max(0, i - w):i] if x is not None]
        q = [math.floor(x * 1e6 + 0.5) for x in frame]
        n = len(q)
        exp = None
        if n >= mp:
            s1, s2 = float(sum(q)), float(sum(x * x for x in q))
            var = (n * s2 - s1 * s1) / (n * (n - 1))
            if var > 0 and v is not None:
                z = (float(math.floor(v * 1e6 + 0.5)) - s1 / n) \
                    / math.sqrt(var)
                exp = math.floor(z * 1e6 + 0.5)
        assert got[i] == exp, (i, got[i], exp)

def test_moving_zscore_overflow_raises(spark):
    """The r9 running-sum rewrite accumulates PARTITION-cumulative
    decimal(38,0) moments. Overflow must be LOUD in every config:
    under ANSI (Spark 4 default) the window sum itself throws; under
    ansi=false it is a silent NULL that the trailing-difference
    coalesce would otherwise turn into WRONG sums — the in-operator
    guard raises instead. 150 rows at value=1e12 push the cumulative
    Σvq² (1e36/row) past 1e38 mid-series."""
    import pytest

    from meza_spark.analytics import moving_zscore

    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
          "s", 1.0e12 + i) for i in range(150)],
        "event_id long, ts timestamp, user_id string, value double")
    out = moving_zscore(df, "user_id", "ts", "value", window=24,
                        min_points=3, tiebreak="event_id")
    with pytest.raises(Exception,
                       match="moving_zscore|NUMERIC_VALUE_OUT_OF_RANGE"):
        out.collect()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        # rebuild under ansi=false: the flag binds at plan-build time
        out2 = moving_zscore(df, "user_id", "ts", "value", window=24,
                             min_points=3, tiebreak="event_id")
        with pytest.raises(Exception, match="moving_zscore"):
            out2.collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
