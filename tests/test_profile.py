"""Tests for meza_spark.profile (profile/histogram) and
process.sessionize."""

import datetime as dt

from pyspark.sql import functions as F

from meza_spark import process as pr
from meza_spark.profile import histogram, profile, skew_report, winsorize
from meza_spark.util import explain_str


def test_sessionize_gap_splits(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 3 events inside one session, then a 2h gap
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(minutes=10)),
        (3, 1, t0 + dt.timedelta(minutes=20)),
        (4, 1, t0 + dt.timedelta(hours=2, minutes=20)),
        # user 2: single event
        (5, 2, t0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = pr.sessionize(df, "user_id", "ts", gap_seconds=1800,
                        tiebreak="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_boundary_exact_gap_is_same_session(spark):
    # gap strictly greater than gap_seconds starts a new session;
    # exactly gap_seconds does not (matches the oracle's `>`)
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t0), (2, 1, t0 + dt.timedelta(seconds=1800)),
         (3, 1, t0 + dt.timedelta(seconds=3601))],
        ["event_id", "user_id", "ts"])
    out = pr.sessionize(df, "user_id", "ts", gap_seconds=1800,
                        tiebreak="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_sessionize_single_window_pass(spark):
    # lag + running sum share one (partition, order) → one WindowExec
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame([(1, 1, t0)], ["event_id", "user_id", "ts"])
    out = pr.sessionize(df, "user_id", "ts", tiebreak="event_id")
    plan = explain_str(out, "simple")
    assert plan.count("Window") <= 2  # one WindowExec node (+header line)
    assert plan.count("Exchange") <= 1


def test_profile_metrics(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, None), (2, 6.0, "a")],
        ["k", "v", "s"])
    out = profile(df, ["k", "v", "s"])
    got = {(r["column"], r["metric"]): (r["value_num"], r["value_str"])
           for r in out.collect()}
    assert got[("k", "count")] == (4.0, None)
    assert got[("k", "distinct")] == (3.0, None)
    assert got[("k", "nulls")] == (0.0, None)
    assert got[("k", "mean")] == (2.0, None)
    assert got[("v", "nulls")] == (1.0, None)
    assert got[("v", "min")] == (2.0, None)
    assert got[("v", "max")] == (6.0, None)
    assert got[("s", "min")] == (None, "a")
    assert got[("s", "max")] == (None, "b")
    assert got[("s", "nulls")] == (1.0, None)
    # 6 metrics per numeric col + 5 per string col
    assert out.count() == 6 + 6 + 5


def test_profile_plan_shape(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"))
    # approx mode: everything folds into ONE aggregate / one scan
    plan = explain_str(profile(df, ["id", "m"], approx=True), "simple")
    assert plan.count("Scan") <= 1
    # exact mode: per-column distincts — NO Expand/SortAggregate
    # rewrite (the multi-countDistinct blowup), joins all broadcast
    plan = explain_str(profile(df, ["id", "m"]), "simple")
    assert "Expand" not in plan
    assert "SortAggregate" not in plan
    assert "SortMergeJoin" not in plan


def test_profile_approx_mode(spark):
    df = spark.range(1000).select((F.col("id") % 50).alias("x"))
    got = {r["metric"]: r["value_num"]
           for r in profile(df, approx=True).collect()}
    assert abs(got["distinct"] - 50) <= 5  # HLL within tolerance


def test_histogram_clamps_and_fills(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [-5, 0, 1, 9.99, 10, 55, 99, 150]]
        + [(None,)], ["x"])
    out = histogram(df, "x", nbins=10, lo=0.0, hi=100.0)
    rows = {r["bucket"]: r for r in out.collect()}
    assert len(rows) == 10                      # empty buckets present
    assert rows[0]["n"] == 4                    # -5 clamps into 0
    assert rows[1]["n"] == 1                    # 10 → bucket 1
    assert rows[9]["n"] == 2                    # 99 and clamped 150
    assert rows[5]["n"] == 1
    assert rows[2]["n"] == 0
    assert rows[0]["lo"] == 0.0 and rows[0]["hi"] == 10.0
    assert sum(r["n"] for r in rows.values()) == 8  # null dropped


def test_histogram_auto_bounds(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    out = histogram(df, "x", nbins=3)
    rows = sorted(out.collect(), key=lambda r: r["bucket"])
    assert [r["n"] for r in rows] == [3, 3, 4]
    assert rows[0]["lo"] == 0.0 and rows[2]["hi"] == 9.0


def test_winsorize_clamps(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)], ["x"])
    out = winsorize(df, "x", 0.05, 0.95, exact=True, out="xw")
    vals = sorted(r["xw"] for r in out.collect())
    assert vals[0] == 5.0 and vals[-1] == 95.0       # tails clamped
    assert 50.0 in vals                               # interior untouched
    assert len(vals) == 101


def test_winsorize_approx_mode_runs(spark):
    df = spark.range(1000).select(F.col("id").cast("double").alias("x"))
    out = winsorize(df, "x", 0.01, 0.99)
    mx = out.agg(F.max("x")).collect()[0][0]
    assert mx <= 999.0


def test_skew_report_shares(spark):
    rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    df = spark.createDataFrame(rows, ["k"])
    out = skew_report(df, "k", top=2).collect()
    assert [r["k"] for r in out] == ["hot", "warm"]
    assert out[0]["n"] == 80 and abs(out[0]["share"] - 0.8) < 1e-12


def test_psi_drift_identical_is_zero(spark):
    from meza_spark.profile import psi_drift

    df = spark.range(1000).select((F.col("id") % 100).alias("v"))
    out = psi_drift(df, df, "v", nbins=5, lo=0.0, hi=100.0).collect()
    assert len(out) == 5
    assert all(abs(r["psi"]) < 1e-9 for r in out)
    assert abs(sum(r["frac_a"] for r in out) - 1.0) < 1e-9


def test_psi_drift_detects_shift(spark):
    from meza_spark.profile import psi_drift

    a = spark.range(1000).select((F.col("id") % 50).alias("v"))
    b = spark.range(1000).select((F.col("id") % 50 + 50).alias("v"))
    out = psi_drift(a, b, "v", nbins=4, lo=0.0, hi=100.0).collect()
    total = sum(r["psi"] for r in out)
    assert total > 0.25  # fully disjoint distributions → big PSI


def test_robust_outliers_exact_and_flag(spark):
    from meza_spark.profile import robust_outliers

    # group a: median 10, MAD 1 -> |x-10| > 3 flags 20 only
    rows = [("a", v) for v in
            [8.0, 9.0, 10.0, 11.0, 12.0, 20.0]] + \
           [("b", v) for v in [100.0, 100.0, 100.0]]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {(r["k"], r["v"]): (r["med"], r["mad"], r["is_outlier"])
           for r in robust_outliers(df, "v", by=["k"], k=3.0).collect()}
    # a: sorted [8,9,10,11,12,20] -> median 10.5, absdevs
    # [2.5,1.5,0.5,0.5,1.5,9.5] -> MAD 1.5; 3*1.5=4.5 flags only 20
    assert got[("a", 20.0)] == (10.5, 1.5, True)
    assert got[("a", 12.0)][2] is False
    # constant group: MAD 0, nothing deviates -> no flags
    assert got[("b", 100.0)] == (100.0, 0.0, False)


def test_robust_outliers_global_and_approx(spark):
    from meza_spark.profile import robust_outliers

    df = spark.createDataFrame([(float(i),) for i in range(101)],
                               "v double")
    out = robust_outliers(df, "v", k=1.0)
    got = {r["v"]: r["is_outlier"] for r in out.collect()}
    # median 50, MAD 25: flags |x-50| > 25
    assert got[0.0] is True and got[30.0] is False and got[80.0] is True
    # approx path returns the same shape (values sketch-close here)
    ap = robust_outliers(df, "v", k=1.0, exact=False).first()
    assert {"med", "mad", "is_outlier"} <= set(ap.asDict())


def test_benford_digits_and_expectation(spark):
    import math

    from meza_spark.profile import benford

    # multiplicative synthetic data follows Benford closely
    rows = [(1.5 ** i,) for i in range(1, 120)] + [(None,), (0.0,)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r for r in benford(df, "v").collect()}
    assert set(got) == set(range(1, 10))   # ALL digits report
    n_total = sum(r["n"] for r in got.values())
    assert n_total == 119               # null and zero excluded
    for d, r in got.items():
        assert r["benford_micro"] == math.floor(
            math.log10(1 + 1 / d) * 1e6 + 0.5)
        assert r["share_micro"] == r["n"] * 1000000 // n_total
    # digit 1 most frequent (the Benford signature)
    assert got[1]["n"] == max(r["n"] for r in got.values())
    # uniform data deviates positive on high digits
    uni = {r["digit"]: r["deviation_micro"] for r in benford(
        spark.createDataFrame([(float(100 + i),) for i in range(900)],
                              "v double"), "v").collect()}
    assert uni[9] > 0 and uni[1] < 0
    # a digit that NEVER occurs still reports, with full negative
    # deviation — the strongest fabrication signal
    nod9 = {r["digit"]: r for r in benford(
        spark.createDataFrame([(float(d) ,) for d in range(1, 9)
                               for _ in range(10)], "v double"),
        "v").collect()}
    assert nod9[9]["n"] == 0
    assert nod9[9]["share_micro"] == 0
    assert nod9[9]["deviation_micro"] == -nod9[9]["benford_micro"]


def test_benford_excludes_nan_and_inf(spark):
    from meza_spark.profile import benford

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("inf",),) if False else
         (float("inf"),), (25.0,), (None,)], "v double")
    got = {r["digit"]: r["n"] for r in benford(df, "v").collect()}
    assert sum(got.values()) == 2            # only 1.0 and 25.0 count
    assert got[1] == 1 and got[2] == 1
