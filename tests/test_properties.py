"""Property-based parity tests (hypothesis) for the messy-cast pack.

Each property renders random values through meza-style messy formats
(currency symbols, thousands separators) and asserts the Column-level
cast recovers exactly what Python reference semantics say — one Spark
job per example over the whole batch.
"""

import decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from meza_spark import convert as cv

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _fmt_thousands(n: int) -> str:
    return f"{n:,d}"


@given(st.lists(st.integers(-10**12, 10**12), min_size=1, max_size=40),
       st.sampled_from(["", "$", "£", "€"]))
@settings(**_SETTINGS)
def test_to_int_recovers_formatted_ints(spark, xs, cur):
    # currency prefix on non-negatives only ('-$1,234' is ambiguous in
    # the reference too — its strip removes a LEADING symbol)
    rows = [(i, cur + _fmt_thousands(x) if x >= 0 else _fmt_thousands(x))
            for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "i int, s string")
    got = {r["i"]: r["v"] for r in
           df.select("i", cv.to_int(F.col("s")).alias("v")).collect()}
    for i, x in enumerate(xs):
        assert got[i] == x, (xs[i], rows[i])


@given(st.lists(st.decimals(min_value=-10**6, max_value=10**6,
                            allow_nan=False, allow_infinity=False,
                            places=4), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_to_decimal_matches_python_half_up(spark, xs):
    rows = [(i, str(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "i int, s string")
    got = {r["i"]: r["v"] for r in
           df.select("i", cv.to_decimal(F.col("s"), places=2)
                     .cast("string").alias("v")).collect()}
    for i, x in enumerate(xs):
        want = x.quantize(decimal.Decimal("0.01"),
                          rounding=decimal.ROUND_HALF_UP)
        assert decimal.Decimal(got[i]) == want, (x, got[i])


@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_to_float_roundtrips_repr(spark, xs):
    rows = [(i, repr(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "i int, s string")
    got = {r["i"]: r["v"] for r in
           df.select("i", cv.to_float(F.col("s")).alias("v")).collect()}
    for i, x in enumerate(xs):
        assert got[i] == x, (x, got[i])
