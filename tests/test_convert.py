"""Cast-pack tests: messy-string semantics from the reference's doctest
corpus (meza/convert.py, meza/fntools.py — values re-derived from
FIXTURES.md, not copied)."""

import datetime

import pyspark.sql.functions as F
import pytest

from meza_spark import convert as cv


def _one(spark, value, expr_fn):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr_fn(F.col("v")).alias("r")).collect()[0]["r"]


@pytest.mark.parametrize("raw,expected", [
    ("yes", True), ("y", True), ("TRUE", True), ("t", True),
    ("no", False), ("n", False), ("False", False), ("f", False),
    ("1", True), ("0", False), ("2.5", True),
    ("banana", False),          # permissive default
    ("na", None), ("", None), ("None", None),
])
def test_to_bool(spark, raw, expected):
    assert _one(spark, raw, cv.to_bool) == expected


@pytest.mark.parametrize("raw,expected", [
    ("42", 42), ("$42", 42), ("£1,234", 1234), ("€2,000", 2000),
    ("2.5", 2), ("-1.5", -1),   # truncate toward zero (int(float(x)))
    ("(100)", -100),            # accounting negative
    ("junk", 0),                # permissive → 0
    ("n/a", None), (None, None),
])
def test_to_int_permissive(spark, raw, expected):
    assert _one(spark, raw, cv.to_int) == expected


def test_to_int_strict_null_on_failure(spark):
    assert _one(spark, "junk", lambda c: cv.to_int(c, strict=True)) is None


@pytest.mark.parametrize("raw,expected", [
    ("1.5", 1.5), ("$1,234.56", 1234.56), ("bad", 0.0), ("null", None),
])
def test_to_float(spark, raw, expected):
    assert _one(spark, raw, cv.to_float) == expected


def test_to_decimal_half_up(spark):
    from decimal import Decimal
    assert _one(spark, "1.005", cv.to_decimal) == Decimal("1.01")
    assert _one(spark, "$2,000.129", cv.to_decimal) == Decimal("2000.13")


@pytest.mark.parametrize("raw,expected", [
    ("1982-05-04", datetime.date(1982, 5, 4)),
    ("05/04/82", datetime.date(1982, 5, 4)),       # MM/dd/yy
    ("01-Jan-15", datetime.date(2015, 1, 1)),
    ("December 31, 1995", datetime.date(1995, 12, 31)),
])
def test_to_date_formats(spark, raw, expected):
    # the FIXTURES §1 mixed_basic date corpus
    assert _one(spark, raw, lambda c: cv.to_date(c, fuzzy=True)) == expected


def test_impossible_day_repair(spark):
    # meza/convert.py:415-427: '2/32/82' retries day 31→…→28
    got = _one(spark, "2/32/82", lambda c: cv.to_date(c, fuzzy=True))
    assert got == datetime.date(1982, 2, 28)


def test_unparseable_date_is_null(spark):
    assert _one(spark, "not a date", lambda c: cv.to_date(c, fuzzy=True)) is None


def test_to_time(spark):
    assert _one(spark, "04:14:00", cv.to_time) == "04:14:00"
    assert _one(spark, "4:14 PM", cv.to_time) == "16:14:00"


def test_to_datetime_iso(spark):
    got = _one(spark, "1971-01-01T04:14:00",
               lambda c: cv.to_datetime(c))
    assert got == datetime.datetime(1971, 1, 1, 4, 14, 0)


def test_type_cast_schema_driven(spark):
    # typed_scalars table (FIXTURES §2): one column per logical type
    df = spark.createDataFrame(
        [("Chicago Reader", "40", "1.0", "true", "1971-01-01",
          "04:14:00", "1971-01-01T04:14:00")],
        "text string, integer string, float string, boolean string, "
        "date string, time string, datetime string")
    types = [
        {"id": "text", "type": "text"}, {"id": "integer", "type": "int"},
        {"id": "float", "type": "float"}, {"id": "boolean", "type": "bool"},
        {"id": "date", "type": "date"}, {"id": "time", "type": "time"},
        {"id": "datetime", "type": "datetime"},
    ]
    out = cv.type_cast(df, types)
    row = out.collect()[0]
    assert row["integer"] == 40 and row["float"] == 1.0
    assert row["boolean"] is True
    assert row["date"] == datetime.date(1971, 1, 1)
    assert row["time"] == "04:14:00"
    assert row["datetime"] == datetime.datetime(1971, 1, 1, 4, 14)
    kinds = dict(out.dtypes)
    assert kinds["integer"] == "bigint" and kinds["float"] == "double"
    assert kinds["date"] == "date" and kinds["datetime"] == "timestamp"


def test_column_type_predicates(spark):
    from pyspark.sql import functions as F

    from meza_spark.functions import (is_bool_col, is_int_col, is_null_col,
                                      is_numeric_col)

    # corpus mirrors meza tests/test_fntools.py:35-75 incl. the
    # currency-zero regression (#36) and the leading-zero rule
    cases = [
        ("$0.00", True, False), ("2e12", True, False), ("1,000", True, True),
        ("02139", False, False), ("1.5", True, False), ("-42", True, True),
        ("£1,234.56", True, False), ("abc", False, False),
    ]
    df = spark.createDataFrame([(s,) for s, *_ in cases], "s string")
    got = {r["s"]: (r["num"], r["int"]) for r in df.select(
        "s", is_numeric_col(F.col("s")).alias("num"),
        is_int_col(F.col("s")).alias("int")).collect()}
    for s, num, isint in cases:
        assert got[s] == (num, isint), s

    df2 = spark.createDataFrame(
        [("y",), ("FALSE",), ("n/a",), ("",), ("x",)], "s string")
    rows = {r["s"]: (r["b"], r["nl"]) for r in df2.select(
        "s", is_bool_col(F.col("s")).alias("b"),
        is_null_col(F.col("s")).alias("nl")).collect()}
    assert rows["y"] == (True, False)
    assert rows["FALSE"] == (True, False)
    assert rows["n/a"] == (False, True)
    assert rows[""] == (False, True)
    assert rows["x"] == (False, False)
