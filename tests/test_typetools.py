"""Type-inference tests (ref corpus: meza tests/test_process.py:38-83
detect_types convergence; values re-derived, not copied)."""

from meza_spark.typetools import (
    detect_types, guess_type_by_field, guess_type_by_value,
)


def test_guess_by_field_names():
    assert guess_type_by_field("count") == "int"
    assert guess_type_by_field("value") == "float"
    assert guess_type_by_field("datetime") == "datetime"
    assert guess_type_by_field("start_time") == "time"
    assert guess_type_by_field("birth_date") == "date"
    assert guess_type_by_field("name") == "text"


def test_guess_by_value_ladder():
    assert guess_type_by_value(None) == "null"
    assert guess_type_by_value("n/a") == "null"
    assert guess_type_by_value("yes") == "bool"
    assert guess_type_by_value(True) == "bool"
    assert guess_type_by_value("42") == "int"
    assert guess_type_by_value("$1,234") == "int"
    assert guess_type_by_value("1.5") == "float"
    assert guess_type_by_value("02139") == "text"  # leading zero: zip code
    assert guess_type_by_value("2000-01-01 00:00:00") == "datetime"
    assert guess_type_by_value("04:14:00") == "time"
    assert guess_type_by_value("1971-01-01") == "date"
    assert guess_type_by_value("hello") == "text"


def test_detect_types_on_dicts():
    rows = [{"sales_count": "3", "amount": "$1.50", "when": "2020-01-02",
             "note": "x"}] * 40
    _, result = detect_types(iter(rows))
    types = {t["id"]: t["type"] for t in result["types"]}
    assert types["sales_count"] == "int"
    assert types["amount"] == "float"   # field-name weight loses to values? amount→float via both
    assert types["when"] == "date"
    assert types["note"] == "text"
    assert 0 < result["confidence"] <= 1
    assert result["count"] <= 40


def test_detect_types_widening_int_float():
    rows = [{"x": "1"}, {"x": "2.5"}] * 30
    _, result = detect_types(iter(rows), hweight=0)
    types = {t["id"]: t["type"] for t in result["types"]}
    assert types["x"] == "float"


def test_detect_types_on_dataframe(spark):
    df = spark.createDataFrame([("1", "a"), ("2", "b")] * 20, "n string, s string")
    _, result = detect_types(df)
    types = {t["id"]: t["type"] for t in result["types"]}
    assert types["n"] == "int" and types["s"] == "text"
