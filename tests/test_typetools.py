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


def test_confidence_break_reference_formula():
    """Pins the reference's convergence loop on FIXED input (the
    SF-dependent piece the infer_types_orders gate can't carry):
    confidence = a·ln(1+votes_chosen)/(1 + same), a=hweight, min over
    fields, rounded to 2 decimals, break at >= min_conf. With a=6 a
    uniform column needs 17 same-type votes; a column where every 4th
    row votes differently (bool-looking codes inside a text column)
    delays its chosen-type ('text') vote count and pushes the break
    out — mirroring o_orderstatus's 'F' rows."""
    import math

    from meza_spark import typetools as tt

    def conf(votes, a=6):
        x = a * math.log1p(votes)
        return round(x / (1 + x), 2)

    # uniform ints: break at the first n with conf(n) >= 0.95
    rows = [{"k": str(i + 1)} for i in range(100)]
    _, res = tt.detect_types(iter(rows))
    expect = next(n for n in range(1, 101) if conf(n) >= 0.95)
    assert res["count"] == expect == 17
    assert res["confidence"] == conf(expect)
    assert res["accurate"] is True
    assert res["types"] == [{"id": "k", "type": "int"}]

    # every 4th value is bool-looking → text needs 17 TEXT votes, so
    # the loop consumes ceil(17 / 0.75)≈23 rows, like orderstatus
    rows2 = [{"s": ("t" if i % 4 == 3 else f"w{i}")} for i in range(100)]
    _, res2 = tt.detect_types(iter(rows2))
    text_votes = 0
    consumed = 0
    for i in range(100):
        consumed += 1
        if i % 4 != 3:
            text_votes += 1
        if conf(text_votes) >= 0.95:
            break
    assert res2["count"] == consumed
    assert res2["types"] == [{"id": "s", "type": "text"}]

    # never-converging: max_iter consumed, accurate=False
    _, res3 = tt.detect_types(iter(rows), max_iter=5)
    assert res3["count"] == 5 and res3["accurate"] is False
