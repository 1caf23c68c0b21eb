"""Reference doctest parity — the reference documents the expected
FIRST record of each `data/test` fixture inline in its reader
doctests (meza/io.py).  Those expectations are external acceptance
evidence exactly like data/converted/*.csv: they were written by the
reference project against its own fixtures.  This module asserts our
readers reproduce them.

Declared representation conventions (the "modulo" of the claim):

* A DataFrame column carries ONE type, so a sqlite column holding
  234 / 100 / 0.44 widens to double where the reference yields
  per-row native ints and floats (compare numerically).
* GeoJSON coordinates/properties come back as doubles, not
  ``Decimal`` (compare numerically).
* Blank header cells become ``column_N`` (the reference's read_html
  keeps a literal ``''`` key; its read_csv family uses the same
  column_N rule we follow).
* read_xls returns typed cells (ints/bools/ISO-date strings) rather
  than the reference's all-stringified values; the stringified forms
  are equal after ``str()`` (pinned in the golden-conversion suite).
"""

import math
import os

import pytest

from meza_spark.io import readers as mio

T = "/root/reference/data/test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(T), reason="reference fixtures not available")


def _first(df):
    return df.limit(1).collect()[0].asDict()


def test_doctest_read_dbf(spark):
    """meza/io.py:704-712: typed numerics, zero-padded and +signed
    codes stay text."""
    got = _first(mio.read_dbf(spark, f"{T}/test.dbf"))
    assert got["awater10"] == 12416573076
    assert got["aland10"] == 71546663636
    assert got["intptlat10"] == "+47.2400052"
    assert got["lsad10"] == "C2"
    assert got["cd111fp"] == "08"
    assert got["namelsad10"] == "Congressional District 8"
    assert got["statefp10"] == "27"


def test_doctest_read_sqlite(spark):
    """meza/io.py:742-748 (some_value widens to double — declared)."""
    got = _first(mio.read_sqlite(spark, f"{T}/test.sqlite"))
    assert got["sparse_data"] == "Iñtërnâtiônàližætiøn"
    assert got["some_date"] == "05/04/82"
    assert float(got["some_value"]) == 234
    assert got["unicode_test"] == "Ādam"


EXPECTED_CSVISH = {
    "sparse_data": "Iñtërnâtiônàližætiøn",
    "some_date": "05/04/82",
    "some_value": "234",
    "unicode_test": "Ādam",
}


def test_doctest_read_csv(spark):
    """meza/io.py:798-804: all-string records, sanitized headers."""
    got = _first(mio.read_csv(spark, f"{T}/test.csv", sanitize=True))
    for k, v in EXPECTED_CSVISH.items():
        assert got[k] == v, (k, got[k])


def test_doctest_read_tsv(spark):
    """meza/io.py:884-890: the excel-tab dialect twin."""
    got = _first(mio.read_tsv(spark, f"{T}/test.tsv", sanitize=True))
    for k, v in EXPECTED_CSVISH.items():
        assert got[k] == v, (k, got[k])


def test_doctest_read_fixed_fmt(spark):
    """meza/io.py:926-936: headerless 6-column widths — column_N
    names, the reference's own merged time+datetime final field."""
    got = _first(mio.read_fixed_fmt(spark, f"{T}/fixed.txt",
                                    [0, 18, 29, 33, 38, 50]))
    assert got == {
        "column_1": "Chicago Reader",
        "column_2": "1971-01-01",
        "column_3": "40",
        "column_4": "True",
        "column_5": "1.0",
        "column_6": "04:14:001971-01-01T04:14:00",
    }


def test_doctest_read_json(spark):
    """meza/io.py:1144-1152."""
    got = _first(mio.read_json(spark, f"{T}/test.json"))
    assert got["text"] == "Chicago Reader"
    assert float(got["float"]) == 1.0
    assert got["datetime"] == "1971-01-01T04:14:00"
    assert got["boolean"] is True
    assert got["time"] == "04:14:00"
    assert got["date"] == "1971-01-01"
    assert int(got["integer"]) == 40


def test_doctest_read_geojson(spark):
    """meza/io.py:1217-1228 (Decimal → double, declared)."""
    got = _first(mio.read_geojson(spark, f"{T}/test.geojson"))
    assert got["id"] == 6635402
    assert got["iso3"] == "ABW"
    assert math.isclose(got["bed_prv_pr"], 0.003)
    assert math.isclose(got["ic_mhg_cr"], 0.0246)
    assert float(got["bed_prv_cr"]) == 0
    assert got["type"] == "Point"
    assert math.isclose(got["lon"], -70.0624999987871)
    assert math.isclose(got["lat"], 12.637499976568533)


def test_doctest_read_html(spark):
    """meza/io.py:1367-1382 ('' header → column_1, declared; the
    1,244 thousands separator survives as text)."""
    got = _first(mio.read_html(spark, f"{T}/test.html"))
    assert got["column_1"] == "Mediterranean"
    assert got["january"] == "82"
    assert got["april"] == "1,244"
    assert got["december"] == "203"


def test_doctest_read_xls(spark):
    """meza/io.py:1073-1080 (typed cells — '234.0'/'1982-05-04'
    stringify to the reference's sanitize_sheet forms; the date is
    already the ISO string)."""
    got = _first(mio.read_xls(spark, f"{T}/test.xls"))
    assert got["some_date"] == "1982-05-04"
    assert float(got["some_value"]) == 234.0
    assert got["sparse_data"] == "Iñtërnâtiônàližætiøn"
    assert got["unicode_test"] == "Ādam"
    # and the xlsx twin of the same sheet
    got2 = _first(mio.read_xls(spark, f"{T}/test.xlsx"))
    assert got2["some_date"] == "1982-05-04"
    assert float(got2["some_value"]) == 234.0


def test_doctest_read_yaml(spark):
    """meza/io.py:1275-1284 — typed YAML records (PyYAML import-gated
    like the reference's optional deps)."""
    pytest.importorskip("yaml")
    import datetime as dt

    got = _first(mio.read_yaml(spark, f"{T}/test.yml"))
    assert got["text"] == "Chicago Reader"
    assert got["float"] == 1.0
    assert got["datetime"] == dt.datetime(1971, 1, 1, 4, 14)
    assert got["boolean"] is True
