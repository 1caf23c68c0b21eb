"""Reference golden-conversion parity (round-7 verdict task #1).

The reference ships its own published acceptance conversions in
``/root/reference/data/converted/*.csv``.  These are EXTERNAL evidence:
they were produced by the reference project itself, not by this repo,
so matching them value-for-value validates the whole read → detect →
cast → render vertical independently of our self-made oracle gates.

Each test runs the matching ``data/test`` fixture through this engine's
pipeline and asserts row/value-level equality against the golden file.

Declared type-rendering rules (the "modulo" of the parity claim):

* Values compare through Python ``str()`` of the typed value (bool →
  ``True``/``False``, datetime → ISO-8601 with ``T``, None → empty) —
  exactly what the reference's ``csv.writer`` emits for typed records.
  Our distributed ``records2csv`` keeps Spark/DuckDB-compatible
  lowercase booleans instead; the renderer here states the reference's
  convention explicitly rather than hiding it in a writer flag.
* ``detect_types`` is called with ``hweight=1``: hweight only weights
  the confidence formula (the reference's header-name guesses never
  reach its tally — meza/process.py:328-332 consumes the generator
  before the weight-add runs), so a low hweight just makes the sample
  converge slower; the detected types are identical.
* Documented fixture skews (each verified against sibling fixtures):
  - test.xlsx sheet 2 carries 1904-epoch date serials without the
    workbookPr date1904 flag; data/converted/sheet_2.csv and the same
    rows in test.json (1920/1948/1971 dates) prove the 1904 epoch, so
    the read passes ``date1904=True``.
  - sheet_2.csv's trailing ``_unnamed`` column is the tabutils-era
    name for a blank header; this engine names it ``column_9``.
  - geojson.csv's source file is not checked in; its three rows are
    the canonical RFC 7946 FeatureCollection example (Point /
    LineString / Polygon with prop0/prop1), reconstructed verbatim
    from the public spec.
  - geo.csv's source (hacktyler artmap) is not checked in; it is
    exercised as a csv → geojson → csv round trip instead, with
    lat/lon compared numerically (GeoJSON numbers cannot carry
    trailing zeros like "32.35100").
"""

import csv
import datetime
import decimal
import json
import os

import pytest
from pyspark.sql import functions as F

from meza_spark import convert as cv
from meza_spark import typetools as tt
from meza_spark.io import readers as mio
from meza_spark.io.writers import records2geojson

TEST_DIR = "/root/reference/data/test"
GOLD_DIR = "/root/reference/data/converted"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD_DIR),
    reason="reference golden conversions not available")


def _golden(name):
    with open(os.path.join(GOLD_DIR, name), newline="",
              encoding="utf-8") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


def _render(v):
    """Reference csv rendering: Python str() of the typed value."""
    if v is None:
        return ""
    if v is True:
        return "True"
    if v is False:
        return "False"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def _detect_cast(df):
    _, res = tt.detect_types(df, hweight=1)
    return cv.type_cast(df, res["types"])


def _assert_matches(golden_name, df, skip_cols=(), numeric_cols=()):
    hdr, grows = _golden(golden_name)
    missing = [c for c in hdr if c not in df.columns and c not in skip_cols]
    assert not missing, f"missing columns {missing}; have {df.columns}"
    cols = [c for c in hdr if c not in skip_cols]
    ours = sorted(tuple(_render(r[c]) for c in cols) for r in df.collect())
    gold = sorted(tuple(v for c, v in zip(hdr, row) if c not in skip_cols)
                  for row in grows)
    assert len(ours) == len(gold)
    for o, g in zip(ours, gold):
        for c, ov, gv in zip(cols, o, g):
            if c in numeric_cols:
                assert float(ov) == float(gv), (c, ov, gv)
            else:
                assert ov == gv, (c, ov, gv)


def test_golden_json(spark):
    """test.json → detect_types → type_cast ≙ data/converted/json.csv."""
    df = _detect_cast(mio.read_json(spark, f"{TEST_DIR}/test.json"))
    _assert_matches("json.csv", df)


def test_golden_json_multiline(spark):
    """newline.json (NDJSON) ≙ data/converted/json_multiline.csv."""
    df = _detect_cast(mio.read_ndjson(spark, f"{TEST_DIR}/newline.json"))
    _assert_matches("json_multiline.csv", df)


def test_golden_fixed(spark):
    """fixed.txt (8-column width spec; names from the golden header)
    ≙ data/converted/fixed.csv.  Exercises width slicing, the blank
    row → all-empty record, and the separator-mangled float field
    '41800000.01,' that must still detect and cast as numeric."""
    fx = mio.read_fixed_fmt(spark, f"{TEST_DIR}/fixed.txt",
                            [0, 18, 29, 33, 38, 50, 58, 77])
    fx = fx.toDF("text", "date", "integer", "boolean", "float", "time",
                 "datetime", "empty_column")
    _assert_matches("fixed.csv", _detect_cast(fx))


def test_golden_dbf(spark):
    """test.dbf ≙ data/converted/dbf.csv: zero-padded codes stay text
    (cd111fp '08'), big ints stay ints (aland10), +signed coordinates
    cast to float, single-letter F fields cast to bool."""
    df = _detect_cast(mio.read_dbf(spark, f"{TEST_DIR}/test.dbf"))
    _assert_matches("dbf.csv", df)


def test_golden_sheet_2(spark):
    """test.xlsx sheet 2 ≙ data/converted/sheet_2.csv (see module
    docstring for the 1904-epoch and _unnamed skews)."""
    df = mio.read_xls(spark, f"{TEST_DIR}/test.xlsx", sheet=1,
                      date1904=True)
    df = _detect_cast(df).withColumnRenamed("column_9", "_unnamed")
    _assert_matches("sheet_2.csv", df)


def test_golden_geojson(spark, tmp_path):
    """RFC 7946 canonical example → read_geojson(explode=False)
    ≙ data/converted/geojson.csv — feature-level records with the
    geometry serialized into a ``geojson`` column, heterogeneous
    prop1 (absent / 0.0 / nested object) widening to text with
    Python renderings ('0.0', "{'this': 'that'}")."""
    rfc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [102.0, 0.5]},
         "properties": {"prop0": "value0"}},
        {"type": "Feature",
         "geometry": {"type": "LineString",
                      "coordinates": [[102.0, 0.0], [103.0, 1.0],
                                      [104.0, 0.0], [105.0, 1.0]]},
         "properties": {"prop0": "value0", "prop1": 0.0}},
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[100.0, 0.0], [101.0, 0.0],
                                       [101.0, 1.0], [100.0, 1.0],
                                       [100.0, 0.0]]]},
         "properties": {"prop0": "value0",
                        "prop1": {"this": "that"}}}]}
    p = str(tmp_path / "rfc.geojson")
    with open(p, "w", encoding="utf-8") as f:
        json.dump(rfc, f)
    df = mio.read_geojson(spark, p, explode=False)
    _assert_matches("geojson.csv", df)


def test_golden_geo_roundtrip(spark, tmp_path):
    """data/converted/geo.csv → records2geojson → read_geojson → back:
    every property and coordinate survives the GeoJSON trip (real-world
    messy data: HTML + RFC 4180 doubled quotes in descriptions, empty
    fields, 5-7 decimal coordinates).  The venue 'type' column is
    renamed around the trip because GeoJSON reserves 'type' for the
    geometry type (same collision exists in the reference's
    records2geojson, meza/convert.py:998-1099)."""
    geo = mio.read_csv(spark, f"{GOLD_DIR}/geo.csv")
    trip = (geo.withColumnRenamed("type", "venue_type")
               .withColumn("longitude", F.col("longitude").cast("double"))
               .withColumn("latitude", F.col("latitude").cast("double")))
    p = str(tmp_path / "geo_trip.geojson")
    records2geojson(trip, p, id_col="slug", lon_col="longitude",
                    lat_col="latitude")
    back = (mio.read_geojson(spark, p)
            .withColumnRenamed("id", "slug")
            .withColumnRenamed("lon", "longitude")
            .withColumnRenamed("lat", "latitude")
            .drop("type")
            .withColumnRenamed("venue_type", "type"))
    _assert_matches("geo.csv", back,
                    numeric_cols={"latitude", "longitude"})
