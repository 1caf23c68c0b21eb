"""Grid-blocked radius join vs brute-force reference."""

import math

import pytest

from meza_spark.spatial import grid_radius_join, haversine_km


@pytest.fixture(scope="module")
def clouds(spark):
    import random

    rnd = random.Random(11)
    a = [(i, rnd.uniform(-5, 5), rnd.uniform(-5, 5)) for i in range(80)]
    b = [(i, rnd.uniform(-5, 5), rnd.uniform(-5, 5)) for i in range(70)]
    return (a, b,
            spark.createDataFrame(a, "id long, x double, y double"),
            spark.createDataFrame(b, "id long, x double, y double"))


def test_grid_radius_join_matches_bruteforce(clouds):
    a, b, la, rb = clouds
    r = 0.8
    got = {(row["id_l"], row["id_r"])
           for row in grid_radius_join(la, rb, r).collect()}
    exp = {(i, j) for i, xa, ya in a for j, xb, yb in b
           if (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r}
    assert got == exp
    assert exp  # the clouds do overlap


def test_grid_radius_join_no_duplicate_pairs(clouds):
    _a, _b, la, rb = clouds
    rows = grid_radius_join(la, rb, 1.5).collect()
    pairs = [(r["id_l"], r["id_r"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    # boundary cells included: points straddling cell edges match
    for r_ in rows:
        assert r_["dist_sq"] <= 1.5 * 1.5 + 1e-12


def test_grid_radius_join_rejects_bad_radius(clouds):
    _a, _b, la, rb = clouds
    with pytest.raises(ValueError):
        grid_radius_join(la, rb, 0)


def test_haversine_known_distance(spark):
    # London (51.5074, -0.1278) ↔ Paris (48.8566, 2.3522) ≈ 343.5 km
    df = spark.createDataFrame(
        [(51.5074, -0.1278, 48.8566, 2.3522)],
        "lat1 double, lon1 double, lat2 double, lon2 double")
    from pyspark.sql import functions as F

    km = df.select(haversine_km(
        F.col("lat1"), F.col("lon1"),
        F.col("lat2"), F.col("lon2")).alias("km")).collect()[0]["km"]
    assert math.isclose(km, 343.5, rel_tol=0.01)
