"""Spatial joins over coordinate columns — grid-cell blocking.

The reference reads/writes GeoJSON (ref meza/io.py:1191-1251,
convert.py:998-1099) but has no spatial JOIN; this module adds the
scale-first one: an all-pairs radius join is O(n·m), so candidates are
blocked by hashing points into r-sized grid cells and joining each
left cell against its 3×3 neighborhood — the same
bucket-then-verify architecture as the LSH/minhash joins (cost
O(collisions), never O(n·m)).

``grid_radius_join`` is PLANAR (squared euclidean in coordinate
units): multiplication/addition/compare only — bit-portable IEEE on
any engine, so the differential oracle replays it exactly.
``haversine_km`` is provided for geographic distance; engines'
libm trig differs in the last ulp, so haversine *thresholds* belong in
tolerance gates, not hash gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_radius_join", "haversine_km"]


def haversine_km(lat1: Column, lon1: Column,
                 lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine, R=6371). All-builtin
    trig (codegen); see module note on cross-engine ulp parity."""
    rad = 0.017453292519943295  # pi/180
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    a = (F.pow(F.sin(dlat / 2), 2)
         + F.cos(lat1 * rad) * F.cos(lat2 * rad)
         * F.pow(F.sin(dlon / 2), 2))
    return F.lit(2 * 6371.0) * F.asin(F.sqrt(a))


def grid_radius_join(left: DataFrame, right: DataFrame,
                     radius: float,
                     x_col: str = "x", y_col: str = "y",
                     suffixes: tuple = ("_l", "_r")) -> DataFrame:
    """All (left, right) pairs within planar ``radius``:
    ``(dx² + dy²) ≤ radius²``, plus a ``dist_sq`` column.

    Blocking: each point lands in its ``floor(coord / radius)`` grid
    cell; the right side explodes to its cell's 3×3 neighborhood, so
    every qualifying pair shares exactly one join key (the LEFT
    point's cell) and appears exactly once — no post-dedup. The
    equi-join shuffles cell keys + coordinates only; the quadratic
    term is bounded by per-cell density (skewed hot cells: pre-filter
    or shrink ``radius``'s cell granularity the same way LSH caps
    buckets).
    """
    if radius <= 0:
        raise ValueError("grid_radius_join: radius must be positive")
    r = float(radius)

    def cell(c):
        return F.floor(F.col(c) / r).cast("long")

    sl, sr = suffixes
    lx, ly = x_col + sl, y_col + sl
    rx, ry = x_col + sr, y_col + sr
    lf = left.select(
        *[F.col(c).alias(c + sl) for c in left.columns],
        cell(x_col).alias("_cx"), cell(y_col).alias("_cy"))
    neigh = F.explode(F.expr(
        "flatten(transform(sequence(-1, 1), dx -> "
        "transform(sequence(-1, 1), dy -> struct(dx, dy))))"))
    rf = (right.select(
        *[F.col(c).alias(c + sr) for c in right.columns],
        cell(x_col).alias("_bx"), cell(y_col).alias("_by"))
        .select("*", neigh.alias("_n"))
        .select(*[c + sr for c in right.columns],
                (F.col("_bx") + F.col("_n.dx")).alias("_cx"),
                (F.col("_by") + F.col("_n.dy")).alias("_cy")))
    j = lf.join(rf, on=["_cx", "_cy"])
    # plain multiplication, not pow(x, 2): libm pow is engine-specific
    # in the last ulp; x*x is a single IEEE multiply everywhere
    dx = F.col(lx) - F.col(rx)
    dy = F.col(ly) - F.col(ry)
    dist_sq = dx * dx + dy * dy
    return (j.withColumn("dist_sq", dist_sq)
            .where(F.col("dist_sq") <= F.lit(r * r))
            .drop("_cx", "_cy"))
