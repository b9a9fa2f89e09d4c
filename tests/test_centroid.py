"""st_centroid / st_distance vs pure-Python oracles."""

import math

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import st_point
from spatialpandas_spark.functions.measures import st_centroid, st_distance


def _py_line_centroid(coords):
    tl = mx = my = 0.0
    pts = [(coords[i], coords[i + 1]) for i in range(0, len(coords), 2)]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        d = math.hypot(x1 - x0, y1 - y0)
        tl += d
        mx += d * (x0 + x1) / 2
        my += d * (y0 + y1) / 2
    return (mx / tl, my / tl) if tl else (float("nan"),) * 2


def _py_poly_centroid(rings):
    a2 = sx = sy = 0.0
    for ring in rings:
        pts = [(ring[i], ring[i + 1]) for i in range(0, len(ring), 2)]
        if len(pts) < 3:
            continue
        closed = pts + [pts[0]]
        for (x0, y0), (x1, y1) in zip(closed, closed[1:]):
            cr = x0 * y1 - x1 * y0
            a2 += cr
            sx += (x0 + x1) * cr
            sy += (y0 + y1) * cr
    return (sx / (3 * a2), sy / (3 * a2)) if a2 else (float("nan"),) * 2


def _one(spark, value, schema, expr):
    df = spark.createDataFrame([(value,)], schema)
    r = df.select(expr.alias("c")).first()["c"]
    return r["x"], r["y"]


def test_point_centroid_identity(spark):
    df = spark.createDataFrame([(3.0, 4.0)], "x double, y double")
    r = df.select(st_centroid(st_point(F.col("x"), F.col("y")), "point").alias("c")).first()["c"]
    assert (r["x"], r["y"]) == (3.0, 4.0)


def test_multipoint_mean(spark):
    got = _one(
        spark, [0.0, 0.0, 4.0, 0.0, 2.0, 6.0], "g array<double>",
        st_centroid(F.col("g"), "multipoint"),
    )
    assert got == (2.0, 2.0)


def test_line_centroid_weighted(spark):
    coords = [0.0, 0.0, 10.0, 0.0, 10.0, 5.0]
    got = _one(spark, coords, "g array<double>", st_centroid(F.col("g"), "line"))
    expect = _py_line_centroid(coords)
    assert got == pytest.approx(expect, abs=1e-12)


def test_polygon_with_hole_centroid(spark):
    # square with an off-center square hole: centroid shifts away from hole
    shell = [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]
    hole = [6.0, 4.0, 6.0, 6.0, 8.0, 6.0, 8.0, 4.0, 6.0, 4.0]  # CW
    rings = [shell, hole]
    got = _one(
        spark, rings, "g array<array<double>>", st_centroid(F.col("g"), "polygon")
    )
    expect = _py_poly_centroid(rings)
    assert got == pytest.approx(expect, abs=1e-12)
    assert got[0] < 5.0  # pulled left, away from the right-side hole


def test_degenerate_polygon_nan(spark):
    rings = [[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]]
    got = _one(
        spark, rings, "g array<array<double>>", st_centroid(F.col("g"), "polygon")
    )
    assert math.isnan(got[0]) and math.isnan(got[1])


def test_multipolygon_additive(spark):
    # two unit squares side by side -> centroid between them
    p1 = [[0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0]]
    p2 = [[2.0, 0.0, 3.0, 0.0, 3.0, 1.0, 2.0, 1.0, 2.0, 0.0]]
    got = _one(
        spark, [p1, p2], "g array<array<array<double>>>",
        st_centroid(F.col("g"), "multipolygon"),
    )
    assert got == pytest.approx((1.5, 0.5), abs=1e-12)


def test_st_distance(spark):
    df = spark.createDataFrame([(0.0, 0.0, 3.0, 4.0)], "ax double, ay double, bx double, by double")
    d = df.select(
        st_distance(
            st_point(F.col("ax"), F.col("ay")), st_point(F.col("bx"), F.col("by"))
        ).alias("d")
    ).first()["d"]
    assert d == 5.0
