"""st_area / st_length / st_bounds vs independent Python oracles on seeded
random geometry (reference oracle philosophy, SURVEY.md §5.1)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import st_area, st_bounds, st_length
from tests import geomgen, oracles

RNG = np.random.default_rng(42)
N = 200


def test_polygon_area_matches_oracle(spark):
    polys = geomgen.gen_polygons(RNG, N)
    df = spark.createDataFrame(polys, "id long, geom array<array<double>>")
    got = {
        r["id"]: r["a"]
        for r in df.select("id", st_area(F.col("geom")).alias("a")).collect()
    }
    for i, poly in polys:
        assert got[i] == pytest.approx(oracles.polygon_area(poly), rel=1e-9), i


def test_polygon_perimeter_matches_oracle(spark):
    polys = geomgen.gen_polygons(RNG, N)
    df = spark.createDataFrame(polys, "id long, geom array<array<double>>")
    got = {
        r["id"]: r["l"]
        for r in df.select(
            "id", st_length(F.col("geom"), "polygon").alias("l")
        ).collect()
    }
    for i, poly in polys:
        expect = sum(oracles.ring_length(r) for r in poly)
        assert got[i] == pytest.approx(expect, rel=1e-9), i


def test_line_length_and_zero_area(spark):
    lines = geomgen.gen_lines(RNG, N)
    df = spark.createDataFrame(lines, "id long, geom array<double>")
    rows = df.select(
        "id",
        st_length(F.col("geom"), "line").alias("l"),
        st_area(F.col("geom"), "line").alias("a"),
    ).collect()
    expect = dict(lines)
    for r in rows:
        assert r["l"] == pytest.approx(oracles.ring_length(expect[r["id"]]), rel=1e-9)
        assert r["a"] == 0.0


def test_multiline_length_sums_parts(spark):
    mls = geomgen.gen_multilines(RNG, 100)
    df = spark.createDataFrame(mls, "id long, geom array<array<double>>")
    got = {
        r["id"]: r["l"]
        for r in df.select(
            "id", st_length(F.col("geom"), "multiline").alias("l")
        ).collect()
    }
    for i, parts in mls:
        assert got[i] == pytest.approx(
            sum(oracles.ring_length(p) for p in parts), rel=1e-9
        )


def test_bounds_matches_oracle(spark):
    polys = geomgen.gen_polygons(RNG, N)
    df = spark.createDataFrame(polys, "id long, geom array<array<double>>")
    rows = df.select("id", st_bounds(F.col("geom"), "polygon").alias("b")).collect()
    expect = dict(polys)
    for r in rows:
        flat = [v for ring in expect[r["id"]] for v in ring]
        x0, y0, x1, y1 = oracles.coords_bounds(flat)
        assert r["b"]["x0"] == pytest.approx(x0)
        assert r["b"]["y0"] == pytest.approx(y0)
        assert r["b"]["x1"] == pytest.approx(x1)
        assert r["b"]["y1"] == pytest.approx(y1)


def test_degenerate_ring_contributes_zero_area(spark):
    # < 3 points -> 0 (ref measures.py:40-42)
    df = spark.createDataFrame(
        [(1, [[0.0, 0.0, 1.0, 1.0]])], "id long, geom array<array<double>>"
    )
    assert df.select(st_area(F.col("geom"))).first()[0] == 0.0


def test_null_geometry_yields_nan(spark):
    df = spark.createDataFrame([(1, None)], "id long, geom array<array<double>>")
    r = df.select(
        st_area(F.col("geom")).alias("a"),
        st_length(F.col("geom"), "polygon").alias("l"),
        st_bounds(F.col("geom"), "polygon").alias("b"),
    ).first()
    assert math.isnan(r["a"]) and math.isnan(r["l"])
    assert math.isnan(r["b"]["x0"])


def test_nonfinite_segments_skipped_in_length(spark):
    # NaN vertex: both adjacent segments skipped (ref measures.py:21-22)
    line = [0.0, 0.0, float("nan"), 1.0, 3.0, 4.0, 6.0, 8.0]
    df = spark.createDataFrame([(1, line)], "id long, geom array<double>")
    assert df.select(st_length(F.col("geom"), "line")).first()[0] == pytest.approx(
        5.0
    )


def test_nonfinite_coords_skipped_in_bounds(spark):
    line = [0.0, 0.0, float("inf"), 1.0, 3.0, 4.0]
    df = spark.createDataFrame([(1, line)], "id long, geom array<double>")
    b = df.select(st_bounds(F.col("geom"), "line").alias("b")).first()["b"]
    assert (b["x0"], b["y0"], b["x1"], b["y1"]) == (0.0, 0.0, 3.0, 4.0)


def test_point_measures(spark):
    from spatialpandas_spark import st_point

    df = spark.createDataFrame([(1, 2.0, 3.0)], "id long, x double, y double")
    df = df.select("id", st_point(F.col("x"), F.col("y")).alias("geom"))
    r = df.select(
        st_length(F.col("geom"), "point").alias("l"),
        st_area(F.col("geom"), "point").alias("a"),
        st_bounds(F.col("geom"), "point").alias("b"),
    ).first()
    assert r["l"] == 0.0 and r["a"] == 0.0
    assert (r["b"]["x0"], r["b"]["y1"]) == (2.0, 3.0)


def test_multipolygon_area_sums(spark):
    p1 = geomgen.gen_convex_polygon(RNG)
    p2 = geomgen.gen_convex_polygon(RNG)
    df = spark.createDataFrame(
        [(1, [p1, p2])], "id long, geom array<array<array<double>>>"
    )
    got = df.select(st_area(F.col("geom"), "multipolygon")).first()[0]
    assert got == pytest.approx(
        oracles.polygon_area(p1) + oracles.polygon_area(p2), rel=1e-9
    )
