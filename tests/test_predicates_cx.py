"""Point-in-polygon (vs independent winding-number oracle) and cx bbox
selection (vs brute force) on seeded random fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import cx_filter, st_point, st_point_in_polygon, with_bounds
from spatialpandas_spark.functions.predicates import st_point_in_multipolygon
from tests import geomgen, oracles

RNG = np.random.default_rng(7)


def test_point_in_polygon_matches_winding_oracle(spark):
    polys = geomgen.gen_polygons(RNG, 40)
    pts = [(x, y) for x, y in RNG.uniform(-60, 60, (50, 2))]
    rows = [
        (i, poly, float(x), float(y))
        for i, poly in polys
        for x, y in pts[:10]
    ]
    df = spark.createDataFrame(
        rows, "pid long, poly array<array<double>>, x double, y double"
    )
    got = df.select(
        "pid", "x", "y",
        st_point_in_polygon(F.col("x"), F.col("y"), F.col("poly")).alias("inside"),
    ).collect()
    lookup = dict(polys)
    for r in got:
        expect = oracles.point_in_polygon(r["x"], r["y"], lookup[r["pid"]])
        assert r["inside"] == expect, (r["pid"], r["x"], r["y"])


def test_point_in_polygon_hole_excludes(spark):
    shell = [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]
    hole = [2.0, 2.0, 2.0, 8.0, 8.0, 8.0, 8.0, 2.0, 2.0, 2.0]  # CW
    df = spark.createDataFrame(
        [(5.0, 5.0, False), (1.0, 1.0, True), (11.0, 5.0, False)],
        "x double, y double, expect boolean",
    )
    poly = F.lit([shell, hole]).cast("array<array<double>>")
    rows = df.withColumn(
        "got", st_point_in_polygon(F.col("x"), F.col("y"), poly)
    ).collect()
    for r in rows:
        assert r["got"] == r["expect"], (r["x"], r["y"])


def test_point_in_multipolygon(spark):
    p1 = [[0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0, 0.0, 0.0]]
    p2 = [[10.0, 10.0, 12.0, 10.0, 12.0, 12.0, 10.0, 12.0, 10.0, 10.0]]
    df = spark.createDataFrame(
        [(1.0, 1.0, True), (11.0, 11.0, True), (5.0, 5.0, False)],
        "x double, y double, expect boolean",
    )
    mp = F.lit([p1, p2]).cast("array<array<array<double>>>")
    rows = df.withColumn(
        "got", st_point_in_multipolygon(F.col("x"), F.col("y"), mp)
    ).collect()
    for r in rows:
        assert r["got"] == r["expect"]


def _point_df(spark, n=300):
    pts = geomgen.gen_points(RNG, n, null_frac=0.02)
    rows = [
        (i, p[0] if p else None, p[1] if p else None) for i, p in pts
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    return (
        with_bounds(
            df.select("id", "x", "y", st_point(F.col("x"), F.col("y")).alias("geom")),
            "geom",
            "point",
        ),
        {i: p for i, p in pts},
    )


def test_cx_matches_bruteforce_incl_inverted_degenerate(spark):
    df, lookup = _point_df(spark)
    # NULL x/y -> struct with null fields, not null struct: filter semantics
    # still exclude them (comparisons with null -> false)
    for _, rect in geomgen.gen_rects(RNG, 25):
        got = {r["id"] for r in cx_filter(df, "geom", "point", rect).collect()}
        x0, y0, x1, y1 = rect
        if x1 < x0:
            x0, x1 = x1, x0
        if y1 < y0:
            y0, y1 = y1, y0
        expect = {
            i
            for i, p in lookup.items()
            if p is not None and x0 <= p[0] <= x1 and y0 <= p[1] <= y1
        }
        assert got == expect, rect


def test_cx_polygons_exact(spark):
    polys = geomgen.gen_polygons(RNG, 60)
    df = spark.createDataFrame(polys, "id long, geom array<array<double>>")
    df = with_bounds(df, "geom", "polygon")
    for _, rect in geomgen.gen_rects(RNG, 15):
        got = {r["id"] for r in cx_filter(df, "geom", "polygon", rect).collect()}
        expect = {
            i for i, poly in polys if oracles.polygon_intersects_rect(poly, rect)
        }
        assert got == expect, rect


def test_cx_lines_exact(spark):
    lines = geomgen.gen_lines(RNG, 80)
    df = spark.createDataFrame(lines, "id long, geom array<double>")
    df = with_bounds(df, "geom", "line")
    for _, rect in geomgen.gen_rects(RNG, 15):
        got = {r["id"] for r in cx_filter(df, "geom", "line", rect).collect()}
        expect = {
            i for i, line in lines if oracles.line_intersects_rect(line, rect)
        }
        assert got == expect, rect


def test_intersects_bounds_rect_inside_polygon(spark):
    from spatialpandas_spark.functions.predicates import st_intersects_bounds

    # big square polygon; small rect fully inside touches no edges/vertices
    shell = [0.0, 0.0, 100.0, 0.0, 100.0, 100.0, 0.0, 100.0, 0.0, 0.0]
    hole = [40.0, 40.0, 40.0, 60.0, 60.0, 60.0, 60.0, 40.0, 40.0, 40.0]
    df = spark.createDataFrame([(1, [shell, hole])], "id long, geom array<array<double>>")
    checks = [
        ((10.0, 10.0, 20.0, 20.0), True),   # inside shell
        ((45.0, 45.0, 55.0, 55.0), False),  # inside hole
        ((-20.0, -20.0, -5.0, -5.0), False),
        ((30.0, 30.0, 70.0, 70.0), True),   # straddles hole boundary
        ((10.0, 10.0, 10.0, 50.0), False),  # degenerate rect
    ]
    for rect, expect in checks:
        got = df.select(
            st_intersects_bounds(F.col("geom"), "polygon", rect)
        ).first()[0]
        assert got == expect, rect
