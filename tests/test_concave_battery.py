"""Concave-polygon property battery (round-3 verdict item 2).

The reference's hypothesis strategies build concave shells + holes via
Voronoi polygonization (ref tests/geometry/strategies.py:142-193); the
repo's previous fixtures were convex-only, leaving the ray-cast/winding
code paths most likely to harbor bugs — re-entrant corners, axis-parallel
grazing edges — unexercised. This battery reruns every predicate /
measure / cx / sjoin property suite over `gen_concave_polygons` (stars
with concave holes + rectilinear skylines) against the same independent
brute-force oracles.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import (
    cx_filter,
    sjoin,
    st_area,
    st_bounds,
    st_length,
    st_point_in_polygon,
    with_bounds,
)
from spatialpandas_spark.functions.predicates import st_intersects
from tests import geomgen, oracles
from tests.test_general_intersects import _line_poly_oracle, _poly_poly_oracle

RNG = np.random.default_rng(1234)
N = 120


@pytest.fixture(scope="module")
def concave():
    return geomgen.gen_concave_polygons(np.random.default_rng(99), N)


def test_concave_fixtures_are_actually_concave(concave):
    """Generator sanity: a healthy majority of shells have at least one
    re-entrant (clockwise-turning) vertex — the thing convex fixtures
    never have."""

    def has_reentrant(ring):
        n = len(ring) // 2 - 1
        for i in range(n):
            ax, ay = ring[2 * i], ring[2 * i + 1]
            bx, by = ring[2 * ((i + 1) % n)], ring[2 * ((i + 1) % n) + 1]
            cx, cy = ring[2 * ((i + 2) % n)], ring[2 * ((i + 2) % n) + 1]
            if (bx - ax) * (cy - by) - (by - ay) * (cx - bx) < 0:
                return True
        return False

    frac = sum(1 for _, poly in concave if has_reentrant(poly[0])) / len(concave)
    assert frac > 0.7, frac


def test_concave_area_matches_oracle(spark, concave):
    df = spark.createDataFrame(concave, "id long, geom array<array<double>>")
    got = {
        r["id"]: r["a"]
        for r in df.select("id", st_area(F.col("geom")).alias("a")).collect()
    }
    for i, poly in concave:
        assert got[i] == pytest.approx(oracles.polygon_area(poly), rel=1e-9), i
        assert got[i] > 0  # CCW shell + CW holes: net positive


def test_concave_perimeter_and_bounds_match_oracle(spark, concave):
    df = spark.createDataFrame(concave, "id long, geom array<array<double>>")
    rows = df.select(
        "id",
        st_length(F.col("geom"), "polygon").alias("l"),
        st_bounds(F.col("geom"), "polygon").alias("b"),
    ).collect()
    lookup = dict(concave)
    for r in rows:
        poly = lookup[r["id"]]
        assert r["l"] == pytest.approx(
            sum(oracles.ring_length(rr) for rr in poly), rel=1e-9
        )
        flat = [v for ring in poly for v in ring]
        x0, y0, x1, y1 = oracles.coords_bounds(flat)
        assert (r["b"]["x0"], r["b"]["y0"], r["b"]["x1"], r["b"]["y1"]) == (
            pytest.approx(x0),
            pytest.approx(y0),
            pytest.approx(x1),
            pytest.approx(y1),
        )


def test_concave_point_in_polygon_matches_winding_oracle(spark, concave):
    """The headline concavity test: probe points include vertex-adjacent
    and edge-adjacent positions where ray-cast parity through re-entrant
    corners goes wrong first."""
    rng = np.random.default_rng(5)
    rows = []
    for i, poly in concave[:60]:
        flat = [v for ring in poly for v in ring]
        x0, y0, x1, y1 = oracles.coords_bounds(flat)
        for _ in range(6):  # random probes across the bbox (inside + out)
            rows.append(
                (i, poly, float(rng.uniform(x0 - 1, x1 + 1)), float(rng.uniform(y0 - 1, y1 + 1)))
            )
        shell = poly[0]
        for j in range(0, min(len(shell) // 2 - 1, 4)):
            # near-vertex probes: tiny offsets off a real vertex
            rows.append((i, poly, shell[2 * j] + 1e-7, shell[2 * j + 1] - 1e-7))
            # horizontal-ray-through-vertex probes: exact y of a vertex
            rows.append((i, poly, shell[2 * j] - 3.0, shell[2 * j + 1]))
    df = spark.createDataFrame(
        rows, "pid long, poly array<array<double>>, x double, y double"
    )
    got = df.select(
        "pid", "x", "y",
        st_point_in_polygon(F.col("x"), F.col("y"), F.col("poly")).alias("inside"),
    ).collect()
    lookup = dict(concave)
    for r in got:
        expect = oracles.point_in_polygon(r["x"], r["y"], lookup[r["pid"]])
        assert r["inside"] == expect, (r["pid"], r["x"], r["y"])


def test_concave_cx_matches_bruteforce(spark, concave):
    df = spark.createDataFrame(concave, "id long, geom array<array<double>>")
    df = with_bounds(df, "geom", "polygon")
    rect_rng = np.random.default_rng(17)
    for _, rect in geomgen.gen_rects(rect_rng, 12):
        got = {r["id"] for r in cx_filter(df, "geom", "polygon", rect).collect()}
        expect = {
            i for i, poly in concave if oracles.polygon_intersects_rect(poly, rect)
        }
        assert got == expect, rect


def test_concave_polygon_polygon_intersects_matches_oracle(spark, concave):
    rows = [
        (ia * 1000 + ib, a, b)
        for ia, a in concave[:10]
        for ib, b in concave[10:22]
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<array<double>>, b array<array<double>>"
    )
    got = {
        r["id"]: r["x"]
        for r in df.select(
            "id",
            st_intersects(F.col("a"), "polygon", F.col("b"), "polygon").alias("x"),
        ).collect()
    }
    for pid, a, b in rows:
        assert got[pid] == _poly_poly_oracle(a, b), pid


def test_concave_line_polygon_intersects_matches_oracle(spark, concave):
    lines = geomgen.gen_lines(np.random.default_rng(3), 25)
    rows = [
        (il * 1000 + ip, line, poly)
        for il, line in lines
        for ip, poly in concave[:12]
    ]
    df = spark.createDataFrame(
        rows, "id long, l array<double>, p array<array<double>>"
    )
    got = {
        r["id"]: r["x"]
        for r in df.select(
            "id",
            st_intersects(F.col("l"), "line", F.col("p"), "polygon").alias("x"),
        ).collect()
    }
    for pid, line, poly in rows:
        assert got[pid] == _line_poly_oracle(line, poly), pid


def test_concave_sjoin_point_in_polygon(spark, concave):
    """sjoin (broadcast AND grid strategy) over concave polygons x points
    must equal the winding-number oracle pair set."""
    rng = np.random.default_rng(11)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(-60, 60, (250, 2)))]
    polys = concave[:40]
    left = spark.createDataFrame(pts, "pid long, x double, y double")
    from spatialpandas_spark import st_point

    left = left.select("pid", st_point(F.col("x"), F.col("y")).alias("geom"))
    right = spark.createDataFrame(polys, "gid long, geom array<array<double>>")
    expect = {
        (pid, gid)
        for pid, x, y in pts
        for gid, poly in polys
        if oracles.point_in_polygon(x, y, poly)
    }
    for strategy in ("broadcast", "grid"):
        kw = {"cell_size": 20.0} if strategy == "grid" else {}
        j = sjoin(
            left, right, left_geom="geom", right_geom="geom",
            left_type="point", right_type="polygon", strategy=strategy, **kw,
        )
        got = {(r["pid"], r["gid"]) for r in j.collect()}
        assert got == expect, strategy
