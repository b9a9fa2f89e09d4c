"""General geometry×geometry st_intersects (parity-plus: reference's point
family extended to all pairs) + sjoin over non-point pairs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import sjoin
from spatialpandas_spark.functions.predicates import st_intersects
from tests import geomgen, oracles

RNG = np.random.default_rng(37)


def _poly_poly_oracle(a, b):
    """Independent brute force: any vertex containment either way or any
    segment pair intersecting."""
    for ring in a:
        n = len(ring) // 2
        for i in range(n):
            if oracles.point_in_polygon(ring[2 * i], ring[2 * i + 1], b):
                return True
    for ring in b:
        n = len(ring) // 2
        for i in range(n):
            if oracles.point_in_polygon(ring[2 * i], ring[2 * i + 1], a):
                return True
    for ra in a:
        na = len(ra) // 2
        for rb in b:
            nb = len(rb) // 2
            for i in range(na - 1):
                for j in range(nb - 1):
                    if oracles._seg_seg(
                        (ra[2 * i], ra[2 * i + 1]),
                        (ra[2 * i + 2], ra[2 * i + 3]),
                        (rb[2 * j], rb[2 * j + 1]),
                        (rb[2 * j + 2], rb[2 * j + 3]),
                    ):
                        return True
    return False


def _line_poly_oracle(line, poly):
    n = len(line) // 2
    for i in range(n):
        if oracles.point_in_polygon(line[2 * i], line[2 * i + 1], poly):
            return True
    for ring in poly:
        nr = len(ring) // 2
        for i in range(n - 1):
            for j in range(nr - 1):
                if oracles._seg_seg(
                    (line[2 * i], line[2 * i + 1]),
                    (line[2 * i + 2], line[2 * i + 3]),
                    (ring[2 * j], ring[2 * j + 1]),
                    (ring[2 * j + 2], ring[2 * j + 3]),
                ):
                    return True
    return False


def test_polygon_polygon_handcrafted(spark):
    def sq(x0, y0, s):
        x0, y0, s = float(x0), float(y0), float(s)
        return [[x0, y0, x0 + s, y0, x0 + s, y0 + s, x0, y0 + s, x0, y0]]
    big_with_hole = [
        [0.0, 0.0, 20.0, 0.0, 20.0, 20.0, 0.0, 20.0, 0.0, 0.0],
        [5.0, 5.0, 5.0, 15.0, 15.0, 15.0, 15.0, 5.0, 5.0, 5.0],
    ]
    cases = [
        (sq(0, 0, 4), sq(2, 2, 4), True),    # overlap
        (sq(0, 0, 4), sq(10, 10, 2), False),  # disjoint
        (sq(0, 0, 10), sq(2, 2, 3), True),    # containment
        (big_with_hole, sq(8, 8, 2), False),  # inside the hole
        (big_with_hole, sq(1, 1, 2), True),   # inside shell, outside hole
        (big_with_hole, sq(4, 4, 8), True),   # straddles hole boundary
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b, _) in enumerate(cases)],
        "id long, a array<array<double>>, b array<array<double>>",
    )
    got = {
        r["id"]: r["x"]
        for r in df.select(
            "id", st_intersects(F.col("a"), "polygon", F.col("b"), "polygon").alias("x")
        ).collect()
    }
    for i, (_, _, expect) in enumerate(cases):
        assert got[i] == expect, i


def test_polygon_polygon_random_matches_oracle(spark):
    polys = geomgen.gen_polygons(RNG, 25)
    rows = [
        (ia * 100 + ib, a, b)
        for ia, a in polys[:12]
        for ib, b in polys[12:]
    ]
    df = spark.createDataFrame(rows, "id long, a array<array<double>>, b array<array<double>>")
    got = {
        r["id"]: r["x"]
        for r in df.select(
            "id", st_intersects(F.col("a"), "polygon", F.col("b"), "polygon").alias("x")
        ).collect()
    }
    for pid, a, b in rows:
        assert got[pid] == _poly_poly_oracle(a, b), pid


def test_line_polygon_random_matches_oracle(spark):
    lines = geomgen.gen_lines(RNG, 30)
    polys = geomgen.gen_polygons(RNG, 12)
    rows = [
        (il * 100 + ip, line, poly)
        for il, line in lines
        for ip, poly in polys
    ]
    df = spark.createDataFrame(
        rows, "id long, l array<double>, p array<array<double>>"
    )
    got = {
        r["id"]: r["x"]
        for r in df.select(
            "id", st_intersects(F.col("l"), "line", F.col("p"), "polygon").alias("x")
        ).collect()
    }
    for pid, line, poly in rows:
        assert got[pid] == _line_poly_oracle(line, poly), pid


def test_line_line_crossing_and_disjoint(spark):
    df = spark.createDataFrame([(1,)], "id long")
    cross = st_intersects(
        F.lit([0.0, 0.0, 10.0, 10.0]).cast("array<double>"), "line",
        F.lit([0.0, 10.0, 10.0, 0.0]).cast("array<double>"), "line",
    )
    apart = st_intersects(
        F.lit([0.0, 0.0, 1.0, 1.0]).cast("array<double>"), "line",
        F.lit([5.0, 5.0, 6.0, 5.0]).cast("array<double>"), "line",
    )
    r = df.select(cross.alias("c"), apart.alias("a")).first()
    assert r["c"] is True and r["a"] is False


def test_sjoin_polygon_polygon(spark):
    polys = geomgen.gen_polygons(RNG, 24)
    left = spark.createDataFrame(polys[:12], "lid long, geom array<array<double>>")
    right = spark.createDataFrame(polys[12:], "rid long, geom array<array<double>>")
    j = sjoin(left, right, left_geom="geom", right_geom="geom",
              left_type="polygon", right_type="polygon")
    got = {(r["lid"], r["rid"]) for r in j.collect()}
    expect = {
        (ia, ib)
        for ia, a in polys[:12]
        for ib, b in polys[12:]
        if _poly_poly_oracle(a, b)
    }
    assert got == expect
