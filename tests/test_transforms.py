"""oriented / boundary / fillna / astype column transforms."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import st_area, st_length
from spatialpandas_spark.functions.transforms import (
    st_astype,
    st_boundary,
    st_fill_missing,
    st_is_missing,
    st_oriented,
)
from tests import geomgen, oracles

RNG = np.random.default_rng(17)


def _scrambled_polys(n=60):
    """Polygons with randomly flipped ring orientations."""
    out = []
    for i, poly in geomgen.gen_polygons(RNG, n):
        scrambled = []
        for ring in poly:
            if RNG.random() < 0.5:
                pts = list(zip(ring[0::2], ring[1::2]))[::-1]
                ring = [v for p in pts for v in p]
            scrambled.append(ring)
        out.append((i, scrambled, poly))
    return out


def test_oriented_normalizes_and_fixes_area(spark):
    rows = _scrambled_polys()
    df = spark.createDataFrame(
        [(i, s) for i, s, _ in rows], "id long, geom array<array<double>>"
    )
    fixed = df.select("id", st_oriented(F.col("geom")).alias("geom"))
    got = {
        r["id"]: (r["a"], r["geom"])
        for r in fixed.select(
            "id", "geom", st_area(F.col("geom")).alias("a")
        ).collect()
    }
    for i, _, _ in rows:
        a, geom = got[i]
        # shell CCW positive, holes CW negative, so every ring obeys sign
        assert oracles.ring_area(geom[0]) > 0
        for hole in geom[1:]:
            assert oracles.ring_area(hole) < 0
        assert a == pytest.approx(
            sum(oracles.ring_area(r) for r in geom), rel=1e-9
        )


def test_oriented_idempotent(spark):
    rows = _scrambled_polys(20)
    df = spark.createDataFrame(
        [(i, s) for i, s, _ in rows], "id long, geom array<array<double>>"
    )
    once = df.select("id", st_oriented(F.col("geom")).alias("geom"))
    twice = once.select("id", st_oriented(F.col("geom")).alias("geom"))
    a = {r["id"]: r["geom"] for r in once.collect()}
    b = {r["id"]: r["geom"] for r in twice.collect()}
    assert a == b


def test_boundary_length_equals_perimeter(spark):
    polys = geomgen.gen_polygons(RNG, 30)
    df = spark.createDataFrame(polys, "id long, geom array<array<double>>")
    rows = df.select(
        "id",
        st_length(F.col("geom"), "polygon").alias("perim"),
        st_length(st_boundary(F.col("geom"), "polygon"), "multiline").alias("blen"),
    ).collect()
    for r in rows:
        assert r["blen"] == pytest.approx(r["perim"], rel=1e-12)


def test_boundary_multipolygon_flattens(spark):
    p1 = [[0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0]]
    p2 = [[5.0, 5.0, 6.0, 5.0, 6.0, 6.0, 5.0, 5.0]]
    df = spark.createDataFrame([(1, [p1, p2])], "id long, geom array<array<array<double>>>")
    b = df.select(st_boundary(F.col("geom"), "multipolygon").alias("b")).first()["b"]
    assert len(b) == 2  # two rings as multiline parts


def test_fill_missing_and_is_missing(spark):
    df = spark.createDataFrame(
        [(1, [[0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0]]), (2, None)],
        "id long, geom array<array<double>>",
    )
    flags = {r["id"]: r["m"] for r in df.select("id", st_is_missing(F.col("geom")).alias("m")).collect()}
    assert flags == {1: False, 2: True}
    fill = [[9.0, 9.0, 10.0, 9.0, 10.0, 10.0, 9.0, 9.0]]
    filled = df.select(
        "id", st_fill_missing(F.col("geom"), fill, "polygon").alias("geom")
    )
    got = {r["id"]: r["geom"] for r in filled.collect()}
    assert got[2] == fill and got[1][0][0] == 0.0

    # point variant
    from spatialpandas_spark import st_point

    pdf = spark.createDataFrame([(1, 1.0, 2.0), (2, None, None)], "id long, x double, y double")
    pdf = pdf.select(
        "id",
        F.when(F.col("x").isNotNull(), st_point(F.col("x"), F.col("y"))).alias("geom"),
    )
    out = pdf.select(
        "id", st_fill_missing(F.col("geom"), (0.0, 0.0), "point").alias("geom")
    ).collect()
    got = {r["id"]: (r["geom"]["x"], r["geom"]["y"]) for r in out}
    assert got == {1: (1.0, 2.0), 2: (0.0, 0.0)}


def test_fill_missing_pad_and_backfill(spark):
    from spatialpandas_spark.functions.transforms import st_fill_missing_pad

    rows = [
        (0, None),
        (1, [[1.0, 1.0, 2.0, 2.0]]),
        (2, None),
        (3, None),
        (4, [[4.0, 4.0, 5.0, 5.0]]),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, geom array<array<double>>")
    pad = {
        r["id"]: r["geom"]
        for r in st_fill_missing_pad(df, "geom", "id").collect()
    }
    assert pad[0] is None  # nothing before the first value
    assert pad[2] == pad[3] == [[1.0, 1.0, 2.0, 2.0]]
    assert pad[5] == [[4.0, 4.0, 5.0, 5.0]]
    back = {
        r["id"]: r["geom"]
        for r in st_fill_missing_pad(df, "geom", "id", backfill=True).collect()
    }
    assert back[0] == [[1.0, 1.0, 2.0, 2.0]]
    assert back[2] == back[3] == [[4.0, 4.0, 5.0, 5.0]]
    assert back[5] is None  # nothing after the last value


def test_astype_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [[0.25, 0.75, 1.5, 2.5]])], "id long, geom array<array<double>>"
    )
    as_float = df.select(st_astype(F.col("geom"), "multiline", "float").alias("g"))
    assert dict(as_float.dtypes)["g"] == "array<array<float>>"
    as_int = df.select(st_astype(F.col("geom"), "multiline", "int").alias("g")).first()["g"]
    assert as_int == [[0, 0, 1, 2]] or as_int == [[0, 1, 2, 2]]  # truncation vs rounding
