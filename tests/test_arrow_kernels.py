"""Arrow-batch numpy kernels must agree with the HOF column expressions
(both are public paths; HOF is the composable one, arrow the bulk one)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import st_area, st_bounds, st_length
from spatialpandas_spark.functions.arrow_kernels import with_measures
from tests import geomgen

RNG = np.random.default_rng(21)


def _agree(x, y, rel=1e-9):
    if x is None or y is None:
        return x is y
    if math.isnan(x) and math.isnan(y):
        return True
    return abs(x - y) <= rel * max(1.0, abs(y))


def test_polygon_kernels_match_hof_with_edge_rows(spark):
    rows = list(geomgen.gen_polygons(RNG, 150)) + [
        (9990, None),
        (9991, []),
        (9992, [[0.0, 0.0, 1.0, 1.0]]),  # degenerate ring
        (9993, [[0.0, 0.0, float("nan"), 1.0, 3.0, 4.0, 0.0, 0.0]]),
    ]
    df = spark.createDataFrame(rows, "id long, geom array<array<double>>")
    hof = {
        r["id"]: r
        for r in df.select(
            "id",
            st_area(F.col("geom")).alias("a"),
            st_length(F.col("geom"), "polygon").alias("l"),
            st_bounds(F.col("geom"), "polygon").alias("b"),
        ).collect()
    }
    ark = with_measures(df, "geom", "polygon", area="a", length="l", bounds="b")
    for r in ark.select("id", "a", "l", "b").collect():
        h = hof[r["id"]]
        assert _agree(r["a"], h["a"]), (r["id"], "area")
        assert _agree(r["l"], h["l"]), (r["id"], "length")
        for f in ("x0", "y0", "x1", "y1"):
            assert _agree(r["b"][f], h["b"][f]), (r["id"], f)


def test_line_and_multiline_and_multipolygon(spark):
    lines = geomgen.gen_lines(RNG, 80)
    dfl = spark.createDataFrame(lines, "id long, geom array<double>")
    hof = {
        r["id"]: r["l"]
        for r in dfl.select("id", st_length(F.col("geom"), "line").alias("l")).collect()
    }
    for r in with_measures(dfl, "geom", "line", length="l").select("id", "l").collect():
        assert _agree(r["l"], hof[r["id"]])

    mls = geomgen.gen_multilines(RNG, 60)
    dfm = spark.createDataFrame(mls, "id long, geom array<array<double>>")
    hofm = {
        r["id"]: r["l"]
        for r in dfm.select(
            "id", st_length(F.col("geom"), "multiline").alias("l")
        ).collect()
    }
    for r in with_measures(dfm, "geom", "multiline", length="l").select("id", "l").collect():
        assert _agree(r["l"], hofm[r["id"]])

    mps = [
        (i, [geomgen.gen_convex_polygon(RNG), geomgen.gen_convex_polygon(RNG)])
        for i in range(40)
    ]
    dfp = spark.createDataFrame(mps, "id long, geom array<array<array<double>>>")
    hofp = {
        r["id"]: (r["a"], r["l"])
        for r in dfp.select(
            "id",
            st_area(F.col("geom"), "multipolygon").alias("a"),
            st_length(F.col("geom"), "multipolygon").alias("l"),
        ).collect()
    }
    out = with_measures(dfp, "geom", "multipolygon", area="a", length="l")
    for r in out.select("id", "a", "l").collect():
        assert _agree(r["a"], hofp[r["id"]][0])
        assert _agree(r["l"], hofp[r["id"]][1])


def test_passthrough_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "x", [[0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0]])],
        "id long, tag string, geom array<array<double>>",
    )
    out = with_measures(df, "geom", "polygon", area="a").first()
    assert out["tag"] == "x" and out["id"] == 1
    assert out["a"] == pytest.approx(16.0)


def test_point_type_rejected(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        with_measures(df, "geom", "point", area="a")


def test_cx_filter_arrow_matches_hof_all_types(spark):
    """The vectorized cx kernel must be row-identical to the HOF
    expression for every nested type, including nulls, holes, and the
    rect-fully-inside-polygon case."""
    import numpy as np

    from spatialpandas_spark import cx_filter, with_bounds
    from spatialpandas_spark.functions.arrow_kernels import cx_filter_arrow
    from tests import geomgen

    rng = np.random.default_rng(5)
    cases = {
        "line": geomgen.gen_lines(rng, 300),
        "multiline": geomgen.gen_multilines(rng, 200),
        "polygon": geomgen.gen_polygons(rng, 200),
        "multipoint": [(i, [float(v) for v in rng.uniform(-50, 50, 8)]) for i in range(150)],
    }
    schemas = {
        "line": "id long, geom array<double>",
        "multiline": "id long, geom array<array<double>>",
        "polygon": "id long, geom array<array<double>>",
        "multipoint": "id long, geom array<double>",
    }
    rect = (-20.0, -15.0, 18.0, 22.0)
    for gt, rows in cases.items():
        rows = list(rows) + [(10_000, None)]
        df = with_bounds(
            spark.createDataFrame(rows, schemas[gt]), "geom", gt
        )
        a = {r["id"] for r in cx_filter(df, "geom", gt, rect).collect()}
        b = {r["id"] for r in cx_filter_arrow(df, "geom", gt, rect).collect()}
        assert a == b and a, gt


def test_cx_filter_arrow_multipolygon_and_inside(spark):
    import numpy as np

    from spatialpandas_spark import cx_filter, with_bounds
    from spatialpandas_spark.functions.arrow_kernels import cx_filter_arrow
    from tests import geomgen

    rng = np.random.default_rng(9)
    rows = [
        (i, [geomgen.gen_convex_polygon(rng), geomgen.gen_convex_polygon(rng)])
        for i in range(120)
    ]
    df = with_bounds(
        spark.createDataFrame(rows, "id long, geom array<array<array<double>>>"),
        "geom",
        "multipolygon",
    )
    for rect in ((-30.0, -30.0, 25.0, 25.0), (-1.0, -1.0, 1.0, 1.0)):
        a = {r["id"] for r in cx_filter(df, "geom", "multipolygon", rect).collect()}
        b = {r["id"] for r in cx_filter_arrow(df, "geom", "multipolygon", rect).collect()}
        assert a == b, rect


def test_cx_filter_arrow_degenerate_rect(spark):
    from pyspark.sql import functions as F

    from spatialpandas_spark import with_bounds
    from spatialpandas_spark.functions.arrow_kernels import cx_filter_arrow

    df = spark.range(5).select(
        "id",
        F.array(
            F.col("id").cast("double"), F.lit(0.0),
            F.col("id").cast("double") + 1, F.lit(1.0),
        ).alias("geom"),
    )
    df = with_bounds(df, "geom", "line")
    # zero-area rect never intersects lines (ref intersection.py:332-334)
    assert cx_filter_arrow(df, "geom", "line", (0.0, 0.0, 0.0, 5.0)).count() == 0


def test_concave_polygon_kernels_match_hof(spark):
    """Arrow measure + cx kernels over CONCAVE fixtures (stars with
    concave holes, rectilinear skylines) must still match the Catalyst
    HOF expressions row-for-row — the convex-only pool never exercised
    re-entrant vertices in the vectorized offsets/values paths."""
    from spatialpandas_spark import cx_filter, with_bounds
    from spatialpandas_spark.functions.arrow_kernels import cx_filter_arrow

    rows = geomgen.gen_concave_polygons(np.random.default_rng(77), 120)
    df = spark.createDataFrame(rows, "id long, geom array<array<double>>")
    hof = {
        r["id"]: r
        for r in df.select(
            "id",
            st_area(F.col("geom")).alias("a"),
            st_length(F.col("geom"), "polygon").alias("l"),
            st_bounds(F.col("geom"), "polygon").alias("b"),
        ).collect()
    }
    ark = with_measures(df, "geom", "polygon", area="a", length="l", bounds="b")
    for r in ark.select("id", "a", "l", "b").collect():
        h = hof[r["id"]]
        assert _agree(r["a"], h["a"]), (r["id"], "area")
        assert _agree(r["l"], h["l"]), (r["id"], "length")
        for f in ("x0", "y0", "x1", "y1"):
            assert _agree(r["b"][f], h["b"][f]), (r["id"], f)

    wb = with_bounds(df, "geom", "polygon")
    for _, rect in geomgen.gen_rects(np.random.default_rng(31), 8):
        got_hof = {r["id"] for r in cx_filter(wb, "geom", "polygon", rect).collect()}
        got_ark = {r["id"] for r in cx_filter_arrow(wb, "geom", "polygon", rect).collect()}
        assert got_hof == got_ark, rect
