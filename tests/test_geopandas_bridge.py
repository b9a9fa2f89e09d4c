"""from_geopandas/to_geopandas one-call ingest (ref geometry/base.py:185-215).

geopandas/shapely are absent in this image: the WKB core path
(from_wkb_pandas) is tested with hand-built WKB bytes; the
geopandas-dependent wrappers are tested for their import-gate behavior
and, when geopandas exists, round-trip equality.
"""

import struct

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import from_geopandas, from_wkb_pandas, to_geopandas

try:
    import geopandas  # noqa: F401

    HAVE_GPD = True
except ImportError:
    HAVE_GPD = False


def _wkb_point(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_linestring(coords):
    out = struct.pack("<BII", 1, 2, len(coords))
    for x, y in coords:
        out += struct.pack("<dd", x, y)
    return out


def test_from_wkb_pandas_points(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "geometry": [
                _wkb_point(1.0, 2.0),
                None,
                _wkb_point(-3.5, 4.25),
            ],
        }
    )
    df = from_wkb_pandas(spark, pdf, "geometry", "point")
    rows = {r["id"]: r["geometry"] for r in df.collect()}
    assert rows[1]["x"] == 1.0 and rows[1]["y"] == 2.0
    assert rows[2] is None
    assert rows[3]["x"] == -3.5 and rows[3]["y"] == 4.25


def test_from_wkb_pandas_lines_measures(spark):
    from spatialpandas_spark import st_length

    pdf = pd.DataFrame(
        {
            "id": [1],
            "geometry": [_wkb_linestring([(0.0, 0.0), (3.0, 4.0), (3.0, 8.0)])],
        }
    )
    df = from_wkb_pandas(spark, pdf, "geometry", "line")
    out = df.select(st_length(F.col("geometry"), "line").alias("l")).first()
    assert out["l"] == pytest.approx(9.0)


@pytest.mark.skipif(HAVE_GPD, reason="covered by roundtrip test instead")
def test_geopandas_wrappers_raise_clear_importerror(spark):
    with pytest.raises(ImportError, match="from_wkb_pandas"):
        from_geopandas(spark, object())
    df = spark.range(1).select(
        F.struct(F.lit(1.0).alias("x"), F.lit(2.0).alias("y")).alias("geom")
    )
    with pytest.raises(ImportError, match="st_as_wkb"):
        to_geopandas(df, "geom", "point")


@pytest.mark.skipif(not HAVE_GPD, reason="geopandas not installed")
def test_geopandas_roundtrip(spark):
    import geopandas as gpd
    from shapely.geometry import Point

    gdf = gpd.GeoDataFrame(
        {"id": [1, 2]}, geometry=[Point(1, 2), Point(3, 4)]
    )
    df = from_geopandas(spark, gdf)
    back = to_geopandas(df, "geometry", "point").sort_values("id")
    assert list(back.geometry.x) == [1.0, 3.0]
    assert list(back.geometry.y) == [2.0, 4.0]
