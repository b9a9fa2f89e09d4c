"""One-call geopandas <-> Spark ingestion over the WKB bridge
(ref ``geometry/base.py:185-215`` ``from_geopandas`` /
``geoseries.py`` ``to_geopandas``).

geopandas/shapely are OPTIONAL: they are not required by this engine and
may be absent from the runtime (as they are in the build image). The
helpers import them lazily and raise a clear error when missing; the
WKB-bytes path underneath is fully functional and tested without them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialpandas_spark.functions.wkb import st_as_wkb, st_from_wkb

#: shapely geom_type -> this engine's column model type
_SHAPELY_TO_ENGINE = {
    "Point": "point",
    "LineString": "line",
    "Polygon": "polygon",
    "MultiPoint": "multipoint",
    "MultiLineString": "multiline",
    "MultiPolygon": "multipolygon",
}


def from_wkb_pandas(
    spark: SparkSession,
    pdf,
    geometry: str,
    geom_type: str,
) -> DataFrame:
    """pandas DataFrame with a WKB ``bytes`` column -> Spark DataFrame with
    the engine's nested geometry encoding. The geopandas-free core of
    ``from_geopandas`` (usable with any WKB producer: PostGIS dumps,
    shapely, osgeo)."""
    df = spark.createDataFrame(pdf)
    return df.withColumn(geometry, st_from_wkb(F.col(geometry), geom_type))


def from_geopandas(
    spark: SparkSession,
    gdf,
    geom_type: str | None = None,
) -> DataFrame:
    """geopandas GeoDataFrame -> Spark DataFrame (one call, parity with
    reference ``GeoDataFrame(gdf)``): shapely ``to_wkb`` on the driver,
    ``createDataFrame``, JVM-side ``st_from_wkb`` decode. Driver-sized
    inputs only by construction — for bulk loads write WKB parquet and
    decode with ``st_from_wkb`` on the cluster instead."""
    try:
        import shapely  # noqa: F401
    except ImportError as ex:  # pragma: no cover - env without shapely
        raise ImportError(
            "from_geopandas needs geopandas/shapely on the driver; "
            "use from_wkb_pandas with precomputed WKB bytes instead"
        ) from ex
    geo_col = gdf.geometry.name
    if geom_type is None:
        kinds = set(gdf.geometry.geom_type.unique())
        engine_types = {_SHAPELY_TO_ENGINE[k] for k in kinds}
        if len(engine_types) != 1:
            raise ValueError(
                f"mixed geometry types {sorted(kinds)}; pass geom_type="
            )
        geom_type = engine_types.pop()
    pdf = gdf.drop(columns=[geo_col]).assign(
        **{geo_col: [g.wkb if g is not None else None for g in gdf.geometry]}
    )
    return from_wkb_pandas(spark, pdf, geo_col, geom_type)


def to_geopandas(
    df: DataFrame,
    geometry: str,
    geom_type: str,
):
    """Spark DataFrame -> geopandas GeoDataFrame via WKB (driver collect —
    result must fit on the driver, same contract as the reference's
    ``to_geopandas``)."""
    try:
        import geopandas as gpd
        from shapely import wkb as swkb
    except ImportError as ex:  # pragma: no cover - env without geopandas
        raise ImportError(
            "to_geopandas needs geopandas/shapely on the driver; "
            "use st_as_wkb and collect bytes instead"
        ) from ex
    pdf = df.withColumn(geometry, st_as_wkb(F.col(geometry), geom_type)).toPandas()
    pdf[geometry] = pdf[geometry].map(
        lambda b: swkb.loads(bytes(b)) if b is not None else None
    )
    return gpd.GeoDataFrame(pdf, geometry=geometry)
