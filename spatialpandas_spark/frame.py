"""``SpatialFrame`` — the accessor-style facade a migrating spatialpandas
user reaches for first.

The reference's surface is property/indexer based: ``gdf.cx[x0:x1, y0:y1]``
(ref ``geometry/base.py:575-729``), ``gs.area`` / ``gs.length`` /
``gs.bounds`` / ``gs.total_bounds`` (ref ``geoseries.py``),
``gs.hilbert_distance()`` (ref ``geoseries.py:86``),
``ddf.pack_partitions()`` (ref ``dask.py:177-205``). This class maps that
exact surface onto the engine's column functions — every method is a thin
delegation that returns a plain DataFrame (or a new ``SpatialFrame``), so
nothing here adds plan nodes beyond what the underlying operator builds.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _CxIndexer:
    """``sf.cx[x0:x1, y0:y1]`` — open-ended slices allowed, inverted
    slices normalized, step unsupported (as in the reference)."""

    def __init__(self, frame: SpatialFrame):
        self._f = frame

    @staticmethod
    def _edge(v, default: float) -> float:
        return default if v is None else float(v)

    def __getitem__(self, key) -> SpatialFrame:
        if not isinstance(key, tuple) or len(key) != 2:
            raise TypeError("use sf.cx[x0:x1, y0:y1]")
        xs, ys = key
        for s in (xs, ys):
            if not isinstance(s, slice) or s.step is not None:
                raise TypeError("cx slices take no step")
        rect = (
            self._edge(xs.start, -math.inf),
            self._edge(ys.start, -math.inf),
            self._edge(xs.stop, math.inf),
            self._edge(ys.stop, math.inf),
        )
        from spatialpandas_spark.functions.arrow_kernels import cx_filter_arrow

        f = self._f
        return f._wrap(
            cx_filter_arrow(f.df, f.geometry, f.geom_type, rect, f.bounds_col)
        )


class SpatialFrame:
    """A DataFrame + (geometry column, geometry type) pair with the
    reference's method surface. ``df`` stays accessible as ``.df``."""

    def __init__(
        self,
        df: DataFrame,
        geometry: str = "geom",
        geom_type: str = "point",
        bounds_col: str = "bounds",
    ):
        self.df = df
        self.geometry = geometry
        self.geom_type = geom_type
        self.bounds_col = bounds_col

    # ------------------------------------------------------------- util
    def _wrap(self, df: DataFrame) -> SpatialFrame:
        return SpatialFrame(df, self.geometry, self.geom_type, self.bounds_col)

    def _g(self) -> Column:
        return F.col(self.geometry)

    # ---------------------------------------------------------- surface
    @property
    def cx(self) -> _CxIndexer:
        return _CxIndexer(self)

    def with_bounds(self) -> SpatialFrame:
        from spatialpandas_spark.operators.cx import with_bounds

        return self._wrap(
            with_bounds(self.df, self.geometry, self.geom_type, self.bounds_col)
        )

    def area(self, col: str = "area") -> DataFrame:
        from spatialpandas_spark.functions.measures import st_area

        return self.df.withColumn(col, st_area(self._g(), self.geom_type))

    def length(self, col: str = "length") -> DataFrame:
        from spatialpandas_spark.functions.measures import st_length

        return self.df.withColumn(col, st_length(self._g(), self.geom_type))

    def centroid(self, col: str = "centroid") -> DataFrame:
        from spatialpandas_spark.functions.measures import st_centroid

        return self.df.withColumn(col, st_centroid(self._g(), self.geom_type))

    def bounds(self, col: str = "bounds") -> DataFrame:
        from spatialpandas_spark.functions.measures import st_bounds

        return self.df.withColumn(col, st_bounds(self._g(), self.geom_type))

    def total_bounds(self) -> tuple[float, float, float, float]:
        from spatialpandas_spark.functions.measures import (
            st_bounds,
            total_bounds_aggs,
        )

        b = "__tb"
        row = (
            self.df.withColumn(b, st_bounds(self._g(), self.geom_type))
            .agg(*total_bounds_aggs(b))
            .first()
        )
        return (row["x0"], row["y0"], row["x1"], row["y1"])

    def hilbert_distance(
        self,
        p: int = 10,
        total_bounds: tuple[float, float, float, float] | None = None,
        col: str = "hilbert_distance",
    ) -> DataFrame:
        from spatialpandas_spark.functions.hilbert import hilbert_col
        from spatialpandas_spark.functions.measures import st_bounds

        tb = total_bounds or self.total_bounds()
        b = "__hb"
        return (
            self.df.withColumn(b, st_bounds(self._g(), self.geom_type))
            .withColumn(col, hilbert_col(F.col(b), tb, p))
            .drop(b)
        )

    def oriented(self) -> SpatialFrame:
        from spatialpandas_spark.functions.transforms import st_oriented

        return self._wrap(
            self.df.withColumn(
                self.geometry, st_oriented(self._g(), self.geom_type)
            )
        )

    def fillna(self, fill_value) -> SpatialFrame:
        from spatialpandas_spark.functions.transforms import st_fill_missing

        return self._wrap(
            self.df.withColumn(
                self.geometry,
                st_fill_missing(self._g(), fill_value, self.geom_type),
            )
        )

    def intersects_bounds(
        self,
        rect: tuple[float, float, float, float],
        col: str = "intersects",
    ) -> DataFrame:
        """Boolean per row: geometry intersects the rect (ref
        ``geoseries.py:105-108``)."""
        from spatialpandas_spark.functions.predicates import (
            st_intersects_bounds,
        )

        return self.df.withColumn(
            col, st_intersects_bounds(self._g(), self.geom_type, rect)
        )

    def intersects(self, shape, shape_type: str, col: str = "intersects") -> DataFrame:
        """Boolean per row: geometry intersects ``shape`` (a python
        nested-list / (x, y) literal in this engine's encoding) — ref
        ``geoseries.py:110-113``, extended to all type pairs."""
        from spatialpandas_spark.functions.predicates import st_intersects

        if shape_type == "point":
            x, y = shape
            other = F.struct(
                F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y")
            )
        else:
            other = F.lit(shape)
        return self.df.withColumn(
            col,
            st_intersects(self._g(), self.geom_type, other, shape_type),
        )

    def pack_partitions(
        self, npartitions: int | None = None, p: int = 15
    ) -> SpatialFrame:
        from spatialpandas_spark.operators.pack import pack_partitions

        packed = pack_partitions(
            self.with_bounds().df,
            bounds_col=self.bounds_col,
            npartitions=npartitions,
            p=p,
        )
        return self._wrap(packed)

    def sjoin(
        self, other: SpatialFrame, how: str = "inner", **kwargs
    ) -> DataFrame:
        from spatialpandas_spark.operators.sjoin import sjoin

        return sjoin(
            self.df,
            other.df,
            left_geom=self.geometry,
            right_geom=other.geometry,
            left_type=self.geom_type,
            right_type=other.geom_type,
            how=how,
            **kwargs,
        )

    def sjoin_knn(
        self, other: SpatialFrame, k: int, cell_size: float | None = None,
        **kwargs,
    ) -> DataFrame:
        """Exact kNN join (point frames): each row of self paired with
        its k nearest rows of other (level-doubling grid join)."""
        from spatialpandas_spark.operators.knn import sjoin_knn

        return sjoin_knn(
            self.df,
            other.df,
            k=k,
            cell_size=cell_size,
            left_geom=self.geometry,
            right_geom=other.geometry,
            **kwargs,
        )

    def to_parquet(self, path: str, **kwargs) -> dict:
        from spatialpandas_spark.sources import write_spatial_parquet

        return write_spatial_parquet(
            self.with_bounds().df, path, bounds_col=self.bounds_col, **kwargs
        )

    def append_parquet(self, path: str, **kwargs) -> dict:
        """Append this frame to an existing spatial dataset and refresh
        its manifest (see sources.append_spatial_parquet)."""
        from spatialpandas_spark.sources import append_spatial_parquet

        return append_spatial_parquet(
            self.with_bounds().df, path, bounds_col=self.bounds_col, **kwargs
        )

    def to_geopandas(self):
        from spatialpandas_spark.functions.geopandas_bridge import to_geopandas

        return to_geopandas(self.df, self.geometry, self.geom_type)
