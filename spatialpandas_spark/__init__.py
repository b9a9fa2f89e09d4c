"""spatialpandas_spark — a PySpark-native spatial analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of holoviz/spatialpandas (reference surveyed in SURVEY.md):

- Geometry columns as nested ``ArrayType(DoubleType)`` (interleaved
  ``[x0, y0, x1, y1, ...]``) / ``Struct(x, y)`` for points — the same Arrow
  physical layout the reference uses (ref ``geometry/baselist.py:34-116``),
  round-tripped natively by Spark's Parquet reader.
- Geometry measures and predicates as **JVM-side higher-order-function column
  expressions** (no Python in the hot path) — the Catalyst-native analog of the
  reference's numba kernels (ref ``geometry/_algorithms/*``).
- Hilbert-curve spatial clustering (vectorized Arrow pandas UDF) +
  ``repartitionByRange`` replacing the reference's hand-rolled
  ``pack_partitions_to_parquet`` shuffle (ref ``dask.py:207-532``).
- Spatial parquet IO with a partition-bounds manifest for file pruning
  (ref ``io/parquet.py:143-182,411-447``) on top of parquet row-group stats.
- ``sjoin`` spatial joins: broadcast filter-refine and grid-cell equi-join
  (ref ``tools/sjoin.py:26-272``).
- Beyond-reference, scale-first LLM-data-pipeline operators: dedup (exact,
  MinHash-LSH, SimHash), ANN similarity search, text analysis, multimodal
  column plumbing.

Everything is DataFrame-in / DataFrame-out; Catalyst plans and optimizes.
"""

from spatialpandas_spark.functions.constructors import (
    st_point,
    st_make_box,
    st_make_diamond,
    point_bounds,
)
from spatialpandas_spark.functions.measures import (
    st_area,
    st_length,
    st_bounds,
    st_centroid,
    st_distance,
    total_bounds_aggs,
)
from spatialpandas_spark.functions.predicates import (
    bbox_intersects_bounds,
    st_intersects_bounds,
    st_point_in_polygon,
)
from spatialpandas_spark.functions.hilbert import hilbert_distance_udf
from spatialpandas_spark.functions.geopandas_bridge import (
    from_geopandas,
    from_wkb_pandas,
    to_geopandas,
)
from spatialpandas_spark.operators.cx import cx_filter, with_bounds
from spatialpandas_spark.operators.sjoin import sjoin
from spatialpandas_spark.operators.pack import pack_partitions
from spatialpandas_spark.corpus import CorpusFrame
from spatialpandas_spark.frame import SpatialFrame
from spatialpandas_spark.vectors import VectorFrame

__all__ = [
    "st_point",
    "st_make_box",
    "st_make_diamond",
    "point_bounds",
    "st_area",
    "st_length",
    "st_centroid",
    "st_distance",
    "st_bounds",
    "total_bounds_aggs",
    "bbox_intersects_bounds",
    "st_intersects_bounds",
    "st_point_in_polygon",
    "hilbert_distance_udf",
    "from_geopandas",
    "from_wkb_pandas",
    "to_geopandas",
    "cx_filter",
    "with_bounds",
    "sjoin",
    "pack_partitions",
    "SpatialFrame",
    "CorpusFrame",
    "VectorFrame",
]

__version__ = "0.1.0"
