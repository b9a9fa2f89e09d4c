from spatialpandas_spark.sources.spatial_parquet import (
    write_spatial_parquet,
    read_spatial_parquet,
    read_spatial_parquet_cx,
    build_manifest,
)
from spatialpandas_spark.sources.reference_parquet import (
    read_reference_parquet,
    write_reference_parquet,
    load_partition_bounds,
    load_divisions,
)

__all__ = [
    "write_spatial_parquet",
    "read_spatial_parquet",
    "read_spatial_parquet_cx",
    "build_manifest",
    "read_reference_parquet",
    "write_reference_parquet",
    "load_partition_bounds",
    "load_divisions",
]
