from spatialpandas_spark.sources.spatial_parquet import (
    write_spatial_parquet,
    read_spatial_parquet,
    build_manifest,
)

__all__ = ["write_spatial_parquet", "read_spatial_parquet", "build_manifest"]
