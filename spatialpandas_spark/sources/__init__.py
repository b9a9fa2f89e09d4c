from spatialpandas_spark.sources.spatial_parquet import (
    write_spatial_parquet,
    read_spatial_parquet,
    read_spatial_parquet_cx,
    append_spatial_parquet,
    refresh_manifest,
    build_manifest,
)
from spatialpandas_spark.sources.reference_parquet import (
    read_reference_parquet,
    write_reference_parquet,
    load_partition_bounds,
    load_divisions,
)
from spatialpandas_spark.sources.events import (
    normalize_event_ts,
    read_events,
)

__all__ = [
    "normalize_event_ts",
    "read_events",
    "write_spatial_parquet",
    "read_spatial_parquet",
    "read_spatial_parquet_cx",
    "build_manifest",
    "read_reference_parquet",
    "write_reference_parquet",
    "load_partition_bounds",
    "load_divisions",
]
