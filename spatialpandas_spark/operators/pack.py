"""Hilbert spatial packing (ref ``dask.py:177-205`` ``pack_partitions``).

The reference hand-rolls a quantile shuffle (RepartitionQuantiles +
np.digitize + per-partition concat/sort/write with retries,
``dask.py:207-532``, 326 LoC). Spark's range partitioner *is* that machinery:
``repartitionByRange`` reservoir-samples the key for balanced split points,
the shuffle handles spill/retry, and ``sortWithinPartitions`` gives each
output file a tight, monotone hilbert range → tight parquet row-group stats
on the bounds columns → file/row-group pruning at read time.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialpandas_spark.functions.hilbert import hilbert_col
from spatialpandas_spark.functions.measures import total_bounds_aggs

#: reference targets ~2^23 rows per packed partition, min 8 (``dask.py:534-540``)
ROWS_PER_PARTITION = 2**23
MIN_PARTITIONS = 8


def partition_bounds(df: DataFrame, bounds_col: str = "bounds") -> DataFrame:
    """Per-partition bbox table (ref ``dask.py:53-62``): one row per Spark
    partition with its NaN-skipping bounds. After ``pack_partitions`` these
    ranges are spatially tight — the in-memory analog of the manifest.

    Determinism caveat (round-7 sampled-exchange audit): if ``df``'s
    lineage contains a sampled exchange (``repartitionByRange`` seeds its
    reservoir per execution), this table reflects the partition
    assignment of THIS execution only — do not use it to prune a
    *separate* execution of the same lazy frame. The durable pruning
    path is the file manifest, which ``to_parquet`` rebuilds from the
    parquet footers actually written (``sources/spatial_parquet.py``),
    never from a forked lineage."""

    def skipnan(c):
        return F.when(~F.isnan(c), c)

    b = F.col(bounds_col)
    return (
        df.select(F.spark_partition_id().alias("partition_id"), bounds_col)
        .groupBy("partition_id")
        .agg(
            F.min(skipnan(b["x0"])).alias("x0"),
            F.min(skipnan(b["y0"])).alias("y0"),
            F.max(skipnan(b["x1"])).alias("x1"),
            F.max(skipnan(b["y1"])).alias("y1"),
            F.count("*").alias("n_rows"),
        )
    )


def pack_partitions(
    df: DataFrame,
    bounds_col: str = "bounds",
    npartitions: int | None = None,
    p: int = 15,
    total_bounds: tuple[float, float, float, float] | None = None,
    distance_col: str = "hilbert_distance",
) -> DataFrame:
    """Add a hilbert-distance column and range-partition + sort by it.

    ``total_bounds`` and ``npartitions`` each cost one extra job if not
    supplied; at scale pass known values (e.g. from a previous manifest).
    """
    if total_bounds is None:
        row = df.agg(*total_bounds_aggs(bounds_col)).first()
        total_bounds = (row["x0"], row["y0"], row["x1"], row["y1"])
    if any(v is None for v in total_bounds):
        # empty frame or all-null geometry: no spatial extent exists. Use
        # the unit square (the reference widens degenerate ranges the same
        # way, ref rtree.py:54-57); every row keys to distance 0 and the
        # write degrades to a plain partitioned write instead of crashing.
        total_bounds = (0.0, 0.0, 1.0, 1.0)
    if npartitions is None:
        n = df.count()
        npartitions = max(MIN_PARTITIONS, math.ceil(n / ROWS_PER_PARTITION))
    out = df.withColumn(
        distance_col, hilbert_col(F.col(bounds_col), total_bounds, p)
    )
    return out.repartitionByRange(npartitions, distance_col).sortWithinPartitions(
        distance_col
    )
