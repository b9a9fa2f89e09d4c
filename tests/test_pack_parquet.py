"""pack_partitions ordering invariants + spatial parquet manifest pruning
(ref tests/test_parquet.py:39-405 round-trip and ordering checks)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import cx_filter, pack_partitions, point_bounds, st_point, with_bounds
from spatialpandas_spark.sources import build_manifest, read_spatial_parquet, write_spatial_parquet

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def points(spark):
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(RNG.uniform(0, 100, (2000, 2)))]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    return df.select("id", st_point(F.col("x"), F.col("y")).alias("geom")).withColumn(
        "bounds", point_bounds(F.col("geom"))
    )


def test_pack_hilbert_monotone_across_partitions(spark, points):
    packed = pack_partitions(points, npartitions=8, p=10)
    parts = packed.select(
        F.spark_partition_id().alias("pid"), "hilbert_distance"
    ).groupBy("pid").agg(
        F.min("hilbert_distance").alias("lo"), F.max("hilbert_distance").alias("hi")
    ).orderBy("lo").collect()
    assert len(parts) == 8
    # ranges are disjoint and ordered: partition i's max <= partition i+1's min
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"]


def test_roundtrip_and_manifest(spark, points, tmp_path):
    path = str(tmp_path / "pts")
    manifest = write_spatial_parquet(points, path, npartitions=6)
    assert len(manifest) == 6
    assert os.path.exists(os.path.join(path, "_spatial_manifest.json"))
    back = read_spatial_parquet(spark, path)
    assert back.count() == points.count()
    assert set(back.columns) >= {"id", "geom", "bounds", "hilbert_distance"}
    assert build_manifest(path) == manifest


def test_pruned_read_preserves_query_result(spark, points, tmp_path):
    path = str(tmp_path / "pts")
    write_spatial_parquet(points, path, npartitions=6)
    rect = (10.0, 10.0, 25.0, 25.0)
    full = read_spatial_parquet(spark, path)
    pruned = read_spatial_parquet(spark, path, bounds=rect)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    a = {r["id"] for r in cx_filter(full, "geom", "point", rect).collect()}
    b = {r["id"] for r in cx_filter(pruned, "geom", "point", rect).collect()}
    assert a == b and a


def test_pruned_read_empty_bounds(spark, points, tmp_path):
    path = str(tmp_path / "pts")
    write_spatial_parquet(points, path, npartitions=4)
    assert read_spatial_parquet(spark, path, bounds=(1e6, 1e6, 2e6, 2e6)).count() == 0


def test_unpacked_write(spark, points, tmp_path):
    path = str(tmp_path / "raw")
    write_spatial_parquet(points, path, pack=False)
    back = read_spatial_parquet(spark, path)
    assert back.count() == points.count()
    assert "hilbert_distance" not in back.columns
