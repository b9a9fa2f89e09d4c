"""st_point_intersects family, st_promote, partition_bounds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import pack_partitions, point_bounds, st_point
from spatialpandas_spark.functions.constructors import st_promote
from spatialpandas_spark.functions.predicates import st_point_intersects
from spatialpandas_spark.operators.pack import partition_bounds

RNG = np.random.default_rng(31)


def test_point_intersects_line_on_and_off_segment(spark):
    line = [0.0, 0.0, 10.0, 10.0, 20.0, 10.0]
    cases = [
        (5.0, 5.0, True),     # on first segment
        (15.0, 10.0, True),   # on second segment
        (0.0, 0.0, True),     # endpoint
        (5.0, 5.1, False),
        (25.0, 10.0, False),  # collinear but past the end
    ]
    df = spark.createDataFrame(cases, "x double, y double, expect boolean")
    got = df.withColumn(
        "got",
        st_point_intersects(
            F.col("x"), F.col("y"),
            F.lit(line).cast("array<double>"), "line",
        ),
    ).collect()
    for r in got:
        assert r["got"] == r["expect"], (r["x"], r["y"])


def test_point_intersects_multipoint_and_multiline(spark):
    mp = [1.0, 2.0, 3.0, 4.0]
    ml = [[0.0, 0.0, 1.0, 0.0], [5.0, 5.0, 6.0, 5.0]]
    df = spark.createDataFrame([(1,)], "id long")
    row = df.select(
        st_point_intersects(F.lit(3.0), F.lit(4.0), F.lit(mp).cast("array<double>"), "multipoint").alias("a"),
        st_point_intersects(F.lit(3.0), F.lit(3.9), F.lit(mp).cast("array<double>"), "multipoint").alias("b"),
        st_point_intersects(F.lit(5.5), F.lit(5.0), F.lit(ml).cast("array<array<double>>"), "multiline").alias("c"),
        st_point_intersects(F.lit(2.0), F.lit(1.0), F.lit(ml).cast("array<array<double>>"), "multiline").alias("d"),
    ).first()
    assert (row["a"], row["b"], row["c"], row["d"]) == (True, False, True, False)


def test_promote(spark):
    df = spark.createDataFrame(
        [(1, [[0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0]])],
        "id long, geom array<array<double>>",
    )
    out = df.select(st_promote(F.col("geom"), "polygon", "multipolygon").alias("mp")).first()
    assert out["mp"] == [[[0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0]]]
    with pytest.raises(ValueError):
        st_promote(F.col("geom"), "polygon", "multiline")


def test_partition_bounds_tight_after_pack(spark):
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(RNG.uniform(0, 100, (3000, 2)))]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    df = df.select("id", st_point(F.col("x"), F.col("y")).alias("geom"))
    df = df.withColumn("bounds", point_bounds(F.col("geom")))
    packed = pack_partitions(df, npartitions=8, p=10)
    pb = partition_bounds(packed).collect()
    assert len(pb) == 8
    assert sum(r["n_rows"] for r in pb) == 3000
    # hilbert-packed partitions should be spatially tight: average bbox area
    # well under the full extent
    areas = [(r["x1"] - r["x0"]) * (r["y1"] - r["y0"]) for r in pb]
    assert sum(areas) / len(areas) < 100 * 100 * 0.55
