"""SpatialFrame accessor facade: the reference's property/indexer surface
(gdf.cx[...], gs.area, gs.total_bounds, pack_partitions, sjoin) mapped
onto the engine, with reference slice semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import SpatialFrame, st_make_diamond, st_point

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(RNG.uniform(0, 100, (1000, 2)))
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double").select(
        "id", st_point(F.col("x"), F.col("y")).alias("geom")
    )
    return SpatialFrame(df, "geom", "point").with_bounds()


def test_cx_slice_matches_filter(spark, pts):
    sel = pts.cx[20:40, 30:70].df
    got = {r["id"] for r in sel.select("id").collect()}
    exp = {
        r["id"]
        for r in pts.df.filter(
            (F.col("geom.x") >= 20) & (F.col("geom.x") <= 40)
            & (F.col("geom.y") >= 30) & (F.col("geom.y") <= 70)
        ).collect()
    }
    assert got == exp and got


def test_cx_open_and_inverted_slices(spark, pts):
    left = {r["id"] for r in pts.cx[:50, :].df.select("id").collect()}
    exp = {
        r["id"] for r in pts.df.filter(F.col("geom.x") <= 50).collect()
    }
    assert left == exp
    # inverted slice normalizes, as in the reference
    inv = {r["id"] for r in pts.cx[50:0, :].df.select("id").collect()}
    zero_to_50 = {
        r["id"]
        for r in pts.df.filter(
            (F.col("geom.x") >= 0) & (F.col("geom.x") <= 50)
        ).collect()
    }
    assert inv == zero_to_50


def test_cx_rejects_step_and_bad_key(pts):
    with pytest.raises(TypeError):
        pts.cx[0:10:2, :]
    with pytest.raises(TypeError):
        pts.cx[5]


def test_total_bounds_and_hilbert(spark, pts):
    x0, y0, x1, y1 = pts.total_bounds()
    assert 0 <= x0 < x1 <= 100 and 0 <= y0 < y1 <= 100
    hd = pts.hilbert_distance(p=8)
    mx = hd.agg(F.max("hilbert_distance")).first()[0]
    assert 0 <= mx < 4**8


def test_area_length_and_sjoin(spark, pts):
    dia_df = spark.range(5).select(
        F.col("id").alias("did"),
        st_make_diamond(
            (F.col("id") * 20 + 10).cast("double"),
            (F.col("id") * 15 + 10).cast("double"),
            F.lit(9.5),
        ).alias("poly"),
    )
    dias = SpatialFrame(dia_df, "poly", "polygon")
    a = dias.area().select("did", "area").collect()
    assert all(r["area"] == pytest.approx(2 * 9.5 * 9.5) for r in a)
    joined = SpatialFrame(pts.df, "geom", "point").sjoin(dias)
    rows = pts.df.select("geom.x", "geom.y").collect()
    exp_pairs = sum(
        1
        for r in rows
        for d in range(5)
        if abs(r["x"] - (d * 20 + 10)) + abs(r["y"] - (d * 15 + 10)) <= 9.5
    )
    assert joined.count() == exp_pairs


def test_pack_partitions_roundtrip(spark, pts, tmp_path):
    packed = pts.pack_partitions(npartitions=4, p=8)
    assert packed.df.rdd.getNumPartitions() == 4
    manifest = pts.to_parquet(str(tmp_path / "sf_pts"), npartitions=4)
    assert len(manifest) == 4


def test_intersects_methods(spark, pts):
    flags = pts.intersects_bounds((0.0, 0.0, 50.0, 50.0))
    n_in = flags.filter(F.col("intersects")).count()
    exp = pts.df.filter(
        (F.col("geom.x") <= 50) & (F.col("geom.y") <= 50)
    ).count()
    assert n_in == exp

    # diamond |x-50|+|y-50| <= 20 as a closed polygon literal
    dia = [[70.0, 50.0, 50.0, 70.0, 30.0, 50.0, 50.0, 30.0, 70.0, 50.0]]
    hit = pts.intersects(dia, "polygon").filter(F.col("intersects")).count()
    exp2 = sum(
        1
        for r in pts.df.select("geom.x", "geom.y").collect()
        if abs(r["x"] - 50) + abs(r["y"] - 50) <= 20
    )
    assert hit == exp2 and hit > 0


def test_frame_knn_and_append(spark, tmp_path):
    from pyspark.sql import functions as F

    from spatialpandas_spark import SpatialFrame, st_point
    from spatialpandas_spark.sources import read_spatial_parquet

    def mk(n, offset=0):
        return spark.range(n).select(
            (F.col("id") + offset * 100).alias("lid"),
            st_point(
                (F.col("id") % 9 + offset * 50).cast("double"),
                (F.col("id") % 7).cast("double"),
            ).alias("geom"),
        )

    a = SpatialFrame(mk(30), "geom", "point")
    b = SpatialFrame(
        mk(20).withColumnRenamed("lid", "rid"), "geom", "point"
    )
    knn = a.sjoin_knn(b, k=2, cell_size=3.0)
    assert knn.count() == 60  # 30 lefts x k=2
    assert set(knn.columns) == {"lid", "rid", "dist2", "rank"}

    path = str(tmp_path / "sf_append")
    a.to_parquet(path, npartitions=2, p=8)
    SpatialFrame(mk(30, offset=1), "geom", "point").append_parquet(
        path, npartitions=2, p=8
    )
    assert read_spatial_parquet(spark, path).count() == 60
