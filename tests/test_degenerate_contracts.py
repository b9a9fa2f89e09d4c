"""Degenerate-input contract battery (ref ExtensionArray-suite analog).

The reference inherits the full pandas ExtensionArray conformance suite
for both storage layouts (ref tests/test_fixedextensionarray.py:149-191,
test_listextensionarray.py), which pins constructor/getitem/missing/
reshape behavior on empty, all-null, and scalar inputs. The Spark twin
of that contract: every §2 operator must accept an EMPTY frame, an
ALL-NULL geometry column, and a SINGLE-ROW frame without raising, and
return the shape its semantics dictate. At 100 TB these are not edge
cases — empty partitions and null-laden columns appear in every job.
"""

import pytest

from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from spatialpandas_spark import (
    cx_filter,
    sjoin,
    st_area,
    st_bounds,
    st_centroid,
    st_length,
    total_bounds_aggs,
    with_bounds,
)

POINT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField(
            "geom",
            StructType(
                [StructField("x", DoubleType()), StructField("y", DoubleType())]
            ),
        ),
    ]
)
POLY_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("geom", ArrayType(ArrayType(DoubleType()))),
    ]
)

_SQUARE = [[0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0, 0.0, 0.0]]


def _points(spark, rows):
    return spark.createDataFrame(rows, POINT_SCHEMA)


def _polys(spark, rows):
    return spark.createDataFrame(rows, POLY_SCHEMA)


@pytest.fixture(params=["empty", "all_null", "single"])
def point_frame(request, spark):
    rows = {
        "empty": [],
        "all_null": [(1, None), (2, None)],
        "single": [(1, Row(x=1.0, y=1.0))],
    }[request.param]
    return request.param, _points(spark, rows)


@pytest.fixture(params=["empty", "all_null", "single"])
def poly_frame(request, spark):
    rows = {
        "empty": [],
        "all_null": [(1, None), (2, None)],
        "single": [(1, _SQUARE)],
    }[request.param]
    return request.param, _polys(spark, rows)


# ------------------------------------------------------------------ cx (P1)
def test_cx_degenerate(point_frame):
    kind, df = point_frame
    out = cx_filter(
        with_bounds(df, "geom", "point"), "geom", "point", (0.0, 0.0, 5.0, 5.0)
    )
    # null geometry never intersects; empty in -> empty out
    assert out.count() == (1 if kind == "single" else 0)


# --------------------------------------------------------------- sjoin (J1)
def test_sjoin_degenerate(point_frame, spark):
    kind, pts = point_frame
    polys = _polys(spark, [(10, _SQUARE)]).withColumnRenamed("id", "pid")
    out = sjoin(
        pts, polys,
        left_geom="geom", right_geom="geom",
        left_type="point", right_type="polygon",
        how="inner",
    )
    assert out.count() == (1 if kind == "single" else 0)


def test_sjoin_empty_right_side(spark):
    pts = _points(spark, [(1, Row(x=1.0, y=1.0))])
    polys = _polys(spark, []).withColumnRenamed("id", "pid")
    inner = sjoin(
        pts, polys,
        left_geom="geom", right_geom="geom",
        left_type="point", right_type="polygon",
        how="inner",
    )
    assert inner.count() == 0
    left = sjoin(
        pts, polys,
        left_geom="geom", right_geom="geom",
        left_type="point", right_type="polygon",
        how="left",
    )
    assert left.count() == 1  # left row survives with null right


# ------------------------------------------------------- measures (F1-F4)
def test_measures_degenerate(poly_frame):
    kind, df = poly_frame
    out = df.select(
        st_area(F.col("geom")).alias("a"),
        st_length(F.col("geom"), "polygon").alias("l"),
        st_bounds(F.col("geom"), "polygon").alias("b"),
        st_centroid(F.col("geom"), "polygon").alias("c"),
    ).collect()
    assert len(out) == {"empty": 0, "all_null": 2, "single": 1}[kind]
    for r in out:
        if kind == "all_null":
            # NaN (not NULL) for missing geometry is deliberate reference
            # parity (ref _algorithms/bounds.py:56-66 and the float-NaN
            # missing-value convention throughout the reference kernels)
            import math

            assert math.isnan(r["a"]) and math.isnan(r["l"])
        if kind == "single":
            assert r["a"] == 4.0 and r["l"] == 8.0
            assert (r["b"]["x0"], r["b"]["y1"]) == (0.0, 2.0)


def test_total_bounds_degenerate(point_frame):
    kind, df = point_frame
    row = (
        with_bounds(df, "geom", "point")
        .agg(*total_bounds_aggs("bounds"))
        .first()
    )
    if kind == "single":
        assert row[0] == 1.0
    else:
        assert row[0] is None  # empty/all-null: null bounds, not a crash


# ----------------------------------------------------------- pack (S5/O2)
@pytest.mark.parametrize("kind", ["empty", "all_null", "single"])
def test_pack_degenerate(kind, spark, tmp_path):
    from spatialpandas_spark.sources import (
        read_spatial_parquet,
        write_spatial_parquet,
    )

    rows = {
        "empty": [],
        "all_null": [(1, None), (2, None)],
        "single": [(1, Row(x=1.0, y=1.0))],
    }[kind]
    df = with_bounds(_points(spark, rows), "geom", "point")
    path = str(tmp_path / f"pack_{kind}")
    write_spatial_parquet(df, path, npartitions=2, p=8)
    n = {"empty": 0, "all_null": 2, "single": 1}[kind]
    assert read_spatial_parquet(spark, path).count() == n
    # bounds-pruned read: null-bounds files carry no footer stats and may
    # be pruned entirely; it must not error
    pruned = read_spatial_parquet(spark, path, bounds=(0.0, 0.0, 9.0, 9.0))
    assert pruned.count() == (1 if kind == "single" else 0)


# ------------------------------------------------------------ dedup ops
@pytest.mark.parametrize("kind", ["empty", "all_null", "single", "empty_text"])
def test_dedup_degenerate(kind, spark):
    from spatialpandas_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    rows = {
        "empty": [],
        "all_null": [(1, None), (2, None)],
        "single": [(1, "hello world hello world")],
        "empty_text": [(1, ""), (2, "")],
    }[kind]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = dedup_exact(docs, ["text"], "doc_id").count()
    # identical keys (both-null, both-empty) collapse to one survivor
    assert kept == {"empty": 0, "all_null": 1, "single": 1, "empty_text": 1}[kind]
    assert minhash_lsh_pairs(docs, threshold=0.5).count() == 0
    assert simhash_pairs(docs).count() == 0


def test_clusters_degenerate(spark):
    from spatialpandas_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert near_dup_clusters(docs, threshold=0.5).count() == 0
    one = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    got = near_dup_clusters(one, threshold=0.5).collect()
    assert len(got) == 1  # singleton cluster = itself


# ------------------------------------------------------------- asof join
@pytest.mark.parametrize("side", ["left_empty", "right_empty", "both_empty"])
def test_asof_degenerate(side, spark):
    from datetime import datetime

    from spatialpandas_spark.operators.asof import asof_join

    sch = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_id", LongType()),
        ]
    )
    full = [(1, datetime(2026, 1, 1, 12), 100)]
    l_rows = [] if side in ("left_empty", "both_empty") else full
    r_rows = [] if side in ("right_empty", "both_empty") else full
    left = spark.createDataFrame(l_rows, sch)
    right = spark.createDataFrame(r_rows, sch).withColumnRenamed(
        "event_id", "view_id"
    )
    out = asof_join(left, right, on="ts", by="user_id")
    if side in ("left_empty", "both_empty"):
        assert out.count() == 0
    else:
        rows = out.collect()  # left preserved, unmatched -> null right
        assert len(rows) == 1 and rows[0]["view_id"] is None
