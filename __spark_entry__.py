"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one implemented operator from SURVEY.md §2
(or a beyond-reference pipeline operator) and has a DuckDB ``oracle_sql()``
twin computing the same result a different way. Spatial queries derive
geometry deterministically from the TPC-H-ish tables:

- integer-valued coordinates → shoelace/segment arithmetic is exact in
  float64, so Spark's kernel result is bit-identical to the oracle's
  closed form;
- diamond polygons (|x-cx| + |y-cy| <= r containment) with half-integer
  radii → containment has a SQL closed form and no point ever lands on a
  boundary;
- cross-engine float *sums* are rounded identically on both sides (row-level
  values are bit-identical; only aggregation order differs).

Every declared query has an exact DuckDB oracle — including the
hash-based ops (hilbert packing, minhash/simhash), whose oracles replay
the same md5-derived hashes in SQL. Consolidated gates (tagged unions /
key joins of related operators) get their oracle composed from the same
per-operator base SQL in ``oracle_sql()``.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ts normalized to a microsecond TIMESTAMP (the
    fixture has shipped both nanos-bigint and timestamp[us] encodings)."""
    from spatialpandas_spark.sources.events import read_events

    return read_events(spark, sf_dir)


# ---------------------------------------------------------------- geometry
# points derived from customer: exact integer coordinates
def _points(spark, sf_dir):
    from spatialpandas_spark import st_point

    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        st_point(
            (F.col("c_custkey") % 97).cast("double"),
            (F.col("c_nationkey") * 4).cast("double"),
        ).alias("geom"),
    )


_POINTS_SQL = """
    SELECT c_custkey AS id,
           CAST(c_custkey % 97 AS DOUBLE) AS x,
           CAST(c_nationkey * 4 AS DOUBLE) AS y
    FROM customer
"""

# diamonds derived from nation: integer centers, half-integer radius
def _diamonds(spark, sf_dir):
    from spatialpandas_spark import st_make_diamond

    return _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("did"),
        st_make_diamond(
            (F.col("n_nationkey") * 3 + 10).cast("double"),
            (F.col("n_regionkey") * 20 + 10).cast("double"),
            F.lit(12.5),
        ).alias("poly"),
    )


_DIAMONDS_SQL = """
    SELECT n_nationkey AS did,
           CAST(n_nationkey * 3 + 10 AS DOUBLE) AS cx,
           CAST(n_regionkey * 20 + 10 AS DOUBLE) AS cy,
           12.5 AS r
    FROM nation
"""


def q_cx_bbox(spark, sf_dir):
    """P1/P2: .cx bbox selection on a point column (SURVEY §2.2)."""
    from spatialpandas_spark import cx_filter, with_bounds

    pts = with_bounds(_points(spark, sf_dir), "geom", "point")
    sel = cx_filter(pts, "geom", "point", (10.0, 8.0, 50.0, 72.0))
    return sel.select(
        "id", F.col("geom.x").alias("x"), F.col("geom.y").alias("y")
    )


def q_cx_bbox_inverted(spark, sf_dir):
    """P1 edge case: inverted query rect is auto-oriented (ref base.py:684-688)."""
    from spatialpandas_spark import cx_filter, with_bounds

    pts = with_bounds(_points(spark, sf_dir), "geom", "point")
    sel = cx_filter(pts, "geom", "point", (50.0, 72.0, 10.0, 8.0))
    return sel.select(
        "id", F.col("geom.x").alias("x"), F.col("geom.y").alias("y")
    )


def q_area_by_group(spark, sf_dir):
    """F2 st_area (signed shoelace) over polygons-with-holes, aggregated.

    Diamonds from part with an inner CW hole diamond (r/2) — area of ring
    pair = 2r² - 2(r/2)² exactly (integer radii → exact FP)."""
    from spatialpandas_spark import st_area

    part = _t(spark, sf_dir, "part")
    cx = (F.col("p_partkey") % 50).cast("double")
    cy = (F.col("p_size") * 2).cast("double")
    r = (F.col("p_partkey") % 5 + 1).cast("double")
    h = r / 2  # half-integer exact
    shell = F.array(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)
    # hole wound CW (reverse orientation)
    hole = F.array(cx + h, cy, cx, cy - h, cx - h, cy, cx, cy + h, cx + h, cy)
    poly = F.array(shell, hole)
    return (
        part.select(F.col("p_brand").alias("brand"), st_area(poly).alias("a"))
        .groupBy("brand")
        .agg(F.sum("a").alias("sum_area"), F.count("*").cast("long").alias("n"))
    )


def q_length_by_group(spark, sf_dir):
    """F1 st_length (perimeter incl. holes) over the same polygons; FP sums
    rounded identically on both sides."""
    from spatialpandas_spark import st_length

    part = _t(spark, sf_dir, "part")
    cx = (F.col("p_partkey") % 50).cast("double")
    cy = (F.col("p_size") * 2).cast("double")
    r = (F.col("p_partkey") % 5 + 1).cast("double")
    h = r / 2
    shell = F.array(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)
    hole = F.array(cx + h, cy, cx, cy - h, cx - h, cy, cx, cy + h, cx + h, cy)
    poly = F.array(shell, hole)
    return (
        part.select(
            F.col("p_brand").alias("brand"),
            st_length(poly, "polygon").alias("l"),
        )
        .groupBy("brand")
        .agg(F.round(F.sum("l"), 4).alias("sum_len"))
    )


def q_bounds_multipoint(spark, sf_dir):
    """F3 st_bounds per row over a 3-point multipoint built from orders."""
    from spatialpandas_spark import st_bounds

    o = _t(spark, sf_dir, "orders")
    x1 = (F.col("o_orderkey") % 101).cast("double")
    y1 = (F.col("o_orderkey") % 37).cast("double")
    x2 = (F.col("o_custkey") % 53).cast("double")
    y2 = (F.col("o_custkey") % 29).cast("double")
    x3 = ((F.col("o_orderkey") + F.col("o_custkey")) % 71).cast("double")
    y3 = ((F.col("o_orderkey") + F.col("o_custkey")) % 43).cast("double")
    mp = F.array(x1, y1, x2, y2, x3, y3)
    b = st_bounds(mp, "multipoint")
    return o.select(
        F.col("o_orderkey").alias("id"),
        b["x0"].alias("x0"),
        b["y0"].alias("y0"),
        b["x1"].alias("x1"),
        b["y1"].alias("y1"),
    )


def q_total_bounds(spark, sf_dir):
    """A1 total_bounds aggregate over the point table (NaN-skipping)."""
    from spatialpandas_spark import total_bounds_aggs, with_bounds

    pts = with_bounds(_points(spark, sf_dir), "geom", "point")
    return pts.agg(*total_bounds_aggs("bounds"))


def q_sjoin_inner(spark, sf_dir):
    """J1 sjoin inner: points-in-diamonds via broadcast filter-refine."""
    from spatialpandas_spark import sjoin

    j = sjoin(
        _points(spark, sf_dir),
        _diamonds(spark, sf_dir),
        left_geom="geom",
        right_geom="poly",
        left_type="point",
        right_type="polygon",
        how="inner",
    )
    return j.select("id", "did")


def q_sjoin_grid(spark, sf_dir):
    """J1/J2 sjoin via the grid-cell equi-join strategy (the large×large
    scale path: explode bboxes onto cells, shuffle hash join on the cell
    key, report-once dedup). Same oracle as the broadcast inner join —
    strategies must agree exactly."""
    from spatialpandas_spark import sjoin

    j = sjoin(
        _points(spark, sf_dir),
        _diamonds(spark, sf_dir),
        left_geom="geom",
        right_geom="poly",
        left_type="point",
        right_type="polygon",
        how="inner",
        strategy="grid",
        cell_size=16.0,
    )
    return j.select("id", "did")


def q_sjoin_grid_left(spark, sf_dir):
    """Grid-strategy how='left' (inner + anti-join recovery): unmatched
    points keep NULL did."""
    from spatialpandas_spark import sjoin

    j = sjoin(
        _points(spark, sf_dir),
        _diamonds(spark, sf_dir),
        left_geom="geom",
        right_geom="poly",
        left_type="point",
        right_type="polygon",
        how="left",
        strategy="grid",
        cell_size=16.0,
    )
    return j.select("id", "did")


def q_sjoin_left(spark, sf_dir):
    """J1 sjoin how='left': unmatched points keep NULL did."""
    from spatialpandas_spark import sjoin

    j = sjoin(
        _points(spark, sf_dir),
        _diamonds(spark, sf_dir),
        left_geom="geom",
        right_geom="poly",
        left_type="point",
        right_type="polygon",
        how="left",
    )
    return j.select("id", "did")


def q_sjoin_counts(spark, sf_dir):
    """J1 + A-aggregation: points-per-diamond histogram (broadcast join →
    partial agg; the 100 TB shape for point-in-polygon scoring)."""
    from spatialpandas_spark import sjoin

    j = sjoin(
        _points(spark, sf_dir),
        _diamonds(spark, sf_dir),
        left_geom="geom",
        right_geom="poly",
        left_type="point",
        right_type="polygon",
        how="inner",
    )
    return j.groupBy("did").agg(F.count("*").cast("long").alias("n_points"))


def q_sjoin_poly_poly(spark, sf_dir):
    """J1 parity-plus: polygon × polygon sjoin (reference raises for
    non-point pairs). Diamonds intersect iff the L1 distance of centers
    <= r1 + r2 (Minkowski sum of L1 balls) — exact SQL oracle."""
    from spatialpandas_spark import sjoin, st_make_diamond

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("did"),
        st_make_diamond(
            (F.col("n_nationkey") * 5).cast("double"),
            (F.col("n_regionkey") * 25).cast("double"),
            F.lit(10.5),
        ).alias("geom"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sid"),
        st_make_diamond(
            (F.col("s_suppkey") % 130).cast("double"),
            (F.col("s_nationkey") * 4).cast("double"),
            (F.col("s_suppkey") % 5 + 2.5).cast("double"),
        ).alias("geom"),
    )
    j = sjoin(
        n, s, left_geom="geom", right_geom="geom",
        left_type="polygon", right_type="polygon", how="inner",
    )
    return j.select("did", "sid")


def q_hilbert_pack(spark, sf_dir):
    """O1/O2 hilbert_distance + pack_partitions (no SQL equivalent —
    rows-only check; pytest verifies the codec against a Python oracle)."""
    from spatialpandas_spark import pack_partitions, with_bounds

    pts = with_bounds(_points(spark, sf_dir), "geom", "point")
    packed = pack_partitions(pts, npartitions=8, p=10)
    return packed.select("id", "hilbert_distance")


def q_ref_interop(spark, sf_dir):
    """S6/interop: round-trip through the reference's on-disk dask format
    (ref ``io/parquet.py:143-182`` write, ``:488-519`` read) —
    ``write_reference_parquet`` emits part.{i}.parquet + the
    ``b'spatialpandas'`` partition-bounds ``_common_metadata``;
    ``read_reference_parquet(bounds=)`` prunes files from that metadata
    alone. A row-level cx refinement after the pruned read makes the
    result independent of file layout, so the oracle is exact."""
    import tempfile

    from spatialpandas_spark import cx_filter, with_bounds
    from spatialpandas_spark.sources.reference_parquet import (
        read_reference_parquet,
        st_point_to_flat,
        write_reference_parquet,
    )

    pts = with_bounds(_points(spark, sf_dir), "geom", "point")
    flat = pts.withColumn("geom", st_point_to_flat("geom"))
    packed = flat.repartitionByRange(4, F.col("bounds.x0")).sortWithinPartitions(
        F.col("bounds.x0")
    )
    path = os.path.join(tempfile.mkdtemp(prefix="ref_interop_"), "pts")
    write_reference_parquet(packed, path, geom_cols={"geom": "point"})
    back = read_reference_parquet(
        spark, path, bounds=(10.0, 8.0, 40.0, 72.0), point_columns=("geom",)
    )
    back = with_bounds(back.drop("bounds"), "geom", "point")
    sel = cx_filter(back, "geom", "point", (10.0, 8.0, 40.0, 72.0))
    return sel.select(
        "id", F.col("geom.x").alias("x"), F.col("geom.y").alias("y")
    )


def q_cx_read_covered(spark, sf_dir):
    """P3/P4 manifest read with covered-file passthrough
    (ref ``dask.py:616-638``): hilbert-pack points to parquet, then
    ``read_spatial_parquet_cx`` — disjoint files unopened, fully-covered
    files unfiltered, straddling files cx-refined. Result is exactly the
    viewport rows, so the oracle is the plain bbox predicate."""
    import tempfile

    from spatialpandas_spark import with_bounds
    from spatialpandas_spark.sources import (
        read_spatial_parquet_cx,
        write_spatial_parquet,
    )

    pts = with_bounds(_points(spark, sf_dir), "geom", "point")
    path = os.path.join(tempfile.mkdtemp(prefix="cx_read_"), "pts")
    write_spatial_parquet(pts, path, npartitions=8, p=10)
    rect = (10.0, 8.0, 70.0, 80.0)
    out = read_spatial_parquet_cx(spark, path, "geom", "point", rect)
    return out.select(
        "id", F.col("geom.x").alias("x"), F.col("geom.y").alias("y")
    )


def q_cx_lines(spark, sf_dir):
    """P5 exact segment-vs-rect: cx over 2-point lines from orders. Oracle:
    bbox overlap AND the segment's line straddles the rect corners."""
    from spatialpandas_spark import with_bounds
    from spatialpandas_spark.functions.arrow_kernels import cx_filter_arrow

    o = _t(spark, sf_dir, "orders")
    line = F.array(
        (F.col("o_orderkey") % 101).cast("double"),
        (F.col("o_orderkey") % 97).cast("double"),
        (F.col("o_custkey") % 89).cast("double"),
        (F.col("o_custkey") % 83).cast("double"),
    )
    df = with_bounds(
        o.select(F.col("o_orderkey").alias("id"), line.alias("geom")), "geom", "line"
    )
    # bulk path: bbox conjunct JVM-side, exact refinement as one Arrow
    # kernel pass (~9x the interpreted HOF; row-identical, pytest-asserted)
    return cx_filter_arrow(df, "geom", "line", (20.0, 20.0, 40.0, 35.0)).select("id")


def q_cx_diamonds(spark, sf_dir):
    """P5 exact polygon-vs-rect: diamonds from part vs a viewport. Oracle:
    L1 distance from rect to diamond center <= r (closed form)."""
    from spatialpandas_spark import st_make_diamond, with_bounds
    from spatialpandas_spark.functions.arrow_kernels import cx_filter_arrow

    part = _t(spark, sf_dir, "part")
    df = part.select(
        F.col("p_partkey").alias("id"),
        st_make_diamond(
            (F.col("p_partkey") % 120).cast("double"),
            (F.col("p_size") * 2).cast("double"),
            F.lit(7.5),
        ).alias("geom"),
    )
    df = with_bounds(df, "geom", "polygon")
    return cx_filter_arrow(df, "geom", "polygon", (30.0, 20.0, 60.0, 44.0)).select("id")


def q_oriented_area(spark, sf_dir):
    """F6 st_oriented: half the shells deliberately CW; orientation
    normalization must make every area positive 2r²."""
    from spatialpandas_spark import st_area
    from spatialpandas_spark.functions.transforms import st_oriented

    part = _t(spark, sf_dir, "part")
    cx = (F.col("p_partkey") % 50).cast("double")
    cy = (F.col("p_size") * 2).cast("double")
    r = (F.col("p_partkey") % 5 + 1).cast("double")
    ccw = F.array(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)
    cw = F.array(cx + r, cy, cx, cy - r, cx - r, cy, cx, cy + r, cx + r, cy)
    shell = F.when(F.col("p_partkey") % 2 == 0, ccw).otherwise(cw)
    df = part.select(
        F.col("p_partkey").alias("id"), F.array(shell).alias("geom")
    )
    fixed = df.select("id", st_oriented(F.col("geom")).alias("geom"))
    return fixed.select("id", st_area(F.col("geom")).alias("area"))


def q_centroid(spark, sf_dir):
    """Beyond-ref F-surface: st_centroid of diamond-with-hole polygons
    (shoelace area centroid, holes subtract) plus the length-weighted
    centroid of a 3-point polyline — both reduced analytically in the
    oracle (symmetric shapes center exactly; the polyline moment is
    closed-form)."""
    from spatialpandas_spark.functions.measures import st_centroid

    part = _t(spark, sf_dir, "part")
    cx = (F.col("p_partkey") % 50).cast("double")
    cy = (F.col("p_size") * 2).cast("double")
    r = (F.col("p_partkey") % 5 + 1).cast("double")
    h = r / 2
    shell = F.array(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)
    hole = F.array(cx + h, cy, cx, cy - h, cx - h, cy, cx, cy + h, cx + h, cy)
    poly = F.array(shell, hole)
    line = F.array(cx, cy, cx + r, cy, cx + r, cy + 2 * r)
    df = part.select(
        F.col("p_partkey").alias("id"),
        st_centroid(poly, "polygon").alias("pc"),
        st_centroid(line, "line").alias("lc"),
    )
    return df.select(
        "id",
        F.round(F.col("pc.x"), 6).alias("px"),
        F.round(F.col("pc.y"), 6).alias("py"),
        F.round(F.col("lc.x"), 6).alias("lx"),
        F.round(F.col("lc.y"), 6).alias("ly"),
    )


def q_boundary_length(spark, sf_dir):
    """F8 st_boundary reinterpretation: boundary-as-multiline length equals
    the polygon perimeter (closed form 4*sqrt(2)*r)."""
    from spatialpandas_spark import st_length
    from spatialpandas_spark.functions.transforms import st_boundary

    d = _diamonds(spark, sf_dir)
    b = st_boundary(F.col("poly"), "polygon")
    return d.select(
        "did", F.round(st_length(b, "multiline"), 6).alias("blen")
    )


def q_fillna_points(spark, sf_dir):
    """P8 fillna: NULL geometries (every 10th customer) filled with the
    origin point."""
    from spatialpandas_spark import st_point
    from spatialpandas_spark.functions.transforms import st_fill_missing

    c = _t(spark, sf_dir, "customer")
    geom = F.when(
        F.col("c_custkey") % 10 != 0,
        st_point(
            (F.col("c_custkey") % 97).cast("double"),
            (F.col("c_nationkey") * 4).cast("double"),
        ),
    )
    df = c.select(F.col("c_custkey").alias("id"), geom.alias("geom"))
    filled = df.select(
        "id", st_fill_missing(F.col("geom"), (0.0, 0.0), "point").alias("geom")
    )
    return filled.select(
        "id", F.col("geom.x").alias("x"), F.col("geom.y").alias("y")
    )


def q_fillna_pad(spark, sf_dir):
    """P8 pad-fill: forward-fill missing geometries in id order (window
    last(ignorenulls)); oracle reproduces the propagation arithmetic."""
    from spatialpandas_spark import st_point
    from spatialpandas_spark.functions.transforms import st_fill_missing_pad

    c = _t(spark, sf_dir, "customer")
    geom = F.when(
        F.col("c_custkey") % 5 != 0,
        st_point(
            (F.col("c_custkey") % 97).cast("double"),
            (F.col("c_nationkey") * 4).cast("double"),
        ),
    )
    df = c.select(F.col("c_custkey").alias("id"), geom.alias("geom"))
    filled = st_fill_missing_pad(df, "geom", "id")
    return filled.select(
        "id", F.col("geom.x").alias("x"), F.col("geom.y").alias("y")
    )


def q_geom_sort(spark, sf_dir):
    """O5 lexicographic geometry ordering: rank diamonds by the raw nested
    array (native array comparison replaces the reference's flattened-coord
    comparator, ``baselist.py:249-290``); oracle ranks by the coordinate
    tuple, which is the same order for equal-length diamond rings. Ranking
    runs through the distributed two-phase ``with_rank`` (range partition +
    local rank + broadcast offsets), not a single-task global window."""
    from spatialpandas_spark import st_make_diamond
    from spatialpandas_spark.operators.rank import with_rank

    part = _t(spark, sf_dir, "part")
    df = part.select(
        F.col("p_partkey").alias("id"),
        st_make_diamond(
            (F.col("p_partkey") % 40).cast("double"),
            (F.col("p_size") % 9).cast("double"),
            (F.col("p_partkey") % 3 + 1).cast("double"),
        ).alias("geom"),
    )
    return with_rank(df, ["geom", "id"], rank_col="rk").select("id", "rk")


def q_user_sessions(spark, sf_dir):
    """Window-function sessionization: a session break is a >30 min gap in
    a user's event stream; count sessions and events per user."""
    from pyspark.sql.window import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sessions = e.withColumn("new_s", is_new)
    return sessions.groupBy("user_id").agg(
        F.sum("new_s").cast("long").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
    )


def q_geom_groupby(spark, sf_dir):
    """A5/P10: group directly on a nested geometry column (native array
    grouping replaces the reference's factorize machinery)."""
    from spatialpandas_spark import st_make_diamond

    part = _t(spark, sf_dir, "part")
    df = part.select(
        st_make_diamond(
            (F.col("p_partkey") % 7).cast("double"),
            (F.col("p_size") % 5).cast("double"),
            F.lit(1.5),
        ).alias("geom")
    )
    groups = df.groupBy("geom").agg(F.count("*").cast("long").alias("cnt"))
    return groups.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.sum("cnt").cast("long").alias("total"),
    )


def q_wkb_roundtrip(spark, sf_dir):
    """F10/S7 WKB bridge: encode -> decode is the identity; oracle compares
    the round-tripped coordinates against the direct derivation."""
    from spatialpandas_spark.functions.wkb import st_as_wkb, st_from_wkb

    pts = _points(spark, sf_dir)
    rt = pts.select(
        "id",
        st_from_wkb(st_as_wkb(F.col("geom"), "point"), "point").alias("geom"),
    )
    return rt.select("id", F.col("geom.x").alias("x"), F.col("geom.y").alias("y"))


# ---------------------------------------------------------------- relational
def q_tpch_q1(spark, sf_dir, exact=True):
    """TPC-H Q1 pricing summary (relational shell: scan→filter→agg).

    exact=True (the gate path): SUM columns accumulate in DECIMAL(38,6)
    — each double rounds to 6 decimals ONCE per row (deterministic, the
    same input double both engines), then the aggregation is exact
    integer arithmetic, immune to summation order — and are compared as
    scale-pinned DECIMAL(38,6) STRINGS so no decimal→double conversion
    sits before the compared value (DuckDB's decimal→double cast is not
    correctly rounded; at sf1 sum magnitudes ~1e12 the double ULP
    ~1.2e-4 reaches the ROUND(.,4) grain, so a one-ulp conversion
    disagreement could flip the hash — both engines round decimals
    half-up for positives and print the full pinned scale, verified
    empirically). AVG columns stay double: the pre-division conversion
    error is divided by COUNT (~2e-11 at sf1), far below their rounding
    grain.

    exact=False (the bench b10 path): plain double sums — the
    production-speed formulation; DECIMAL accumulation costs ~+40% at
    sf0.1 (BASELINE.md round-6/7 notes) and the order-exactness only
    matters to the cross-engine hash gate."""
    li = _t(spark, sf_dir, "lineitem")
    cnt = F.count("*")

    if not exact:
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                cnt.cast("long").alias("count_order"),
            )
        )

    def dsum(col):
        return F.sum(col.cast("decimal(38,6)"))

    def dstr(agg, scale):
        return F.round(agg, scale).cast("decimal(38,6)").cast("string")

    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dstr(dsum(F.col("l_quantity")), 2).alias("sum_qty"),
            dstr(dsum(F.col("l_extendedprice")), 4).alias("sum_base_price"),
            dstr(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                dsum(F.col("l_quantity")).cast("double") / cnt, 4
            ).alias("avg_qty"),
            F.round(
                dsum(F.col("l_discount")).cast("double") / cnt, 6
            ).alias("avg_disc"),
            cnt.cast("long").alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3-ish shipping priority (broadcast dim join + agg)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q_top_orders_per_priority(spark, sf_dir):
    """Window function: top-3 orders by totalprice per orderpriority."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


def q_events_hourly(spark, sf_dir):
    """Tumbling-window aggregation over the events table (batch form of the
    streaming rollup; watermarked Structured Streaming variant in
    spatialpandas_spark.streaming)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ------------------------------------------------------- LLM-pipeline ops
def q_dedup_exact(spark, sf_dir):
    """Exact dedup on documents.text: surviving doc_ids (min id per hash)."""
    from spatialpandas_spark.operators.dedup import dedup_exact

    return dedup_exact(
        _t(spark, sf_dir, "documents"), ["text"], "doc_id"
    ).select("doc_id")


def q_doc_stats(spark, sf_dir):
    """Text analysis: token count / char count / avg word length."""
    from spatialpandas_spark.operators.text import (
        avg_word_length,
        char_count,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        char_count(F.col("text")).cast("long").alias("n_chars2"),
        F.round(avg_word_length(F.col("text")), 6).alias("avg_word_len"),
    )


def q_bpe_tokens(spark, sf_dir):
    """BPE-ish subword token counting (GPT-2-style pretokenizer regex,
    lookahead-free so the RE2-based oracle tokenizes identically) — the
    token-budget estimate an LLM-data pipeline filters on."""
    from spatialpandas_spark.operators.text import bpe_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination: treat every 17th document as the eval
    set, compute each remaining training doc's 5-gram overlap against the
    broadcast benchmark shingle set. Exact per-doc totals/matches/fraction
    checked against a DuckDB set-join twin."""
    from spatialpandas_spark.operators.contamination import ngram_overlap

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 17 == 0)
    train = d.filter(F.col("doc_id") % 17 != 0)
    return ngram_overlap(train, bench, n=5).select(
        "doc_id",
        F.col("total_ngrams").cast("long").alias("total_ngrams"),
        F.col("matched_ngrams").cast("long").alias("matched_ngrams"),
        "overlap",
    )


#: KMV gate parameters: k small enough that sf0.01's ~13k distinct
#: 5-gram sides overflow the sketch (exercising the estimator + the
#: HLL prefilter), large enough that the overlap stats are stable.
_KMV_K = 128


def q_corpus_kmv(spark, sf_dir):
    """KMV corpus-overlap screen (operators/sketch.py): split documents
    into corpus A (doc_id % 2 = 0) and corpus B (odd), sketch each
    side's distinct word-5-gram set with the HLL-prefiltered scan path
    (prefilter=True — the at-scale formulation the gate must pin), then
    compute the sketch-only overlap stats. Long-format tagged rows:

    - src='kmv:sketch_a'/'kmv:sketch_b': doc_id = sketch rank (1..k),
      total_ngrams = the 60-bit bottom-k hash — the exact bottom-k rows,
      so the gate hash pins the full sketch content;
    - src='kmv:k_used'/'kmv:n_both': doc_id = the discrete overlap
      counters;
    - src='kmv:jaccard'/... : overlap = the estimator outputs rounded
      to 6 (one IEEE multiply/divide chain, engine-portable).

    Oracle: exact bottom-k via ROW_NUMBER over the distinct md5-prefix
    hash set per side + the same estimator arithmetic — DuckDB replays
    the whole screen because the sketch is a pure function of the key
    set (reference has no sketch surface; KMV per Bar-Yossef 2002 /
    Beyer SIGMOD 2007). Breadcrumbs: kmv_sketch/kmv_overlap ->
    operators/sketch.py (tests/test_sketch.py python twins)."""
    from spatialpandas_spark.operators.sketch import kmv_overlap, shingle_sketch

    docs = _t(spark, sf_dir, "documents")
    k = _KMV_K
    ska = shingle_sketch(docs.filter(F.col("doc_id") % 2 == 0), n=5, k=k)
    skb = shingle_sketch(docs.filter(F.col("doc_id") % 2 == 1), n=5, k=k)
    nul = F.lit(None)

    def sketch_rows(sk, tag):
        return sk.select(
            F.lit(tag).alias("src"),
            F.col("rank").cast("long").alias("doc_id"),
            F.col("h").cast("long").alias("total_ngrams"),
            nul.cast("long").alias("matched_ngrams"),
            nul.cast("double").alias("overlap"),
        )

    ov = kmv_overlap(ska, skb, k)
    counts = ov.selectExpr(
        "stack(2, 'kmv:k_used', k_used, 'kmv:n_both', n_both) AS (src, doc_id)"
    ).select(
        "src",
        F.col("doc_id").cast("long").alias("doc_id"),
        nul.cast("long").alias("total_ngrams"),
        nul.cast("long").alias("matched_ngrams"),
        nul.cast("double").alias("overlap"),
    )
    ests = ov.selectExpr(
        """stack(7,
           'kmv:jaccard', round(jaccard, 6),
           'kmv:union_est', round(union_est, 6),
           'kmv:intersection_est', round(intersection_est, 6),
           'kmv:distinct_a_est', round(distinct_a_est, 6),
           'kmv:distinct_b_est', round(distinct_b_est, 6),
           'kmv:containment_a', round(containment_a, 6),
           'kmv:containment_b', round(containment_b, 6)) AS (src, overlap)"""
    ).select(
        "src",
        nul.cast("long").alias("doc_id"),
        nul.cast("long").alias("total_ngrams"),
        nul.cast("long").alias("matched_ngrams"),
        "overlap",
    )
    return (
        sketch_rows(ska, "kmv:sketch_a")
        .unionByName(sketch_rows(skb, "kmv:sketch_b"))
        .unionByName(counts)
        .unionByName(ests)
    )


#: streaming-sketch gate k (small enough that every cumulative sketch
#: overflows at sf0.01 — the merge path is exercised, not just the
#: exact-set case)
_STREAM_SKETCH_K = 96


def q_streaming_sketch(spark, sf_dir):
    """Streaming KMV sketch maintenance (streaming/sketch.py), promoted
    to a driver slot in round 10 (VERDICT r9 ask #3 — the registry slot
    freed by retiring ``bounds_multipoint`` to the per-CI battery):
    documents split into three deterministic micro-batches
    (doc_id % 3 = 0, 1, 2, ingested in order) through ``sketch_batch``
    with a fresh state dir. The gate pins the CUMULATIVE merged sketch
    after EVERY batch (src='b0'/'b1'/'b2' tagged (rank, h) rows — each
    a pure function of the union of batches ingested so far, so the
    oracle replays bottom-k over the distinct shingle hashes of docs
    with doc_id % 3 <= i), plus the state re-read after REPLAYING batch
    1 (src='replay' — the exactly-once contract: byte-identical to
    'b2'). Breadcrumbs: streaming/sketch.py sketch_batch/load_sketch;
    twin batteries tests/test_streaming_contracts.py +
    tests/test_streaming_sketch.py."""
    import tempfile

    from spatialpandas_spark.streaming.sketch import load_sketch, sketch_batch

    import os

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # a NOT-yet-existing subpath: the state reader treats only
    # PATH_NOT_FOUND as "first batch" (streaming/_state.py), and
    # mkdtemp itself creates its directory
    st = os.path.join(
        tempfile.mkdtemp(prefix="gate_streaming_sketch_"), "state"
    )
    k = _STREAM_SKETCH_K
    out = None
    for i in range(3):
        cur = (
            sketch_batch(
                spark,
                docs.filter(F.col("doc_id") % 3 == i),
                st,
                k=k,
                batch_id=i,
            )
            .select(F.lit(f"b{i}").alias("src"), "rank", "h")
            # materialize NOW: the replay below rewrites the batch=1
            # partition files this lazy read would otherwise list late
            .localCheckpoint(eager=True)
        )
        out = cur if out is None else out.unionByName(cur)
    # replay a middle batch: state must stay identical (exactly-once)
    sketch_batch(
        spark, docs.filter(F.col("doc_id") % 3 == 1), st, k=k, batch_id=1
    )
    return out.unionByName(
        load_sketch(spark, st).select(
            F.lit("replay").alias("src"), "rank", "h"
        )
    )


def q_screen_batch(spark, sf_dir):
    """Streaming decontamination screening (streaming/screen.py),
    promoted to a driver slot in round 11 (VERDICT r10 ask #4 — the
    slot freed by retiring ``fillna_points`` to the per-CI battery):
    benchmark = every 17th document grouped g0/g1 by (doc_id div 17)
    parity, indexed once (operators/contamination_index.py); corpus =
    the rest, ingested as three deterministic micro-batches
    (doc_id % 3). The gate pins the CUMULATIVE per-group containment
    summary after EVERY batch (src='b0'/'b1'/'b2') plus the state
    re-read after REPLAYING batch 1 (src='replay' — exactly-once: must
    equal 'b2'). Found-ness is monotone and union-commutative, so the
    summary after batch i is a pure function of the probe set and the
    distinct corpus shingle-hash set of batches <= i — which is what
    the DuckDB oracle replays (per-group bottom-k probes, min-batch per
    corpus hash). Breadcrumbs: streaming/screen.py screen_batch/
    load_screen; twin batteries tests/test_streaming_contracts.py."""
    import os
    import tempfile

    from spatialpandas_spark.operators.contamination_index import (
        build_decon_index,
    )
    from spatialpandas_spark.streaming.screen import load_screen, screen_batch

    d = _t(spark, sf_dir, "documents")
    grp = F.when(F.expr("(doc_id div 17) % 2") == 0, F.lit("g0")).otherwise(
        F.lit("g1")
    )
    bench = d.filter(F.col("doc_id") % 17 == 0).select(
        grp.alias("grp"), "doc_id", "text"
    )
    corpus = d.filter(F.col("doc_id") % 17 != 0).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="gate_screen_batch_")
    ixp = os.path.join(root, "index")
    st = os.path.join(root, "state")  # not-yet-existing subpath
    build_decon_index(bench, ixp, n=5, k=_PROBE_K, group_cols=["grp"])

    def shape(df, src):
        return df.select(
            F.lit(src).alias("src"),
            "grp",
            F.col("n_probed").cast("long").alias("n_probed"),
            F.col("n_found").cast("long").alias("n_found"),
            F.round(F.col("containment_b"), 6).alias("containment"),
            F.col("exact").cast("long").alias("exact"),
        )

    out = None
    for i in range(3):
        cur = shape(
            screen_batch(
                spark,
                corpus.filter(F.col("doc_id") % 3 == i),
                ixp,
                st,
                batch_id=i,
            ),
            f"b{i}",
            # materialize NOW: the replay below rewrites the batch=1
            # state partition a lazy summary read would list late
        ).localCheckpoint(eager=True)
        out = cur if out is None else out.unionByName(cur)
    screen_batch(
        spark, corpus.filter(F.col("doc_id") % 3 == 1), ixp, st, batch_id=1
    )
    return out.unionByName(shape(load_screen(spark, ixp, st), "replay"))


def _screen_batch_oracle_sql(k: int, n: int = 5, seed: int = 42) -> str:
    """SQL replay of the streamed screen: the per-group summary after
    batch i counts probe hashes (per-group bottom-k of the benchmark
    group's distinct shingle hashes) whose earliest containing corpus
    batch is <= i; 'replay' equals the batch-2 summary."""
    grp = "CASE WHEN (doc_id // 17) % 2 = 0 THEN 'g0' ELSE 'g1' END"
    return f"""
WITH sbsh AS (
  SELECT DISTINCT {grp} AS grp,
         array_to_string(tk[u.i:u.i+{n - 1}], ' ') AS s
  FROM (SELECT doc_id, {_TOKS} AS tk FROM documents
        WHERE doc_id % 17 = 0 AND trim(text) != '') t,
       UNNEST(range(1, len(tk) - {n - 2})) AS u(i)
),
sbhv AS (SELECT DISTINCT grp,
                ('0x' || substr(md5('{seed}:' || s), 1, 15))::BIGINT AS h
         FROM sbsh),
spbk AS (SELECT grp, h FROM
           (SELECT grp, h,
                   ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rnk
            FROM sbhv)
         WHERE rnk <= {k}),
stsh AS (
  SELECT doc_id % 3 AS b, array_to_string(tk[u.i:u.i+{n - 1}], ' ') AS s
  FROM (SELECT doc_id, {_TOKS} AS tk FROM documents
        WHERE doc_id % 17 != 0 AND trim(text) != '') t,
       UNNEST(range(1, len(tk) - {n - 2})) AS u(i)
),
schv AS (SELECT ('0x' || substr(md5('{seed}:' || s), 1, 15))::BIGINT AS h,
                MIN(b) AS mb
         FROM stsh GROUP BY 1),
sfl AS (SELECT p.grp, p.h, c.mb FROM spbk p LEFT JOIN schv c USING (h)),
ssum AS (
  SELECT u.i AS bi, grp,
         CAST(COUNT(*) AS BIGINT) AS n_probed,
         CAST(SUM(CASE WHEN mb IS NOT NULL AND mb <= u.i
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_found
  FROM sfl, UNNEST([0, 1, 2]) AS u(i)
  GROUP BY 1, 2
),
sfin AS (
  SELECT 'b' || CAST(bi AS VARCHAR) AS src, grp, n_probed, n_found
  FROM ssum
  UNION ALL
  SELECT 'replay', grp, n_probed, n_found FROM ssum WHERE bi = 2
)
SELECT src, grp, n_probed, n_found,
       ROUND(CASE WHEN n_probed > 0
                  THEN CAST(n_found AS DOUBLE) / n_probed
                  ELSE 0.0 END, 6) AS containment,
       CAST(CASE WHEN n_probed < {k} THEN 1 ELSE 0 END AS BIGINT) AS exact
FROM sfin"""


def _streaming_sketch_oracle_sql(k: int, n: int = 5, seed: int = 42) -> str:
    """SQL replay of the streamed sketch: the state after batch i is the
    bottom-k of the distinct shingle-hash set of all docs with
    doc_id % 3 <= i (merge-of-bottom-k == bottom-k-of-union); the
    post-replay read equals the batch-2 state."""
    return f"""
WITH ssh AS (
  SELECT DISTINCT doc_id % 3 AS b3,
         array_to_string(tk[u.i:u.i+{n - 1}], ' ') AS s
  FROM (SELECT doc_id, {_TOKS} AS tk FROM documents
        WHERE trim(text) != '') t,
       UNNEST(range(1, len(tk) - {n - 2})) AS u(i)
),
shv AS (SELECT DISTINCT b3,
               ('0x' || substr(md5('{seed}:' || s), 1, 15))::BIGINT AS h
        FROM ssh),
cum AS (SELECT 0 AS ci, h FROM shv WHERE b3 <= 0
        UNION ALL SELECT 1, h FROM shv WHERE b3 <= 1
        UNION ALL SELECT 2, h FROM shv WHERE b3 <= 2),
dcu AS (SELECT DISTINCT ci, h FROM cum),
srk AS (SELECT ci, h,
               ROW_NUMBER() OVER (PARTITION BY ci ORDER BY h) AS rank
        FROM dcu),
skk AS (SELECT ci, CAST(rank AS BIGINT) AS rank, h FROM srk
        WHERE rank <= {k})
SELECT 'b' || ci AS src, rank, h FROM skk
UNION ALL
SELECT 'replay' AS src, rank, h FROM skk WHERE ci = 2"""


#: containment-probe gate k: small enough that the sf0.01 benchmark
#: side's distinct 5-grams overflow it (exercising the SAMPLED probe
#: path — the bottom-k probe set + its per-hash membership flags are
#: each pinned), large enough to be a meaningful sample.
_PROBE_K = 64


def q_containment_probe(spark, sf_dir):
    """Direct containment probe (operators/sketch.py containment_probe
    — the round-9 ADVICE fix for the small-in-large blindness of the
    union-jaccard screen): benchmark = every 17th document (the 'decon'
    fixture), corpus = the rest. The benchmark's bottom-_PROBE_K
    distinct 5-gram hashes are probed for membership in the corpus
    shingle stream. Long-format tagged rows:

    - src='probe:hits': doc_id = probe rank (1..k), total_ngrams = the
      60-bit probe hash, matched_ngrams = found flag (0/1) — pins the
      exact probe set AND its sampled membership;
    - src='probe:n_probed'/'probe:n_found': doc_id = the counters;
    - src='probe:containment': overlap = n_found/n_probed rounded 6.

    Oracle: ROW_NUMBER bottom-k over the benchmark's distinct
    md5-prefix shingle hashes LEFT JOINed to the corpus's distinct
    shingle-hash set — the probe is a pure function of the two shingle
    sets. Breadcrumbs: tests/test_sketch.py python twins +
    tests/test_corpus_frame.py screened-decontamination regression."""
    from spatialpandas_spark.operators.sketch import containment_probe

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 17 == 0)
    train = d.filter(F.col("doc_id") % 17 != 0)
    det = containment_probe(
        train, bench, n=5, k=_PROBE_K, detail=True
    ).localCheckpoint(eager=False)  # consumed twice (rows + summary)
    nul = F.lit(None)
    hits = det.select(
        F.lit("probe:hits").alias("src"),
        F.col("rank").cast("long").alias("doc_id"),
        F.col("h").cast("long").alias("total_ngrams"),
        F.col("found").cast("long").alias("matched_ngrams"),
        nul.cast("double").alias("overlap"),
    )
    s = det.agg(
        F.count("*").alias("np"), F.sum("found").cast("long").alias("nf")
    )
    counts = s.selectExpr(
        "stack(2, 'probe:n_probed', np, 'probe:n_found', nf) AS (src, doc_id)"
    ).select(
        "src",
        F.col("doc_id").cast("long").alias("doc_id"),
        nul.cast("long").alias("total_ngrams"),
        nul.cast("long").alias("matched_ngrams"),
        nul.cast("double").alias("overlap"),
    )
    est = s.select(
        F.lit("probe:containment").alias("src"),
        nul.cast("long").alias("doc_id"),
        nul.cast("long").alias("total_ngrams"),
        nul.cast("long").alias("matched_ngrams"),
        F.round(
            F.when(
                F.col("np") > 0,
                F.col("nf").cast("double") / F.col("np"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("overlap"),
    )
    return hits.unionByName(counts).unionByName(est)


def q_decontamination_merged(spark, sf_dir):
    """Merged contamination-screening gate, tagged union (columns are
    reinterpreted per variant, knn-gate style):

    - src='decon': exact per-doc benchmark 5-gram overlap
      (doc_id/total_ngrams/matched_ngrams/overlap as in the standalone
      row) [operators/contamination.py ngram_overlap —
      tests/test_contamination.py];
    - src='kmv:*': the corpus-level KMV screen (corpus-vs-corpus
      jaccard/union estimates) — see :func:`q_corpus_kmv`
      [operators/sketch.py — tests/test_sketch.py];
    - src='probe:*': the DIRECT containment probe that DECIDES whether
      the exact pass is worth running (round 9; replaces the
      union-jaccard containment screen, which is blind for a small
      benchmark in a huge corpus) — see :func:`q_containment_probe`;
    - src='bloom' (round 9): the SAME per-doc overlap computed through
      ``ngram_overlap_bloom`` — bloom-bitmap prefilter at scan stage
      (pure Catalyst bit arithmetic over a one-row broadcast bitmap) +
      exact semi-join verify, for benchmarks beyond broadcast size.
      The values are EXACT by construction (blooms have no false
      negatives; the verify join removes false positives), so the
      oracle is the identical set-join SQL retagged — the gate pins
      the lossy-prefilter path's exactness
      [operators/contamination.py ngram_overlap_bloom —
      tests/test_contamination.py bloom battery]."""
    decon = q_decontamination(spark, sf_dir).select(
        F.lit("decon").alias("src"),
        "doc_id",
        "total_ngrams",
        "matched_ngrams",
        "overlap",
    )
    from spatialpandas_spark.operators.contamination import (
        ngram_overlap_bloom,
    )

    d = _t(spark, sf_dir, "documents")
    bloom = ngram_overlap_bloom(
        d.filter(F.col("doc_id") % 17 != 0),
        d.filter(F.col("doc_id") % 17 == 0),
        n=5,
    ).select(
        F.lit("bloom").alias("src"),
        "doc_id",
        F.col("total_ngrams").cast("long").alias("total_ngrams"),
        F.col("matched_ngrams").cast("long").alias("matched_ngrams"),
        "overlap",
    )
    return (
        decon.unionByName(q_corpus_kmv(spark, sf_dir))
        .unionByName(q_containment_probe(spark, sf_dir))
        .unionByName(bloom)
    )


def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals: token-level duplicate
    fraction (duplicate_line_fraction over one-token-per-line text) and
    the token share of the most frequent 2-gram / 3-gram."""
    from spatialpandas_spark.operators.text import (
        duplicate_line_fraction,
        top_ngram_fraction,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        duplicate_line_fraction(
            F.translate(F.col("text"), " ", "\n")
        ).alias("dup_token_frac"),
        top_ngram_fraction(F.col("text"), 2).alias("top2_frac"),
        top_ngram_fraction(F.col("text"), 3).alias("top3_frac"),
    )


#: fixed BPE training corpus for the tokenizer gate: training runs
#: driver-side on this histogram (deterministic by construction —
#: operators/bpe.py lexicographic tie-break), so BOTH the Spark gate and
#: the SQL oracle hold the identical merge list, and the gate hash pins
#: the APPLY path (segmentation + vocab ids) over the real documents
#: table. The training path itself is pinned by tests/test_bpe.py's
#: independent recount-from-scratch reference trainer.
_BPE_FIXTURE_CORPUS = (
    "the quick brown fox jumps over the lazy dog near the river bank",
    "data pipelines process large corpora of text for model training runs",
    "the training data quality matters more than the model size in 2024",
    "streaming systems shuffle partitions across the cluster every hour",
    "tokenizers merge frequent byte pairs into subword units for text",
    "documents with repeated words words words compress well under bpe",
    "run 42 jobs over 100 terabytes and the shuffle stays bounded",
    "the quick experiments confirm the merge list is deterministic",
)
_BPE_GATE_MERGES = 30


def _bpe_fixture_merges():
    import re
    from collections import Counter

    from spatialpandas_spark.operators.bpe import train_bpe_from_histogram

    hist: Counter = Counter()
    for s in _BPE_FIXTURE_CORPUS:
        for w in re.split(r"[^a-z0-9]+", s.lower()):
            if w:
                hist[w] += 1
    return train_bpe_from_histogram(dict(hist), _BPE_GATE_MERGES)


def _bpe_ids_ctes() -> str:
    """Shared CTE chain producing per-doc BPE token-id lists
    (``agg`` = (doc_id, tid)): character-spaced words, one
    ``replace(replace(...))`` pair per merge IN RANK ORDER (two passes
    make consumed-delimiter skips impossible — after pass 1 no two
    unmerged occurrences are adjacent, so pass 2 catches the rest;
    in-order replay equals the greedy lowest-rank-first segmenter
    because a trained merge's operands always predate it), then a CASE
    vocab lookup and a per-doc flatten in word order. Used by both the
    doc_chunks 'bpe' oracle and the shard_pack 'mseq' oracle."""
    from spatialpandas_spark.operators.bpe import bpe_vocab_ids

    merges = _bpe_fixture_merges()
    vocab = bpe_vocab_ids(merges)
    expr = "' ' || array_to_string(string_split(word, ''), ' ') || ' </w> '"
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a + b} "
        expr = f"replace(replace({expr}, '{pat}', '{rep}'), '{pat}', '{rep}')"
    case_items = " ".join(f"WHEN '{s}' THEN {i}" for s, i in vocab.items())
    ids_expr = (
        f"list_transform(list_filter(string_split({expr}, ' '), "
        f"x -> x != ''), x -> CASE x {case_items} ELSE 0 END)"
    )
    return f"""w AS (
          SELECT doc_id, u.i AS wi, wds[u.i] AS word
          FROM (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x != '') AS wds
                FROM documents) d,
               UNNEST(range(1, len(wds) + 1)) AS u(i)
        ),
        -- segment each DISTINCT word once, then join back to the word
        -- occurrences: the replace-chain cost becomes O(vocabulary),
        -- not O(corpus tokens) — the same Zipf amortization the Spark
        -- side's distinct-word cache uses, and what keeps this oracle
        -- feasible at the sf1 rehearsal scale
        dw AS (SELECT DISTINCT word FROM w),
        seg AS (SELECT word, {ids_expr} AS ids FROM dw),
        agg AS (SELECT w.doc_id, flatten(list(seg.ids ORDER BY w.wi)) AS tid
                FROM w JOIN seg USING (word) GROUP BY w.doc_id)"""


def _bpe_oracle_sql() -> str:
    """Independent DuckDB replay of ``bpe_encode_ids`` (see
    :func:`_bpe_ids_ctes`). Output matches the 'bpe' variant of the
    ``doc_chunks`` gate: per-doc token count + md5 of the comma-joined
    id sequence (hash covers every token id)."""
    return f"""
        WITH {_bpe_ids_ctes()}
        SELECT d.doc_id,
               CAST(NULL AS BIGINT) AS chunk_id,
               CAST(COALESCE(len(a.tid), 0) AS BIGINT) AS n_tokens,
               md5(COALESCE(array_to_string(a.tid, ','), '')) AS chunk_md5
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


#: extra unigram-LM training lines: the BPE fixture plus sentences in the
#: documents table's own word domain, so the trained piece table yields a
#: healthy mix of whole-word / multi-char-subword / char-fallback Viterbi
#: segmentations on the REAL data (at max_piece_len=4: 16 of the 31 pool
#: words segment into true multi-char subwords, 9 stay whole, 7 fall back
#: to chars — all three decoder paths under the gate hash).
_UNIGRAM_FIXTURE_EXTRA = (
    "the table values stream over windows while queries join rows",
    "sorted batches group keys and hashes for merging columns",
    "scanning filters parts of big small data vectors in order",
    "customers query the streaming window tables for valued parts",
    "a slow scan beats a fast hash when rows group by key",
    "duplicate lines vector the batch agg under sorted order",
)
_UNIGRAM_VOCAB = 120
_UNIGRAM_MAX_PIECE = 4
_UNIGRAM_TABLE_CACHE: dict | None = None


def _unigram_fixture_table() -> dict[str, float]:
    """Deterministic fixture-trained unigram piece table (EM + loss
    pruning run driver-side once per process; training itself is pinned
    by tests/test_unigram.py's brute-force enumeration oracles)."""
    global _UNIGRAM_TABLE_CACHE
    if _UNIGRAM_TABLE_CACHE is None:
        import re
        from collections import Counter

        from spatialpandas_spark.operators.unigram import (
            train_unigram_from_histogram,
        )

        hist: Counter = Counter()
        for s in _BPE_FIXTURE_CORPUS + _UNIGRAM_FIXTURE_EXTRA:
            for w in re.split(r"[^a-z0-9]+", s.lower()):
                if w:
                    hist[w] += 1
        _UNIGRAM_TABLE_CACHE = train_unigram_from_histogram(
            dict(hist),
            vocab_size=_UNIGRAM_VOCAB,
            max_piece_len=_UNIGRAM_MAX_PIECE,
            em_iters=2,
        )
    return _UNIGRAM_TABLE_CACHE


def _wordpiece_fixture_vocab():
    """Fixture WordPiece vocab for the 'wp' gate variant: trained
    driver-side on the same histogram as the BPE fixture (deterministic
    by construction — likelihood-score ties break lexicographically),
    so BOTH the Spark gate and the SQL oracle hold the identical vocab
    and the gate hash pins the APPLY path (greedy longest-match) over
    the real documents. The training path itself is pinned by
    tests/test_wordpiece.py's independent expanded-corpus trainer."""
    import re
    from collections import Counter

    from spatialpandas_spark.operators.wordpiece import (
        train_wordpiece_from_histogram,
    )

    hist: Counter = Counter()
    for s in _BPE_FIXTURE_CORPUS:
        for w in re.split(r"[^a-z0-9]+", s.lower()):
            if w:
                hist[w] += 1
    return train_wordpiece_from_histogram(dict(hist), 120)


#: byte-mode gate substitutions: three vowels of the ascii fixture map
#: to umlauts, making every derived word NON-ASCII. Their UTF-8 bytes
#: land in the printable Latin-1 span of the GPT-2 byte alphabet, so
#: the byte-level word is a plain 2-chars-per-umlaut string both Python
#: and DuckDB agree on: ä=C3A4 -> 'Ã¤', ö=C3B6 -> 'Ã¶', ü=C3BC -> 'Ã¼'.
_WPB_SUBS = (("a", "ä", "Ã¤"),
             ("o", "ö", "Ã¶"),
             ("u", "ü", "Ã¼"))


def _wordpiece_bytes_fixture_vocab():
    """Fixture vocab for the 'wpb' (byte-mode) gate variant: trained
    driver-side on the umlaut-substituted fixture corpus through the
    byte-level pre-tokenizer — the SAME histogram->trainer path
    ``train_wordpiece(mode='bytes')`` runs, deterministic by the
    trainer's tie contract. Training identity is pinned by
    tests/test_wordpiece.py's byte-mode reference trainer."""
    from collections import Counter

    from spatialpandas_spark.operators.bpe import _byte_words
    from spatialpandas_spark.operators.wordpiece import (
        train_wordpiece_from_histogram,
    )

    hist: Counter = Counter()
    for s in _BPE_FIXTURE_CORPUS:
        for a, u, _ in _WPB_SUBS:
            s = s.replace(a, u)
        hist.update(_byte_words(s))
    return train_wordpiece_from_histogram(dict(hist), 160)


def _wordpiece_oracle_sql(vocab=None, word_expr: str = "wds[u.i]") -> str:
    """Independent DuckDB replay of ``wordpiece_encode_ids``
    (operators/wordpiece.py segment_word_wp): greedy longest-match as a
    RECURSIVE CTE walking each DISTINCT word left to right — per step a
    list_transform over candidate lengths looks every substring up in a
    CASE vocab table (the ``##`` continuation prefix applied via the
    key, so position-1 and continuation pieces can never cross-match),
    keeps the matches, and list_reverse_sort picks the LONGEST; no
    match -> the whole word collapses to ``[UNK]`` (id 0), exactly the
    engine rule. Distinct-word amortization as in the unigram oracle.
    Output shape matches the 'wp'/'wpb' variants of ``doc_chunks``:
    per-doc token count + md5 of the comma-joined id sequence.

    ``vocab``/``word_expr`` parametrize the byte-mode twin
    (:func:`_wordpiece_bytes_oracle_sql`): substr/length in DuckDB
    count UTF-8 CHARACTERS, exactly like Python iterates the
    byte-alphabet string, so the same CTE segments byte-level words."""
    if vocab is None:
        vocab = _wordpiece_fixture_vocab()
    from spatialpandas_spark.operators.wordpiece import CONT, UNK

    def esc(s: str) -> str:
        return s.replace("'", "''")

    maxlen = max(
        len(p) - len(CONT) if p.startswith(CONT) else len(p)
        for p in vocab
        if p != UNK
    )
    id_case = (
        "CASE __key "
        + " ".join(
            f"WHEN '{esc(p)}' THEN {i}"
            for i, p in enumerate(vocab)
            if p != UNK
        )
        + " END"
    )
    keyed = id_case.replace(
        "__key",
        "CASE WHEN pos = 1 THEN substr(word, pos, c_l) "
        f"ELSE '{CONT}' || substr(word, pos, c_l) END",
    )
    return f"""
        WITH RECURSIVE
        w AS (
          SELECT doc_id, u.i AS wi, {word_expr} AS word
          FROM (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x != '') AS wds
                FROM documents) d,
               UNNEST(range(1, len(wds) + 1)) AS u(i)
        ),
        dw AS (SELECT DISTINCT word FROM w),
        sg AS (
          SELECT word, 1 AS pos, CAST([] AS INTEGER[]) AS ids FROM dw
          UNION ALL
          SELECT word,
                 CASE WHEN pick IS NULL THEN length(word) + 1
                      ELSE pos + pick['l'] END,
                 CASE WHEN pick IS NULL THEN [0]
                      ELSE list_append(ids, pick['id']) END
          FROM (
            SELECT word, pos, ids,
              list_reverse_sort(list_filter(
                list_transform(
                  range(1, least({maxlen}, length(word) - pos + 1) + 1),
                  c_l -> {{'l': c_l, 'id': {keyed}}}),
                c -> c['id'] IS NOT NULL))[1] AS pick
            FROM sg WHERE pos <= length(word)
          )
        ),
        seg AS (SELECT word, ids FROM sg WHERE pos > length(word)),
        agg AS (SELECT w.doc_id, flatten(list(seg.ids ORDER BY w.wi)) AS tid
                FROM w JOIN seg USING (word) GROUP BY w.doc_id)
        SELECT d.doc_id,
               CAST(NULL AS BIGINT) AS chunk_id,
               CAST(COALESCE(len(a.tid), 0) AS BIGINT) AS n_tokens,
               md5(COALESCE(array_to_string(a.tid, ','), '')) AS chunk_md5
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


def _wordpiece_bytes_oracle_sql() -> str:
    """Byte-mode WordPiece replay for the 'wpb' gate variant: the
    derived fixture text is the ascii word stream with three vowels
    substituted to umlauts (every word NON-ASCII), and the byte-level
    word is reached in SQL by replacing each umlaut's source vowel with
    its 2-char byte-alphabet expansion (_WPB_SUBS — the substitution
    composes with the GPT-2 byte mapping into one ascii->bytes replace
    per vowel). Segmentation then reuses the exact recursive
    longest-match CTE of :func:`_wordpiece_oracle_sql` over the
    byte-mode fixture vocab."""
    expr = "wds[u.i]"
    for a, _, bsym in _WPB_SUBS:
        expr = f"replace({expr}, '{a}', '{bsym}')"
    return _wordpiece_oracle_sql(
        vocab=_wordpiece_bytes_fixture_vocab(), word_expr=expr
    )


def _unigram_oracle_sql() -> str:
    """Independent DuckDB replay of ``unigram_encode_ids``
    (operators/unigram.py viterbi_segment): the Viterbi DP as a
    RECURSIVE CTE over character positions — best[j] carried as a
    per-word list, each step picking argmax(best[i] + logp(piece)) with
    the engine's exact tie rule (equal scores -> later split point, via
    struct sort on (score DESC, i DESC)), unknown single chars at the
    engine's floor score, then a second recursive CTE backtracking the
    split points into vocab ids. Scores are repr-round-trip doubles and
    every DP add is the same single IEEE op both sides, so the replay
    is bit-exact, not approximate. Segments DISTINCT words once (the
    Zipf amortization proven for the BPE oracle at the sf1 rehearsal),
    then flattens per doc in word order. Output shape matches the
    'unigram' variant of the ``doc_chunks`` gate: per-doc token count +
    md5 of the comma-joined id sequence."""
    from spatialpandas_spark.operators.unigram import unigram_vocab_ids

    logp = _unigram_fixture_table()
    floor = min(logp.values()) - 10.0
    vocab = unigram_vocab_ids(logp)
    ml = _UNIGRAM_MAX_PIECE

    def esc(s: str) -> str:
        return s.replace("'", "''")

    lp_case = (
        "CASE __p "
        + " ".join(
            f"WHEN '{esc(p)}' THEN {lp!r}" for p, lp in sorted(logp.items())
        )
        + " END"
    )
    id_case = (
        "CASE __p "
        + " ".join(f"WHEN '{esc(p)}' THEN {i}" for p, i in vocab.items())
        + " ELSE 0 END"
    )
    lp_piece = lp_case.replace("__p", "substr(word, i + 1, j + 1 - i)")
    id_piece = id_case.replace(
        "__p", "substr(word, back[j + 1] + 1, j - back[j + 1])"
    )
    return f"""
        WITH RECURSIVE
        w AS (
          SELECT doc_id, u.i AS wi, wds[u.i] AS word
          FROM (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x != '') AS wds
                FROM documents) d,
               UNNEST(range(1, len(wds) + 1)) AS u(i)
        ),
        dw AS (SELECT DISTINCT word FROM w),
        dp AS (
          SELECT word, 0 AS j, [CAST(0.0 AS DOUBLE)] AS best, [0] AS back
          FROM dw
          UNION ALL
          SELECT word, j + 1,
                 list_append(best, pick['s']),
                 list_append(back, pick['i'])
          FROM (
            SELECT word, j, best, back,
              list_reverse_sort(list_filter(
                list_transform(range(greatest(0, j + 1 - {ml}), j + 1),
                  i -> {{'s': best[i + 1] + COALESCE(
                           {lp_piece},
                           CASE WHEN j + 1 - i = 1 THEN {floor!r} END),
                        'i': i}}),
                c -> c['s'] IS NOT NULL))[1] AS pick
            FROM dp WHERE j < length(word)
          )
        ),
        bt AS (
          SELECT word, back, length(word) AS j, CAST([] AS INTEGER[]) AS ids
          FROM dp WHERE j = length(word)
          UNION ALL
          SELECT word, back, back[j + 1] AS j,
                 list_prepend({id_piece}, ids)
          FROM bt WHERE j > 0
        ),
        seg AS (SELECT word, ids FROM bt WHERE j = 0),
        agg AS (SELECT w.doc_id, flatten(list(seg.ids ORDER BY w.wi)) AS tid
                FROM w JOIN seg USING (word) GROUP BY w.doc_id)
        SELECT d.doc_id,
               CAST(NULL AS BIGINT) AS chunk_id,
               CAST(COALESCE(len(a.tid), 0) AS BIGINT) AS n_tokens,
               md5(COALESCE(array_to_string(a.tid, ','), '')) AS chunk_md5
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


def _mseq_oracle_sql(seq_len: int = 128) -> str:
    """Standalone replay of ``materialize_token_sequences`` over the BPE
    id replay (``_bpe_ids_ctes``): per-doc exclusive running sum in
    doc_id order, one list_slice per overlapped sequence, flatten in
    stream order — the ``training_sequences`` gate oracle (promoted
    from the shard_pack union in round 7)."""
    L = int(seq_len)
    return f"""
        WITH {_bpe_ids_ctes()},
        b AS (SELECT d.doc_id, COALESCE(a.tid, []) AS tid
              FROM documents d LEFT JOIN agg a USING (doc_id)),
        brs AS (SELECT doc_id, tid, len(tid) AS bw,
                SUM(len(tid)) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS bs
                FROM b),
        sl AS (SELECT u.q AS seq_id, brs.doc_id,
                 list_slice(tid,
                   CAST(greatest(bs - bw, u.q * {L})
                        - (bs - bw) + 1 AS BIGINT),
                   CAST(least(bs, (u.q + 1) * {L})
                        - (bs - bw) AS BIGINT)) AS part
               FROM brs,
                    UNNEST(range(CAST((bs - bw) // {L} AS BIGINT),
                                 CAST((bs - 1) // {L} + 1 AS BIGINT)))
                      AS u(q)
               WHERE bw > 0),
        ms AS (SELECT seq_id,
                      flatten(list(part ORDER BY doc_id)) AS ids
               FROM sl GROUP BY seq_id)
        SELECT CAST(seq_id AS BIGINT) AS seq_id,
               CAST(len(ids) AS BIGINT) AS n_tokens,
               md5(array_to_string(ids, ',')) AS ids_md5
        FROM ms
    """


def _training_mix_oracle_sql() -> str:
    """Replay of the whole ``training_mix`` recipe in SQL, stage by
    stage (see q_training_mix):

    1. T=1/2 temperature weights in integer millis — the single double
       division of exact integers is bit-identical to the Python side
       (same IEEE op, same operands; no pow());
    2. mix_sources epochs: UNNEST(range(full)) replication + the
       md5-threshold fractional epoch with mix_sources' exact
       'source#full#key' hash input and thr = (millis % 1000) * 1000
       (exactly int(round(frac * 1e6)) for 3-decimal weights);
    3. the shuffle order key rebuilt character-for-character
       (zero-padded 60-bit hash # source # epoch # zero-padded doc_id);
    4. running sum over that key + list_slice sequence assembly — the
       same CTE shape as ``_mseq_oracle_sql``."""
    seed, L = _MIX_SEED, _MIX_SEQ_LEN

    def mdhash(s: str) -> str:
        return f"('0x' || substr(md5({s}), 1, 15))::BIGINT"

    frac_branch = (
        lambda src, w, langcond: f"""
          SELECT d.doc_id, '{src}' AS source,
                 CAST({w} // 1000 AS INT) AS epoch
          FROM documents d, wm
          WHERE {langcond} AND {w} % 1000 > 0
            AND {mdhash(f"'{seed}:{src}#' || CAST({w} // 1000 AS VARCHAR)"
                        f" || '#' || CAST(d.doc_id AS VARCHAR)")}
                % 1000000 < {w} % 1000 * 1000"""
    )
    return f"""
        WITH {_bpe_ids_ctes()},
        cnt AS (SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                            AS BIGINT) AS ne,
                       CAST(SUM(CASE WHEN lang != 'en' THEN 1 ELSE 0 END)
                            AS BIGINT) AS nr
                FROM documents),
        wm AS (SELECT CAST(FLOOR((ne + nr) * ne / (ne*ne + nr*nr) * 1000
                                 + 0.5) AS BIGINT) AS wen,
                      CAST(FLOOR((ne + nr) * nr / (ne*ne + nr*nr) * 1000
                                 + 0.5) AS BIGINT) AS wrt
               FROM cnt),
        mx AS (
          SELECT d.doc_id, 'en' AS source, CAST(u.e AS INT) AS epoch
          FROM documents d, wm, UNNEST(range(wm.wen // 1000)) AS u(e)
          WHERE d.lang = 'en'
          UNION ALL
          {frac_branch("en", "wm.wen", "d.lang = 'en'")}
          UNION ALL
          SELECT d.doc_id, 'rest', CAST(u.e AS INT)
          FROM documents d, wm, UNNEST(range(wm.wrt // 1000)) AS u(e)
          WHERE d.lang != 'en'
          UNION ALL
          {frac_branch("rest", "wm.wrt", "d.lang != 'en'")}
        ),
        ok AS (
          SELECT lpad(CAST({mdhash(f"'{seed}:' || source || '#' "
                                   f"|| CAST(epoch AS VARCHAR) || '#' "
                                   f"|| CAST(doc_id AS VARCHAR)")}
                           AS VARCHAR), 19, '0')
                 || '#' || source || '#' || CAST(epoch AS VARCHAR)
                 || '#' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS k,
                 doc_id
          FROM mx
        ),
        bt AS (SELECT ok.k, a.tid, len(a.tid) AS bw
               FROM ok JOIN agg a USING (doc_id)),
        brs AS (SELECT k, tid, bw,
                SUM(bw) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS bs
                FROM bt),
        sl AS (SELECT u.q AS seq_id, brs.k,
                 list_slice(tid,
                   CAST(greatest(bs - bw, u.q * {L})
                        - (bs - bw) + 1 AS BIGINT),
                   CAST(least(bs, (u.q + 1) * {L})
                        - (bs - bw) AS BIGINT)) AS part
               FROM brs,
                    UNNEST(range(CAST((bs - bw) // {L} AS BIGINT),
                                 CAST((bs - 1) // {L} + 1 AS BIGINT)))
                      AS u(q)
               WHERE bw > 0),
        ms AS (SELECT seq_id, flatten(list(part ORDER BY k)) AS ids
               FROM sl GROUP BY seq_id)
        SELECT CAST(seq_id AS BIGINT) AS seq_id,
               CAST(len(ids) AS BIGINT) AS n_tokens,
               md5(array_to_string(ids, ',')) AS ids_md5
        FROM ms
    """


def q_doc_chunks(spark, sf_dir):
    """Merged chunking + tokenizer gate, tagged union:

    - 'chunk': sliding-window document chunking (size 32, stride 24),
      every chunk row with its token count and the md5 of its exact
      text  [operators/chunk.py chunk_documents — tests/test_chunk.py];
    - 'bpe': ``bpe_encode_ids`` (operators/bpe.py) over every document
      with the fixture-trained merge list — per-doc token count and the
      md5 of the full comma-joined token-id sequence, so the gate hash
      covers every token id the Arrow segmenter emits
      [operators/bpe.py bpe_encode_ids — tests/test_bpe.py];
    - 'wp' (round 8): ``wordpiece_encode_ids`` with the fixture-trained
      vocab (_wordpiece_fixture_vocab) — same per-doc count + full-id-
      sequence md5 shape, so the hash covers every id the greedy
      longest-match segmenter emits; oracle is the recursive-CTE
      longest-match replay (_wordpiece_oracle_sql)
      [operators/wordpiece.py — tests/test_wordpiece.py];
    - 'wpb' (round 9): ``wordpiece_encode_ids(mode='bytes')`` over a
      NON-ASCII derived slice — the document word stream with three
      vowels substituted to umlauts (F.translate), so every word runs
      the GPT-2 byte pre-tokenizer + byte-alphabet segmentation; vocab
      byte-mode fixture-trained (_wordpiece_bytes_fixture_vocab);
      oracle replays the ascii->byte-symbol substitution + the same
      recursive longest-match CTE (_wordpiece_bytes_oracle_sql)
      [operators/wordpiece.py mode='bytes' — tests/test_wordpiece.py
      byte battery];
    The 'unigram' variant was promoted to its own ``unigram_encode``
    gate in round 7 (densest-union split) so a Viterbi-segmenter
    regression reads as its own red row."""
    from spatialpandas_spark.operators.bpe import bpe_encode_ids, word_tokens
    from spatialpandas_spark.operators.chunk import chunk_documents
    from spatialpandas_spark.operators.wordpiece import wordpiece_encode_ids

    d = _t(spark, sf_dir, "documents")
    ch = chunk_documents(d, size=32, stride=24)
    chunks = ch.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )
    enc = bpe_encode_ids(d, _bpe_fixture_merges())
    bpe = enc.select(
        "doc_id",
        F.lit(None).cast("long").alias("chunk_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(F.col("token_ids"), lambda x: x.cast("string")),
                ",",
            )
        ).alias("chunk_md5"),
    )
    wp = wordpiece_encode_ids(d, _wordpiece_fixture_vocab()).select(
        "doc_id",
        F.lit(None).cast("long").alias("chunk_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(F.col("token_ids"), lambda x: x.cast("string")),
                ",",
            )
        ).alias("chunk_md5"),
    )
    src, dst = (
        "".join(a for a, _, _ in _WPB_SUBS),
        "".join(u for _, u, _ in _WPB_SUBS),
    )
    dn = d.select(
        "doc_id",
        F.translate(
            F.concat_ws(" ", word_tokens("text")), src, dst
        ).alias("text"),
    )
    wpb = wordpiece_encode_ids(
        dn, _wordpiece_bytes_fixture_vocab(), mode="bytes"
    ).select(
        "doc_id",
        F.lit(None).cast("long").alias("chunk_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(F.col("token_ids"), lambda x: x.cast("string")),
                ",",
            )
        ).alias("chunk_md5"),
    )
    return (
        _variant(chunks, "chunk")
        .unionByName(_variant(bpe, "bpe"))
        .unionByName(_variant(wp, "wp"))
        .unionByName(_variant(wpb, "wpb"))
    )


def q_unigram_encode(spark, sf_dir):
    """Unigram-LM (SentencePiece-style) tokenizer gate — promoted from
    the ``doc_chunks`` union in round 7: ``unigram_encode_ids`` with the
    fixture-trained piece table (_unigram_fixture_table) over every
    document; per-doc token count + md5 of the full comma-joined id
    sequence, so the hash covers every piece id the Viterbi segmenter
    emits, checked against the recursive-CTE DP replay in
    _unigram_oracle_sql (bit-exact scores, engine tie rule)
    [operators/unigram.py viterbi_segment/unigram_encode_ids —
    tests/test_unigram.py]."""
    from spatialpandas_spark.operators.unigram import unigram_encode_ids

    d = _t(spark, sf_dir, "documents")
    return unigram_encode_ids(
        d, _unigram_fixture_table(), max_piece_len=_UNIGRAM_MAX_PIECE
    ).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(F.col("token_ids"), lambda x: x.cast("string")),
                ",",
            )
        ).alias("ids_md5"),
    )


def q_span_dedup(spark, sf_dir):
    """Corpus-level duplicate span removal (exact-substring dedup,
    C4/Lee-et-al-style), tagged union of both alignment modes:

    - 'fixed': non-overlapping 8-token windows (position-defined);
    - 'content': content-defined spans of expected length 8 (token-hash
      boundaries — catches repeats at ANY document offset, the r10
      verdict's window-straddling fix; operators/spans.py
      content_spans, tests/test_spans.py off-by-one battery);
    - 'guarded' (r12): content alignment with min_span_tokens=3 — the
      Lee et al. minimum-match-length guard; spans under 3 tokens are
      never hashed into the flagged set (tests/test_spans.py guard
      battery plants a repeated 1-token complete span).

    Drop every span occurring twice or more anywhere in the corpus,
    reassemble surviving text; checked span-for-span against a DuckDB
    twin (window prefix-sum replay for 'content'/'guarded', plus a
    token-length floor on the counting CTE for 'guarded'; md5 of the
    exact result text)."""
    from spatialpandas_spark.operators.spans import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents")

    def one(align, variant=None, min_span_tokens=1):
        out = remove_duplicate_spans(
            d, window=8, min_count=2, keep="none", align=align,
            min_span_tokens=min_span_tokens,
        )
        return out.select(
            F.lit(variant or align).alias("variant"),
            "doc_id",
            F.col("kept_spans").cast("long").alias("kept_spans"),
            F.md5(F.col("text")).alias("text_md5"),
        )

    return (
        one("fixed")
        .unionAll(one("content"))
        .unionAll(one("content", "guarded", min_span_tokens=3))
    )


def q_events_json(spark, sf_dir):
    """Merged JSON-extraction + PageRank gate, tagged union:

    - 'json': parse the props JSON payload JVM-side (get_json_object,
      no Python) and aggregate the extracted metric per event type
      [operators/.. events surface — tests/test_events_json.py];
    - 'pr': 5-iteration damped PageRank (operators/graph.py — join-based
      power iteration with dangling-mass redistribution) over the
      user -> props.k interaction graph derived from the same events
      (dst offset by 1e7 so the bipartite sides never collide). The
      oracle replays the identical join algebra as 5 chained CTEs;
      ranks rounded to 9 places (values O(1/n); cross-engine sum-order
      noise is ~1e-19, far below the rounding grain)
      [operators/graph.py pagerank — tests/test_graph.py];
    - 'linkpr': the crawl link-graph chain END TO END — closed-form
      HTML pages synthesized JVM-side per document (absolute, UPPERCASE
      -scheme, protocol-relative, relative-to-self, in-script, and
      external-sink hrefs), parsed by the REAL extractor
      (extract_links_from_html), host-resolved + self-edge-dropped
      (host_link_edges), then ranked by the same 5-iter PageRank. The
      sink host has no out-links, so the dangling-mass path runs on a
      real link graph; the oracle recomputes the edge set from the
      same doc_id formulas (the crawl gate's synthesize-in-engine
      trick) and replays the rank algebra
      [operators/html.py extract_links_from_html/host_link_edges +
      operators/graph.py pagerank — tests/test_html.py,
      tests/test_graph.py].

    Columns: (variant, k, n, sum_k, val)."""
    from spatialpandas_spark.operators.graph import pagerank
    from spatialpandas_spark.operators.html import host_link_edges

    e = _events(spark, sf_dir)
    kx = F.get_json_object(F.col("props"), "$.k").cast("long")
    js = (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(kx).cast("long").alias("sum_k"),
            F.round(F.avg(kx), 6).alias("val"),
        )
        .select(
            F.lit("json").alias("variant"),
            F.col("event_type").alias("k"),
            "n",
            "sum_k",
            "val",
        )
    )
    edges = e.select(
        F.col("user_id").cast("long").alias("src"),
        (kx + F.lit(10_000_000)).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    pr = pagerank(edges, iters=5, damping=0.85).select(
        F.lit("pr").alias("variant"),
        F.col("node").cast("string").alias("k"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("long").alias("sum_k"),
        F.round(F.col("rank"), 9).alias("val"),
    )

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")

    def host(expr):
        return F.concat(F.lit("h"), expr.cast("string"), F.lit(".test"))

    html = F.concat(
        F.lit('<html><head><title>P</title><script>var x = \'<a href="'
              'http://skip'),
        (did % 7).cast("string"),
        F.lit('.test/no">s</a>\';</script></head><body><p>doc</p>'
              '<a href="http://'),
        host((did * 3 + 1) % 7),
        F.lit('/x">a</a><A HREF="HTTPS://H'),
        ((did * 5 + 2) % 7).cast("string"),
        F.lit('.TEST/Y">b</A><a href="//'),
        host((did + 1) % 7),
        F.lit('/pp">c</a><a href="/relative">d</a>'
              '<a href="http://sink.test/z">e</a></body></html>'),
    )
    pages = d.select(
        F.concat(
            F.lit("http://"), host(did % 7), F.lit("/p"), did.cast("string")
        ).alias("url"),
        html.alias("html"),
    )
    linkpr = pagerank(host_link_edges(pages), iters=5, damping=0.85).select(
        F.lit("linkpr").alias("variant"),
        F.col("node").alias("k"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("long").alias("sum_k"),
        F.round(F.col("rank"), 9).alias("val"),
    )
    return js.unionByName(pr).unionByName(linkpr)


def q_unigram_quality(spark, sf_dir):
    """CCNet-style LM quality proxy: fit a unigram model on the corpus
    (one groupBy(token) pass), score every document by mean token
    log-probability (token-keyed join + per-doc agg)."""
    from spatialpandas_spark.operators.lm import unigram_fit, unigram_logprob

    d = _t(spark, sf_dir, "documents")
    sc = unigram_logprob(d, unigram_fit(d))
    return sc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.round("avg_logp", 6), F.lit(0.0)).alias("avg_logp"),
    )


def q_event_funnel(spark, sf_dir):
    """Conversion funnel over the event stream: per user, the first
    'view' and the first 'click' at-or-after it, plus a 1-day conversion
    flag. One window keyed by user + one groupBy(user) — no global
    state, scales with the user-key shuffle."""
    from pyspark.sql.window import Window

    e = _events(spark, sf_dir).withColumn("us", F.unix_micros(F.col("ts")))
    fv = F.min(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(Window.partitionBy("user_id"))
    e2 = e.withColumn("__fv", fv)
    agg = e2.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
            "__view"
        ),
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") >= F.col("__fv")),
                F.col("us"),
            )
        ).alias("__click"),
    )
    return agg.select(
        "user_id",
        F.coalesce(F.col("__view"), F.lit(-1)).cast("long").alias("first_view_us"),
        F.coalesce(F.col("__click"), F.lit(-1)).cast("long").alias("first_click_us"),
        F.when(
            F.col("__click").isNotNull()
            & (F.col("__click") - F.col("__view") <= 86400 * 1_000_000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("converted_1d"),
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5-ish local-supplier revenue: six-table join with broadcast
    dims (region/nation/supplier), time-range filter pushed to the scan,
    hash agg by nation."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q_lang_id(spark, sf_dir):
    """Heuristic stopword language-ID over documents."""
    from spatialpandas_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def q_quality_score(spark, sf_dir):
    """Composite document quality score."""
    from spatialpandas_spark.operators.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality")
    )


def q_corpus_pipeline(spark, sf_dir):
    """Composite training-data pipeline: exact-dedup the corpus, keep
    quality >= 0.4, report per-language document counts and mean quality —
    the end-to-end shape of a pretraining data-prep job."""
    from spatialpandas_spark.operators.dedup import dedup_exact
    from spatialpandas_spark.operators.text import lang_id, quality_score

    d = _t(spark, sf_dir, "documents")
    deduped = dedup_exact(d, ["text"], "doc_id")
    scored = deduped.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text")).alias("q"),
    ).filter(F.col("q") >= 0.4)
    return scored.groupBy("lang_pred").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
    )


def q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup candidate pairs. Signatures use a 60-bit
    md5-prefix base hash + seeded multiply-shift family, so the DuckDB
    oracle reproduces the exact signatures, band collisions, and
    estimated-Jaccard filter in SQL; pytest additionally verifies against
    a brute-force Jaccard oracle."""
    from spatialpandas_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5
    ).select("id_a", "id_b")


def q_jaccard_verify(spark, sf_dir):
    """Exact n-gram Jaccard over LSH-pruned candidates (the batch verify
    stage after MinHash blocking). Oracle recomputes candidates from the
    same signature math and the exact |A∩B|/|A∪B| by set joins."""
    from spatialpandas_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5
    )
    return out.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


#: sjoin_nearest gate cutoff: small enough that some customers have no
#: supplier within reach at the driver SFs (exercising the left-join
#: null path), large enough that most match.
_NEAREST_CUT = 5.0


def _knn_gate_frames(spark, sf_dir):
    from spatialpandas_spark import st_point

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("lid"),
        st_point(
            (F.col("c_custkey") % 97).cast("double"),
            (F.col("c_nationkey") * 4).cast("double"),
        ).alias("geom"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("rid"),
        st_point(
            (F.col("s_suppkey") * 7 % 90).cast("double"),
            (F.col("s_nationkey") * 3 % 80).cast("double"),
        ).alias("geom"),
    )
    return cust, supp


def q_knn_join(spark, sf_dir):
    """Merged nearest-neighbor join gate, tagged union (d is the
    distance column — SQUARED for 'knn' rows, euclidean for 'nearest'
    rows, both bit-exact cross-engine since sqrt is correctly rounded):

    - 'knn': exact kNN spatial join (customers' points to their 3
      nearest supplier points) via the level-doubling grid search;
      oracle is the brute-force window over the cross product — exact
      agreement, squared distances included
      [operators/knn.py sjoin_knn — tests/test_knn.py];
    - 'nearest': ``sjoin_nearest`` (geopandas surface, k=1 wrapper)
      with max_distance=_NEAREST_CUT and how='left' — matched rows
      carry euclidean dist, out-of-reach customers survive with null
      rid/d (the left-join contract); ties break to smallest rid
      [operators/knn.py sjoin_nearest — tests/test_knn.py
      test_sjoin_nearest_*];
    - 'dwithin': ``sjoin_dwithin`` distance join — ALL pairs within
      _NEAREST_CUT, each exactly once, squared distances (one hash
      equi-join, report-once by construction)
      [operators/knn.py sjoin_dwithin — tests/test_knn.py
      test_sjoin_dwithin_*]."""
    from spatialpandas_spark.operators.knn import (
        sjoin_dwithin,
        sjoin_knn,
        sjoin_nearest,
    )

    cust, supp = _knn_gate_frames(spark, sf_dir)
    knn = sjoin_knn(cust, supp, k=3, cell_size=8.0).select(
        "lid",
        "rid",
        F.col("dist2").alias("d"),
        F.col("rank").cast("long").alias("rank"),
    )
    near = sjoin_nearest(
        cust, supp, max_distance=_NEAREST_CUT, how="left", cell_size=8.0
    ).select(
        "lid",
        "rid",
        F.col("dist").alias("d"),
        F.lit(None).cast("long").alias("rank"),
    )
    dwithin = sjoin_dwithin(cust, supp, _NEAREST_CUT).select(
        "lid",
        "rid",
        F.col("dist2").alias("d"),
        F.lit(None).cast("long").alias("rank"),
    )
    return (
        _variant(knn, "knn")
        .unionByName(_variant(near, "nearest"))
        .unionByName(_variant(dwithin, "dwithin"))
    )


def q_interval_join(spark, sf_dir):
    """1-D bucket-equi-join range join: event values against overlapping
    nation-derived score bands; per-band event count + value sum. The
    bucket plan shuffles on bucket ids (a point meets a band in exactly
    one bucket — no dedup pass); oracle is the plain inequality join."""
    from spatialpandas_spark.operators.interval import interval_join

    ev = _events(spark, sf_dir).select("event_id", "value")
    bands = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 17.0).alias("lo"),
        (F.col("n_nationkey") * 17.0 + 40.0).alias("hi"),
    )
    j = interval_join(ev, bands, "value", "lo", "hi", bucket_width=40.0)
    return j.groupBy("band_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_scrub_normalize(spark, sf_dir):
    """Merged text-hygiene gate, tagged union. Variant breadcrumbs:
    'scrub' -> operators/text.py scrub_pii/normalize_text
    (tests/test_scrub.py); 'hosts' -> operators/text.py
    host_counts (tests/test_scrub.py); 'crawl' ->
    sources/archives.py warc_records + operators/html.py
    extract_text_from_html (tests/test_archives.py,
    tests/test_html.py).

    'scrub': synthetic contact lines (email, URL, IP, phone derived
    from doc_id) are appended to each document, scrubbed to
    placeholder tokens, then normalized; output is the md5 of the
    result so the oracle verifies the exact transformed string. All
    regexes stay in the RE2-compatible subset so Java and RE2
    agree."""
    from spatialpandas_spark.operators.text import normalize_text, scrub_pii

    d = _t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" Contact: user"), F.col("doc_id").cast("string"),
        F.lit("@example.com  see https://site"), F.col("doc_id").cast("string"),
        F.lit(".org/a?b=1 at 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or +1 555-000-"), (F.col("doc_id") % 10000).cast("string"),
    )
    out = d.select(
        "doc_id", F.md5(normalize_text(scrub_pii(dirty))).alias("h")
    )

    # --- merged variant: URL/domain accounting. Each doc gets two URLs
    # for its source host (n_refs = 2 x n_docs) and one for a
    # doc_id%7-keyed host; host_counts must recover the closed-form
    # counts through the real regexp-extract + parse_url path. The
    # fixture text itself contains zero URLs (checked both SFs), so the
    # synthesized ones are the complete population.
    from spatialpandas_spark.operators.text import host_counts

    url1 = F.concat(
        F.lit("https://"), F.lower("source"), F.lit(".example.com/a?b=1")
    )
    url2 = F.concat(
        F.lit("http://"), F.lower("source"), F.lit(".example.com/other")
    )
    url3 = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 7).cast("string"), F.lit(".test/x")
    )
    linked = d.select(
        "doc_id",
        F.concat_ws(" ", F.col("text"), url1, url2, url3).alias("text"),
    )
    hosts = host_counts(linked).select(
        F.lit("hosts").alias("variant"),
        F.col("host").alias("k"),
        F.lit(None).cast("string").alias("h"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_refs").cast("long").alias("n_refs"),
    )
    scrub = out.select(
        F.lit("scrub").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("h"),
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("n_refs"),
    )

    # --- merged variant: the crawl ingestion chain, end to end. Every
    # doc_id % 5 == 0 document is wrapped in a closed-form HTML template
    # (entity-escaped), enclosed in a spec-layout WARC response record
    # (HTTP envelope + byte-exact Content-Length), and the records are
    # concatenated into 4 multi-record archives — all with Catalyst
    # expressions, the same synthesize-in-engine trick as the WAV gate.
    # The REAL parsers then run: warc_records (sources/archives.py) ->
    # extract_text_from_html (operators/html.py); the oracle replays the
    # template's closed-form expectation (title 'Doc N'; text = the
    # original text's lines whitespace-collapsed, entity round-trip is
    # the identity). h = md5(title | text) pins both extractions;
    # n_docs carries the parsed http_status (envelope check).
    from spatialpandas_spark.operators.html import extract_text_from_html
    from spatialpandas_spark.sources.archives import (
        synth_warc_archives,
        warc_records,
    )

    sel = d.filter(F.col("doc_id") % 5 == 0)
    archives = synth_warc_archives(sel, n_archives=4)
    parsed = warc_records(archives).select(
        F.regexp_extract(F.col("url"), r"http://t/(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("http_status").cast("long").alias("status"),
        F.col("body").alias("html"),
    )
    texts = extract_text_from_html(parsed, html_col="html")
    crawl = texts.join(parsed.select("doc_id", "status"), "doc_id").select(
        F.lit("crawl").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.md5(
            F.concat_ws("|", F.col("title"), F.col("text"))
        ).alias("h"),
        F.col("status").alias("n_docs"),
        F.lit(None).cast("long").alias("n_refs"),
    )
    return scrub.unionByName(hosts).unionByName(crawl)


def q_length_filter(spark, sf_dir):
    """Per-language percentile gating: keep documents at or above their
    language's 25th-percentile BPE token count (drop the short tail).
    Two-stage plan — tiny per-group percentile table broadcast back; the
    corpus never shuffles. Exact interpolated percentile on integer token
    counts so DuckDB's quantile_cont reproduces it bit-for-bit."""
    from spatialpandas_spark.operators.quantiles import (
        filter_by_group_percentile,
    )
    from spatialpandas_spark.operators.text import bpe_token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", bpe_token_count(F.col("text")).cast("long").alias("w")
    )
    out = filter_by_group_percentile(d, "w", "lang", 0.25, approx=False)
    # + per-source domain cap (merged gate): LEFT join the cap rank so
    # docs beyond their source's 20-row cap carry a null — the oracle
    # replays ROW_NUMBER over the same md5-prefix hash order
    from spatialpandas_spark.operators.sampling import cap_per_group

    capped = cap_per_group(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        "source",
        20,
        key_col="doc_id",
        rank_col="cap_rank",
    ).select("doc_id", F.col("cap_rank").cast("long").alias("cap_rank"))
    return out.select("doc_id", "lang", "w").join(capped, "doc_id", "left")


_BM25_QUERY = "data pipeline quality model training"


def q_top_terms(spark, sf_dir):
    """Merged vocabulary + retrieval gate, tagged union:

    - 'terms': top-50 corpus terms by total frequency with document
      frequency (TakeOrderedAndProject — per-partition heaps, no global
      sort);
    - 'bm25': Okapi BM25 scores for a fixed query over EVERY matching
      document (no top-k cut — a LIMIT boundary could flip on sub-ulp
      cross-engine float ordering; scoring all matches keeps the gate
      order-free, the driver sorts by value before hashing). Scores
      rounded to 6 places for cross-engine float safety, per the
      tpch-gate convention.

    Breadcrumbs: 'terms' -> operators/text.py top_terms
    (tests/test_search.py); 'bm25' -> operators/search.py bm25_score_all
    (tests/test_search.py)."""
    from spatialpandas_spark.operators.search import (
        bm25_score_all,
        build_postings,
        corpus_stats,
        doc_lengths,
    )
    from spatialpandas_spark.operators.text import top_terms

    docs = _t(spark, sf_dir, "documents")
    terms = top_terms(docs, k=50).select(
        F.lit("terms").alias("variant"),
        F.col("term").alias("k"),
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.lit(None).cast("double").alias("score"),
    )
    postings = build_postings(docs)
    stats = corpus_stats(postings, doc_lengths(docs))
    bm = bm25_score_all(postings, stats, _BM25_QUERY).select(
        F.lit("bm25").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.lit(None).cast("long").alias("tf"),
        F.lit(None).cast("long").alias("df"),
        F.round(F.col("score"), 6).alias("score"),
    )
    return terms.unionByName(bm)


def q_events_asof(spark, sf_dir):
    """As-of join: each click event matched to the user's most recent
    at-or-before view event (union-window shape, keyed by user — no
    cross product, no single-task stage). Oracle is DuckDB's native
    ASOF LEFT JOIN."""
    from spatialpandas_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = asof_join(clicks, views, on="ts", by="user_id")
    return out.select(
        "event_id",
        "user_id",
        F.col("view_id").cast("long").alias("view_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r"))).alias(
            "gap_us"
        ),
    )


#: PPS gate lattice step over the n_chars weight line (off-round prime;
#: selects ~1/3 of sf0.01's ~500 docs at their ~600-char average)
_PPS_STEP = 991


def _pps_offset() -> int:
    """The operator's deterministic default offset for seed=42 —
    recomputed here so the SQL oracle inlines the identical lattice."""
    import hashlib

    return int(hashlib.md5(b"42:pps").hexdigest()[:15], 16) % _PPS_STEP


def q_stratified_sample(spark, sf_dir):
    """Merged deterministic-sampling + source-mixing + PPS gate, tagged
    union ('pps' rows: rnk = lattice-hit multiplicity; see inline
    breadcrumb):

    - 'sample': language-balanced hash-mod sampling (downsample dominant
      en, keep low-resource langs) + the deterministic shuffle rank as a
      VALUE column, so the driver's order-insensitive hash still
      verifies the ordering;
    - 'mix': ``mix_sources`` (operators/ordering.py) — the pretraining
      mixture recipe: 2.4 epochs of the en corpus (two full passes + a
      40% hash-sampled epoch 2) blended with a 50% sample of everything
      else, every copy re-keyed per epoch, and the GLOBAL mix order
      exposed as a rank value column. The oracle replays epochs with
      UNNEST(range), the fractional epochs with the md5 threshold rule,
      and the order with ROW_NUMBER over the same hash.

    Columns: (variant, doc_id, grp, rnk) — grp is the language for
    'sample' rows and 'source#epoch' for 'mix' rows.

    Breadcrumbs: 'sample' -> operators/sampling.py stratified_sample
    (tests/test_sampling.py); 'mix' -> operators/ordering.py
    mix_sources (tests/test_ordering.py)."""
    from spatialpandas_spark.operators.ordering import (
        mix_sources,
        with_shuffle_rank,
    )
    from spatialpandas_spark.operators.sampling import (
        sample_hash,
        stratified_sample,
    )

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        d,
        "lang",
        {"en": 0.3, "fr": 1.0, "de": 1.0},
        key_col="doc_id",
        default_rate=0.5,
        seed=42,
    )
    ranked = with_shuffle_rank(out.select("doc_id", "lang"), "doc_id", seed=42)
    sample = ranked.select(
        F.lit("sample").alias("variant"),
        "doc_id",
        F.col("lang").alias("grp"),
        F.col("shuffle_rank").cast("long").alias("rnk"),
    )

    en = d.filter(F.col("lang") == "en").select("doc_id")
    rest = d.filter(F.col("lang") != "en").select("doc_id")
    mixed = mix_sources(
        {"en": en, "rest": rest},
        {"en": 2.4, "rest": 0.5},
        key_col="doc_id",
        seed=7,
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(
        sample_hash(
            F.concat_ws("#", F.col("source"), F.col("epoch"), F.col("doc_id")),
            7,
        ).asc(),
        F.col("source").asc(),
        F.col("epoch").asc(),
        F.col("doc_id").asc(),
    )
    mix = mixed.withColumn("rnk", F.row_number().over(w) - 1).select(
        F.lit("mix").alias("variant"),
        "doc_id",
        F.concat_ws("#", F.col("source"), F.col("epoch")).alias("grp"),
        F.col("rnk").cast("long").alias("rnk"),
    )

    # 'pps' (round 8): weight-proportional systematic sampling on the
    # n_chars weight line — exact integer lattice arithmetic, rnk = the
    # PPS multiplicity. Breadcrumbs: operators/sampling.py
    # systematic_sample (tests/test_sampling.py python twin).
    from spatialpandas_spark.operators.sampling import systematic_sample

    pps = systematic_sample(
        d.select("doc_id", "lang", "n_chars"),
        "n_chars",
        ["doc_id"],
        step=_PPS_STEP,
        seed=42,
    ).select(
        F.lit("pps").alias("variant"),
        "doc_id",
        F.col("lang").alias("grp"),
        F.col("n_hits").cast("long").alias("rnk"),
    )

    # 'split' (round 9): deterministic train/val/test assignment —
    # every doc exactly one label from disjoint exhaustive hash ranges
    # (80/10/10); grp = the label, rnk NULL. Breadcrumbs:
    # operators/sampling.py assign_splits (tests/test_sampling.py).
    from spatialpandas_spark.operators.sampling import assign_splits

    split = assign_splits(
        d.select("doc_id"),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=42,
    ).select(
        F.lit("split").alias("variant"),
        "doc_id",
        F.col("split").alias("grp"),
        F.lit(None).cast("long").alias("rnk"),
    )
    return (
        sample.unionByName(mix).unionByName(pps).unionByName(split)
    )


def q_shard_pack(spark, sf_dir):
    """Merged training-layout gate, tagged union over (k1, k2, v1, v2):

    - 'shard': token-budget shard packing — documents in doc_id order
      packed into 2000-BPE-token shards via the two-phase running sum
      (no global window); k1=shard, v1=doc count, v2=token total
      [operators/shards.py pack_shards/shard_summary —
      tests/test_shards.py];
    - 'seq': GPT-style concat-and-chunk sequence formation — every
      (doc, 512-token training sequence) overlap with its in-doc
      offset and slice length; k1=doc_id, k2=seq_id, v1=doc_offset,
      v2=n_tokens_in_seq [operators/shards.py pack_token_sequences —
      tests/test_shards.py test_pack_token_sequences_*];
    - 'nf' (round 7): NO-SPLIT next-fit document packing at budget 500,
      group_size 64 — one row per BIN with k1=grp, k2=global bin id,
      v1=doc count, v2=token total, h=md5 of the comma-joined doc ids
      in rank order, so the hash pins the exact doc→bin assignment.
      Oracle replays the sequential next-fit scan as a recursive CTE
      over in-group positions [operators/shards.py
      pack_documents_nextfit — tests/test_shards.py].

    'shard'/'seq' replay the same SQL running-sum window in the oracle.
    The 'mseq' materialized-rows variant was promoted to its own
    ``training_sequences`` gate in round 7 (densest-union split)."""
    from spatialpandas_spark.operators.shards import (
        pack_documents_nextfit,
        pack_token_sequences,
        shard_summary,
    )
    from spatialpandas_spark.operators.text import bpe_token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", bpe_token_count(F.col("text")).cast("long").alias("w")
    )
    shards = shard_summary(d, "w", ["doc_id"], budget=2000).select(
        F.col("shard").cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.col("n_rows").cast("long").alias("v1"),
        F.col("total_weight").cast("long").alias("v2"),
        F.lit(None).cast("string").alias("h"),
    )
    seqs = pack_token_sequences(d, "w", ["doc_id"], 512).select(
        F.col("doc_id").cast("long").alias("k1"),
        F.col("seq_id").cast("long").alias("k2"),
        F.col("doc_offset").cast("long").alias("v1"),
        F.col("n_tokens_in_seq").cast("long").alias("v2"),
        F.lit(None).cast("string").alias("h"),
    )
    def bin_rows(packed):
        return (
            packed.groupBy("grp", "bin")
            .agg(
                F.count("*").cast("long").alias("v1"),
                F.sum("w").cast("long").alias("v2"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("doc_id"))
                            ),
                            lambda s: s["doc_id"].cast("string"),
                        ),
                        ",",
                    )
                ).alias("h"),
            )
            .select(
                F.col("grp").cast("long").alias("k1"),
                F.col("bin").cast("long").alias("k2"),
                "v1",
                "v2",
                "h",
            )
        )

    nf = bin_rows(
        pack_documents_nextfit(d, "w", ["doc_id"], budget=500, group_size=64)
    )
    # 'ffd' (round 9): the first-fit-decreasing strategy — the
    # 0.997-fill layout users should actually pick (docs/SCALE.md) —
    # driver-verified against a recursive-CTE first-fit replay carrying
    # the per-group bin-fill list through the recursion
    ffd = bin_rows(
        pack_documents_nextfit(
            d, "w", ["doc_id"], budget=500, group_size=64, strategy="ffd"
        )
    )
    return (
        _variant(shards, "shard")
        .unionByName(_variant(seqs, "seq"))
        .unionByName(_variant(nf, "nf"))
        .unionByName(_variant(ffd, "ffd"))
    )


def _ids_md5(col=None):
    """md5 of a comma-joined int-array column — the token-id hash rule
    every training-row gate shares."""
    c = F.col("token_ids") if col is None else col
    return F.md5(
        F.array_join(F.transform(c, lambda x: x.cast("string")), ",")
    )


def q_training_sequences(spark, sf_dir):
    """Materialized GPT-style training rows — promoted from the
    ``shard_pack`` union in round 7: fixture-merge BPE ids through
    ``materialize_token_sequences`` at seq_len 128; one row per
    training sequence with its length and the md5 of the full
    comma-joined id list, so the gate hash covers EVERY token id of
    EVERY training row. Oracle replays the running-sum layout +
    list_slice assembly over the BPE id replay (_bpe_ids_ctes)
    [operators/shards.py materialize_token_sequences —
    tests/test_shards.py test_materialize_token_sequences_*]."""
    from spatialpandas_spark.operators.bpe import bpe_encode_ids
    from spatialpandas_spark.operators.shards import (
        materialize_token_sequences,
    )

    enc = bpe_encode_ids(
        _t(spark, sf_dir, "documents"), _bpe_fixture_merges()
    )
    return materialize_token_sequences(enc, 128).select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        _ids_md5().alias("ids_md5"),
    )


#: training_mix recipe constants (shared by the Spark gate and its oracle)
_MIX_SEED = 11
_MIX_SEQ_LEN = 256


def _t05_weights_millis(n_en: int, n_rest: int) -> dict[str, int]:
    """Temperature-sampling source weights at T=1/2, in integer millis.

    At T=1/2 the published recipe q_s ∝ p_s^(1/T) = p_s^2 collapses to
    the integer-exact closed form w_s = total * n_s / (n_en² + n_rest²)
    (w_s = budget·q_s/z/n_s with budget=total). Both factors are exact
    integers ≤ 2^53, so the single double division — and therefore the
    half-up millis quantization — is bit-identical in Python and DuckDB
    (no pow(), no multi-op float drift). tests/test_entry.py pins this
    against operators/ordering.py temperature_weights(temperature=0.5).
    """
    total, s2 = n_en + n_rest, n_en * n_en + n_rest * n_rest
    return {
        "en": math.floor(total * n_en / s2 * 1000 + 0.5),
        "rest": math.floor(total * n_rest / s2 * 1000 + 0.5),
    }


def q_training_mix(spark, sf_dir):
    """The full multi-epoch training-data layout, end-to-end in ONE gate
    (round-7 addition — the "sample sources → tokenize → pack →
    shuffle" recipe a real pretraining pipeline runs):

    1. temperature-derived source weights (T=1/2 integer-exact closed
       form, _t05_weights_millis — the en/rest split of ``documents``);
    2. ``mix_sources`` epochs: full passes + the md5-threshold
       fractional epoch, every copy re-keyed per epoch
       [operators/ordering.py mix_sources — tests/test_ordering.py];
    3. ``deterministic_shuffle`` semantics as the packing order: the
       global order key is (sample_hash(source#epoch#doc_id, seed),
       source, epoch, doc_id) — zero-padded into one sortable string
       [operators/ordering.py — same hash family, engine-replayable];
    4. fixture-merge BPE ids joined per mixed copy, then
       ``materialize_token_sequences`` at seq_len 256 cuts the shuffled
       multi-epoch token stream into training rows
       [operators/shards.py — tests/test_shards.py].

    Output: (seq_id, n_tokens, ids_md5) — the hash covers every token
    id of every training row ACROSS EPOCHS AND SOURCES, so a regression
    in any stage (weights, epoch replication, shuffle order, packing)
    flips the row hash. The oracle replays all four stages in SQL."""
    from spatialpandas_spark.operators.bpe import bpe_encode_ids
    from spatialpandas_spark.operators.ordering import mix_sources
    from spatialpandas_spark.operators.sampling import sample_hash
    from spatialpandas_spark.operators.shards import (
        materialize_token_sequences,
    )

    d = _t(spark, sf_dir, "documents")
    # one agg job for both source counts (was two filtered .count() jobs;
    # the conditional sums replicate the filters' null semantics exactly)
    cr = d.agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("en"),
        F.sum((F.col("lang") != "en").cast("long")).alias("rest"),
    ).first()
    n_en, n_rest = cr["en"] or 0, cr["rest"] or 0
    wm = _t05_weights_millis(n_en, n_rest)

    en = d.filter(F.col("lang") == "en").select("doc_id")
    rest = d.filter(F.col("lang") != "en").select("doc_id")
    mixed = mix_sources(
        {"en": en, "rest": rest},
        {s: m / 1000 for s, m in wm.items()},
        key_col="doc_id",
        seed=_MIX_SEED,
    )

    # deterministic_shuffle order as ONE sortable string key: zero-padded
    # 60-bit hash, then the tie chain (source, epoch, doc_id) — string
    # order == the shuffle's multi-column order, and the key doubles as
    # the unique doc key materialize_token_sequences slices/sorts by
    ord_key = F.concat_ws(
        "#",
        F.lpad(
            sample_hash(
                F.concat_ws(
                    "#", F.col("source"), F.col("epoch"), F.col("doc_id")
                ),
                _MIX_SEED,
            ).cast("string"),
            19,
            "0",
        ),
        F.col("source"),
        F.col("epoch").cast("string"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0"),
    )
    enc = bpe_encode_ids(d, _bpe_fixture_merges())
    toks = mixed.join(enc, "doc_id").select(
        ord_key.alias("k"), "token_ids", "n_tokens"
    )
    return materialize_token_sequences(
        toks, _MIX_SEQ_LEN, id_col="k"
    ).select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        _ids_md5().alias("ids_md5"),
    )


def q_curation_pipeline(spark, sf_dir):
    """End-to-end pretraining data prep, every stage oracle-checked in ONE
    SQL twin: scrub PII -> normalize -> exact dedup -> near-dup cluster
    dedup (MinHash-LSH + connected components, canonical survivor) ->
    per-language 25th-percentile token gate -> language-stratified
    deterministic sample -> 1000-token shard packing. Output is the shard
    manifest. The oracle chains the scrub regexes, a GROUP BY dedup, the
    exact signature math + recursive-CTE components, quantile_cont, the
    md5 sampling rule, and a running-sum window."""
    from spatialpandas_spark.operators.dedup import dedup_exact, dedup_near
    from spatialpandas_spark.operators.quantiles import (
        filter_by_group_percentile,
    )
    from spatialpandas_spark.operators.sampling import stratified_sample
    from spatialpandas_spark.operators.shards import shard_summary
    from spatialpandas_spark.operators.text import (
        bpe_token_count,
        normalize_text,
        scrub_pii,
    )

    d = _t(spark, sf_dir, "documents")
    clean = d.select(
        "doc_id", "lang", normalize_text(scrub_pii(F.col("text"))).alias("t")
    )
    exact = dedup_exact(clean, ["t"], "doc_id")
    near = dedup_near(exact, id_col="doc_id", text_col="t", threshold=0.5)
    tok = near.select(
        "doc_id", "lang", bpe_token_count(F.col("t")).cast("long").alias("w")
    )
    kept = filter_by_group_percentile(tok, "w", "lang", 0.25, approx=False)
    samp = stratified_sample(
        kept, "lang", {"en": 0.5}, key_col="doc_id", default_rate=1.0
    )
    out = shard_summary(samp, "w", ["doc_id"], budget=1000)
    return out.select(
        F.col("shard").cast("long").alias("shard"),
        F.col("n_rows").cast("long").alias("n_docs"),
        F.col("total_weight").cast("long").alias("sum_tokens"),
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: MinHash-LSH pairs -> connected components
    (alternating star contraction) -> every doc labeled with its cluster's
    min doc_id and the cluster size. The oracle recomputes the exact pair
    set in SQL (same signature math as ``minhash_pairs``) and closes it
    transitively with a recursive CTE — similarity is not transitive, so
    this is the stage that turns pairs into dedup decisions."""
    from spatialpandas_spark.operators.dedup import near_dup_clusters

    out = near_dup_clusters(_t(spark, sf_dir, "documents"), threshold=0.5)
    return out.select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs within hamming distance 5. The md5-prefix
    base hash makes fingerprints engine-independent, so the DuckDB oracle
    recomputes them exactly in SQL."""
    from spatialpandas_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=5, bands=8
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def q_embedding_near_dup(spark, sf_dir):
    """Merged embedding near-dup gate, tagged union of the two
    candidate-generation strategies:

    - 'rp': random-hyperplane banding (the LSH path) — seeded
      hyperplanes embedded as literal arrays in the oracle SQL, so
      DuckDB recomputes the exact signatures, band collisions, and
      cosine filter;
    - 'semantic': SemDeDup-style within-cluster pairs
      (operators/semantic.py) with ``kmeans_iters=0`` so the
      deterministic md5-sample centroid assignment is closed-form SQL
      (the same ``asg`` replay the IVF gates use).

    Breadcrumbs: 'rp' -> operators/similarity.py
    embedding_near_dup_pairs (tests/test_similarity.py);
    'semantic' -> operators/semantic.py semantic_dedup_pairs
    (tests/test_semantic_dedup.py)."""
    from spatialpandas_spark.operators.semantic import semantic_dedup_pairs
    from spatialpandas_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    rp = embedding_near_dup_pairs(
        emb, threshold=0.3, dim=64, bits=16, bands=4, seed=42
    ).select("id_a", "id_b", F.round(F.col("sim"), 6).alias("sim"))
    sem = semantic_dedup_pairs(
        emb, n_clusters=16, threshold=0.3, kmeans_iters=0
    ).select("id_a", "id_b", F.round(F.col("sim"), 6).alias("sim"))
    return _variant(rp, "rp").unionByName(_variant(sem, "semantic"))


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 5 query vectors over embeddings."""
    from spatialpandas_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = brute_force_topk(qs, emb, k=5)
    return out.select(
        "qid", "vec_id", F.round(F.col("sim"), 6).alias("sim"), F.col("rank").cast("long").alias("rank")
    )


def q_ann_pq_exact(spark, sf_dir):
    """PQ end-to-end through the driver gate in the provably-LOSSLESS
    configuration: a 200-vector corpus with n_codes=200 makes every
    sub-vector its own codeword (zero quantization error — pinned by
    tests/test_pq.py::test_pq_exact_reconstruction_limit), so train ->
    encode -> ADC code scan -> exact-cosine rerank returns exactly the
    brute-force top-k, and the oracle is the plain brute-force SQL
    replay over the reduced corpus. Lossy-setting recall is pytest +
    study evidence (tools/pq_study.py, BASELINE.md round-4 notes)."""
    from spatialpandas_spark.operators.pq import pq_encode, pq_topk, train_pq

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    books = train_pq(emb, m_sub=8, n_codes=200, sample_n=256, iters=2)
    codes = pq_encode(emb, books)
    out = pq_topk(qs, codes, books, k=5, rerank=emb, rerank_factor=4)
    return out.select(
        "qid", "vec_id", F.round(F.col("sim"), 6).alias("sim"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_sq8(spark, sf_dir):
    """SQ8 scalar-quantization pipeline end to end on the clustered
    fixture (_clustered_vecs — bit-identical doubles in any engine):
    train per-dim lo/hi -> int8 encode -> ADC top-5 for 5 queries. The
    whole chain is exactly SQL-replayable by construction: sequential-
    fold normalization (x / sqrt(list_dot_product)), order-free MIN/MAX,
    floor(x+0.5) half-up codes, lo + c*scale dequant, sequential-fold
    ADC sims — so the gate hash pins the lossy pipeline itself, not an
    exactness limit. Breadcrumbs: operators/sq.py train_sq8/sq8_encode/
    sq8_topk (tests/test_sq.py bit-exact twins)."""
    from spatialpandas_spark.operators.sq import (
        sq8_encode,
        sq8_topk,
        train_sq8,
    )

    cv = _clustered_vecs(_t(spark, sf_dir, "embeddings"))
    params = train_sq8(cv, corpus_vec="cvec")
    codes = sq8_encode(cv, params, corpus_vec="cvec")
    qs = cv.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("cvec").alias("qvec")
    )
    return sq8_topk(qs, codes, params, k=5).select(
        "qid",
        "vec_id",
        F.round(F.col("sim"), 6).alias("sim"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_topk_merged(spark, sf_dir):
    """Merged ANN gate: brute force over the full table + the PQ
    pipeline in its exact-reconstruction limit + the SQ8 pipeline in
    its ordinary LOSSY configuration (its arithmetic is exactly
    replayable, no limit needed), tagged union.
    Variant breadcrumbs: 'bf' -> operators/similarity.py
    brute_force_topk (tests/test_similarity.py); 'pq_exact' ->
    operators/pq.py lossless-config PQ pipeline (tests/test_pq.py);
    'sq8' -> :func:`q_ann_sq8` (operators/sq.py, tests/test_sq.py)."""
    return (
        _variant(q_ann_topk(spark, sf_dir), "bf")
        .unionByName(_variant(q_ann_pq_exact(spark, sf_dir), "pq_exact"))
        .unionByName(_variant(q_ann_sq8(spark, sf_dir), "sq8"))
    )


def _ivf_with_recall(out: DataFrame, bf: DataFrame, k: int) -> DataFrame:
    """Attach per-query recall@k vs the exact brute-force top-k, so ANN
    quality itself is driver-verified (the oracle recomputes the same
    recall from its own IVF + brute-force replicas)."""
    marked = out.join(
        bf.select("qid", "vec_id").withColumn("__hit", F.lit(1)),
        ["qid", "vec_id"],
        "left",
    )
    rc = marked.groupBy("qid").agg(
        (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / k).alias("recall")
    )
    return out.join(rc, "qid")


_CLUSTER_DIM = 64
_CLUSTER_NOISE = 0.15


def _clustered_vecs(emb):
    """Deterministic CLUSTERED twin of the embeddings table:
    ``cvec[i] = u(label, i) + 0.15 * u(vec_id, i)`` where ``u`` maps an
    integer hash to [-1, 1] via exact integer arithmetic — bit-identical
    in any IEEE-double engine (verified: 500/500 rows equal between Spark
    and DuckDB), so the full IVF replay stays hash-exact on it. The
    fixture's own embeddings are isotropic (same-label mean cosine 0.002)
    — an adversarial case where NO partition index can beat the scan
    fraction; this twin has real cluster structure (within-label cosine
    0.978 vs -0.022 cross), the regime ANN quality is measurable in."""

    def u(h):
        return (h % F.lit(2000001)) / F.lit(1000000.0) - F.lit(1.0)

    idx = F.sequence(F.lit(0), F.lit(_CLUSTER_DIM - 1))
    cvec = F.transform(
        idx,
        lambda i: u(
            F.col("label").cast("long") * F.lit(73856093)
            + i.cast("long") * F.lit(19349663)
        )
        + F.lit(_CLUSTER_NOISE)
        * u(
            F.col("vec_id").cast("long") * F.lit(1103515245)
            + i.cast("long") * F.lit(12345)
            + F.lit(54321)
        ),
    )
    return emb.select("vec_id", cvec.alias("cvec"))


def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (bucketed ANN scale path), TWO variants:

    - 'iso': the raw fixture embeddings. These are isotropic, so recall@5
      at n_probe=4/16 sits near the scan fraction (~0.64) — the
      information-theoretic bound for ANY partition index on
      structureless vectors, not an implementation gap (measured curve:
      tools/ivf_recall_study.py, BASELINE.md).
    - 'clustered': the deterministic clustered twin (_clustered_vecs) —
      driver-verified recall@5 = 1.0 at the same 4/16 setting, the
      regime real embedding corpora live in.

    Both pin kmeans_iters=0: the deterministic md5-ordered centroid
    sample is the exact cross-engine twin the DuckDB oracle replays
    (bucketing, probing, re-ranking AND recall@5 vs brute force).
    The library default is kmeans_iters=2 (FP-order-dependent means have
    no exact SQL twin; its recall lift is pytest-asserted instead).

    Breadcrumbs: both variants -> operators/similarity.py ivf_topk
    (tests/test_similarity.py); 'clustered' fixture ->
    _clustered_vecs."""
    from spatialpandas_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")

    def variant(corpus, vec_col, tag):
        qs = corpus.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col(vec_col).alias("qvec")
        )
        out = ivf_topk(
            qs, corpus, k=5, n_centroids=16, n_probe=4,
            kmeans_iters=0, corpus_vec=vec_col,
        ).select(
            "qid", "vec_id", F.round(F.col("sim"), 6).alias("sim"),
            F.col("rank").cast("long").alias("rank"),
        )
        out = _ivf_with_recall(
            out, brute_force_topk(qs, corpus, k=5, corpus_vec=vec_col), 5
        )
        return out.withColumn("variant", F.lit(tag))

    return variant(emb, "embedding", "iso").unionByName(
        variant(_clustered_vecs(emb), "cvec", "clustered")
    )


def q_ann_ivf_index(spark, sf_dir):
    """Persistent IVF, THREE variants: build the bucket-partitioned
    index on disk, then probe it — 'iso'/'clustered' must equal the
    in-memory IVF (same deterministic centroids), so the same SQL
    oracles (incl. recall@5 vs brute force) apply. 'iso' = raw fixture
    (recall ~ scan fraction, the bound for structureless vectors);
    'clustered' = the deterministic twin where the PERSISTENT index's
    quality is driver-verified at 1.0. Probe scans are partition-pruned
    (plan-asserted in tests).

    'ivfsq8' (round 9): the persistent IVF-SQ8 index on the clustered
    twin — bucket pruning + int8 ADC scoring end to end, the LOSSY
    pipeline itself hash-exact: md5 centroids (kmeans_iters=0), the
    probe contract (raw-cosine DESC, index DESC on ties), global SQ8
    lo/hi over the normalized corpus, half-up codes, dequantized
    sequential-fold ADC sims, plus recall@5 vs exact brute force
    (driver-verified ANN quality). Oracle composes the IVF replay with
    the SQ8 replay (_ivfsq8_oracle_sql).

    Breadcrumbs: operators/similarity_index.py build/query
    (tests/test_similarity_index.py, tests/test_sq_index.py)."""
    import tempfile

    from spatialpandas_spark.operators.similarity import brute_force_topk
    from spatialpandas_spark.operators.similarity_index import (
        build_ivf_index,
        build_ivfsq8_index,
        query_ivf_index,
        query_ivfsq8_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cvecs = _clustered_vecs(emb)

    def with_recall(out, qs, corpus, vec_col, tag):
        out = out.select(
            "qid", "vec_id", F.round(F.col("sim"), 6).alias("sim"),
            F.col("rank").cast("long").alias("rank"),
        )
        out = _ivf_with_recall(
            out, brute_force_topk(qs, corpus, k=5, corpus_vec=vec_col), 5
        )
        return out.withColumn("variant", F.lit(tag))

    def variant(corpus, vec_col, tag):
        path = os.path.join(tempfile.mkdtemp(prefix=f"ivf_idx_{tag}_"), "index")
        # kmeans_iters=0: deterministic md5 centroids = the exact SQL
        # twin (the library default is 2; see q_ann_ivf_topk's docstring)
        build_ivf_index(
            corpus, path, n_centroids=16, kmeans_iters=0, corpus_vec=vec_col
        )
        qs = corpus.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col(vec_col).alias("qvec")
        )
        out = query_ivf_index(spark, path, qs, k=5, n_probe=4)
        return with_recall(out, qs, corpus, vec_col, tag)

    def variant_sq8():
        path = os.path.join(tempfile.mkdtemp(prefix="ivfsq8_idx_"), "index")
        build_ivfsq8_index(
            cvecs, path, n_centroids=16, kmeans_iters=0, corpus_vec="cvec"
        )
        qs = cvecs.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("cvec").alias("qvec")
        )
        out = query_ivfsq8_index(spark, path, qs, k=5, n_probe=4)
        return with_recall(out, qs, cvecs, "cvec", "ivfsq8")

    return (
        variant(emb, "embedding", "iso")
        .unionByName(variant(cvecs, "cvec", "clustered"))
        .unionByName(variant_sq8())
    )


def q_label_centroid_sim(spark, sf_dir):
    """Embedding analytics: avg pairwise-to-centroid cosine per label —
    exercises vector aggregation (array avg) + HOF cosine."""
    from spatialpandas_spark.operators.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    n = 64
    sums = emb.groupBy("label").agg(
        *[F.sum(F.get(F.col("v"), i)).alias(f"s{i}") for i in range(n)],
        F.count("*").alias("cnt"),
    )
    centroid = F.array(*[F.col(f"s{i}") / F.col("cnt") for i in range(n)])
    cent = sums.select("label", centroid.alias("centroid"))
    j = emb.join(F.broadcast(cent), "label")
    return (
        j.select("label", cosine(F.col("v"), F.col("centroid")).alias("cs"))
        .groupBy("label")
        .agg(F.round(F.avg("cs"), 6).alias("avg_cos"), F.count("*").cast("long").alias("n"))
    )


#: constant-gray 8x8 JPEG payloads for the 'jpeg' gate variant: k < 4
#: are BASELINE (SOF0) streams, k >= 4 PROGRESSIVE (SOF2) — both real
#: entropy-coded scans through the full marker/Huffman/IDCT path. A
#: constant image decodes bit-exactly (DC-only blocks, all-ones quant
#: tables), so the closed-form oracle is exact — the WAV gate's trick
#: on the JPEG surface. Bytes produced by the repo's own spec-written
#: encoders (tests/test_multimodal_jpeg.py encode_jpeg,
#: tests/test_jpeg_progressive.py encode_jpeg_progressive); pinned
#: against them by tests/test_entry_jpeg_gate.py so they cannot drift.
_JPEG_GATE_VALUES = (77, 106, 135, 164, 40, 95, 124, 20)
_JPEG_GATE_HEX = (
    "FFD8FFDB004300010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "010101FFDB0043010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "01010101FFC00011080008000803011100021101031101FFC4001400010000000000"
    "0000000000000000000009FFC40014010100000000000000000000000000000000FF"
    "C40014100100000000000000000000000000000000FFC40014110100000000000000"
    "000000000000000000FFDA000C03010002110311003F0019C1FFD9",
    "FFD8FFDB004300010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "010101FFDB0043010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "01010101FFC00011080008000803011100021101031101FFC4001400010000000000"
    "0000000000000000000008FFC40014010100000000000000000000000000000000FF"
    "C40014100100000000000000000000000000000000FFC40014110100000000000000"
    "000000000000000000FFDA000C03010002110311003F002783FFD9",
    "FFD8FFDB004300010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "010101FFDB0043010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "01010101FFC00011080008000803011100021101031101FFC4001400010000000000"
    "0000000000000000000006FFC40014010100000000000000000000000000000000FF"
    "C40014100100000000000000000000000000000000FFC40014110100000000000000"
    "000000000000000000FFDA000C03010002110311003F00700FFFD9",
    "FFD8FFDB004300010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "010101FFDB0043010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "01010101FFC00011080008000803011100021101031101FFC4001400010000000000"
    "0000000000000000000009FFC40014010100000000000000000000000000000000FF"
    "C40014100100000000000000000000000000000000FFC40014110100000000000000"
    "000000000000000000FFDA000C03010002110311003F004801FFD9",
    "FFD8FFDB004300010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "010101FFDB0043010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "01010101FFC20011080008000803011100021101031101FFC4001400010000000000"
    "0000000000000000000009FFC40014010100000000000000000000000000000000FF"
    "DA000C0301000210031000000127CFFFDA000C030100020003000000101FFFC40014"
    "100100000000000000000000000000000000FFDA00080101000105017FFFC4001410"
    "0100000000000000000000000000000000FFDA00080101000105107FFFC400141001"
    "00000000000000000000000000000000FFDA0008010100063F017FFFC40014100100"
    "000000000000000000000000000000FFDA0008010100063F107FFFC4001410010000"
    "0000000000000000000000000000FFDA00080102000105017FFFC400141001000000"
    "00000000000000000000000000FFDA00080102000105107FFFC40014100100000000"
    "000000000000000000000000FFDA0008010200063F017FFFC4001410010000000000"
    "0000000000000000000000FFDA0008010200063F107FFFC400141001000000000000"
    "00000000000000000000FFDA00080103000105017FFFC40014100100000000000000"
    "000000000000000000FFDA00080103000105107FFFC4001410010000000000000000"
    "0000000000000000FFDA0008010300063F017FFFC400141001000000000000000000"
    "00000000000000FFDA0008010300063F107FFFD9",
    "FFD8FFDB004300010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "010101FFDB0043010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "01010101FFC20011080008000803011100021101031101FFC4001400010000000000"
    "0000000000000000000008FFC40014010100000000000000000000000000000000FF"
    "DA000C030100021003100000013D9FFFDA000C030100020003000000101FFFC40014"
    "100100000000000000000000000000000000FFDA00080101000105017FFFC4001410"
    "0100000000000000000000000000000000FFDA00080101000105107FFFC400141001"
    "00000000000000000000000000000000FFDA0008010100063F017FFFC40014100100"
    "000000000000000000000000000000FFDA0008010100063F107FFFC4001410010000"
    "0000000000000000000000000000FFDA00080102000105017FFFC400141001000000"
    "00000000000000000000000000FFDA00080102000105107FFFC40014100100000000"
    "000000000000000000000000FFDA0008010200063F017FFFC4001410010000000000"
    "0000000000000000000000FFDA0008010200063F107FFFC400141001000000000000"
    "00000000000000000000FFDA00080103000105017FFFC40014100100000000000000"
    "000000000000000000FFDA00080103000105107FFFC4001410010000000000000000"
    "0000000000000000FFDA0008010300063F017FFFC400141001000000000000000000"
    "00000000000000FFDA0008010300063F107FFFD9",
    "FFD8FFDB004300010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "010101FFDB0043010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "01010101FFC20011080008000803011100021101031101FFC4001400010000000000"
    "0000000000000000000005FFC40014010100000000000000000000000000000000FF"
    "DA000C030100021003100000013CFFDA000C030100020003000000101FFFC4001410"
    "0100000000000000000000000000000000FFDA00080101000105017FFFC400141001"
    "00000000000000000000000000000000FFDA00080101000105107FFFC40014100100"
    "000000000000000000000000000000FFDA0008010100063F017FFFC4001410010000"
    "0000000000000000000000000000FFDA0008010100063F107FFFC400141001000000"
    "00000000000000000000000000FFDA00080102000105017FFFC40014100100000000"
    "000000000000000000000000FFDA00080102000105107FFFC4001410010000000000"
    "0000000000000000000000FFDA0008010200063F017FFFC400141001000000000000"
    "00000000000000000000FFDA0008010200063F107FFFC40014100100000000000000"
    "000000000000000000FFDA00080103000105017FFFC4001410010000000000000000"
    "0000000000000000FFDA00080103000105107FFFC400141001000000000000000000"
    "00000000000000FFDA0008010300063F017FFFC40014100100000000000000000000"
    "000000000000FFDA0008010300063F107FFFD9",
    "FFD8FFDB004300010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "010101FFDB0043010101010101010101010101010101010101010101010101010101"
    "01010101010101010101010101010101010101010101010101010101010101010101"
    "01010101FFC20011080008000803011100021101031101FFC4001400010000000000"
    "0000000000000000000009FFC40014010100000000000000000000000000000000FF"
    "DA000C0301000210031000000113CFFFDA000C030100020003000000101FFFC40014"
    "100100000000000000000000000000000000FFDA00080101000105017FFFC4001410"
    "0100000000000000000000000000000000FFDA00080101000105107FFFC400141001"
    "00000000000000000000000000000000FFDA0008010100063F017FFFC40014100100"
    "000000000000000000000000000000FFDA0008010100063F107FFFC4001410010000"
    "0000000000000000000000000000FFDA00080102000105017FFFC400141001000000"
    "00000000000000000000000000FFDA00080102000105107FFFC40014100100000000"
    "000000000000000000000000FFDA0008010200063F017FFFC4001410010000000000"
    "0000000000000000000000FFDA0008010200063F107FFFC400141001000000000000"
    "00000000000000000000FFDA00080103000105017FFFC40014100100000000000000"
    "000000000000000000FFDA00080103000105107FFFC4001410010000000000000000"
    "0000000000000000FFDA0008010300063F017FFFC400141001000000000000000000"
    "00000000000000FFDA0008010300063F107FFFD9",
)


def _ppm_payload_expr():
    """4x4 P6 payload from part keys (bytes 1..127: UTF-8 identity)."""
    pieces = [
        F.expr(f"chr((p_partkey*7 + {i}*5 + {c}*11) % 127 + 1)")
        for i in range(16)
        for c in range(3)
    ]
    return F.encode(F.concat(F.lit("P6\n4 4\n127\n"), *pieces), "UTF-8")


def _wav_payload_expr():
    """16-sample 8-bit PCM RIFF/WAVE payload from part keys via unhex."""
    pieces = [
        F.expr(f"lpad(hex((p_partkey*13 + {i}*7) % 256), 2, '0')")
        for i in range(16)
    ]
    return F.unhex(F.concat(F.lit(_WAV_HDR_HEX), *pieces))


_PNG_GATE_HEX_CACHE = None


def _png_gate_hexes() -> list:
    """The 8 distinct 4x4 PNGs of the 'png' variant, encoded once per
    process with the pure-stdlib encoder (pixel (k*7+i*5+c*11)%127+1)."""
    global _PNG_GATE_HEX_CACHE
    if _PNG_GATE_HEX_CACHE is None:
        import numpy as np

        from spatialpandas_spark.operators.png import encode_png

        hexes = []
        for k in range(8):
            img = np.array(
                [
                    [(k * 7 + i * 5 + c * 11) % 127 + 1 for c in range(3)]
                    for i in range(16)
                ],
                dtype=np.uint8,
            ).reshape(4, 4, 3)
            hexes.append(encode_png(img).hex().upper())
        _PNG_GATE_HEX_CACHE = hexes
    return _PNG_GATE_HEX_CACHE


_BMP_GATE_HEX_CACHE = None


def _bmp_gate_hexes() -> list:
    """8 distinct 4x4 BMPs (same pixel formula as the PNG gate),
    encoded once per process with the in-package BITMAPINFOHEADER
    encoder — probe-side fixture (dims + byte length closed-form)."""
    global _BMP_GATE_HEX_CACHE
    if _BMP_GATE_HEX_CACHE is None:
        import numpy as np

        from spatialpandas_spark.operators.bmp import encode_bmp

        hexes = []
        for k in range(8):
            img = np.array(
                [
                    [(k * 7 + i * 5 + c * 11) % 127 + 1 for c in range(3)]
                    for i in range(16)
                ],
                dtype=np.uint8,
            ).reshape(4, 4, 3)
            hexes.append(encode_bmp(img).hex().upper())
        _BMP_GATE_HEX_CACHE = hexes
    return _BMP_GATE_HEX_CACHE


#: 13-byte GIF89a header (4x4 logical screen, no global color table, no
#: image data): the probe variant's demonstration that metadata passes
#: read HEADERS ONLY — this payload probes fine (format/dims) while any
#: full decode would fail. Layout: magic + w/h u16le + flags/bg/aspect.
_GIF_PROBE_HEX = "474946383961" + "0400" + "0400" + "000000"

_AVI_GATE_HEX_CACHE = None


def _avi_gate_hex() -> str:
    """The fixed MJPEG-in-AVI payload of the probe variant: two 8x8
    constant-gray JPEG frames (the first 'jpeg' gate payload, value
    _JPEG_GATE_VALUES[0]) in a 5 fps container, assembled once per
    process with the production encoder (operators/avi.py). The probe
    reads only the hdrl list, so the oracle's closed-form row is
    (w=8, h=8, fps=5, streams=1, frames=2, n_bytes=len)."""
    global _AVI_GATE_HEX_CACHE
    if _AVI_GATE_HEX_CACHE is None:
        from spatialpandas_spark.operators.avi import encode_avi_mjpeg

        frame = bytes.fromhex(_JPEG_GATE_HEX[0])
        _AVI_GATE_HEX_CACHE = encode_avi_mjpeg(
            [frame, frame], 8, 8, fps=5
        ).hex().upper()
    return _AVI_GATE_HEX_CACHE


_AVI_FEAT_HEX_CACHE = None


def _avi_feat_gate_hexes() -> list:
    """8 distinct two-frame AVI payloads for the ``extract_features``
    'avi' variant, covering BOTH shipped codecs (round 13 VERDICT ask
    #5 gave the MJPEG path a gate; round 14 VERDICT ask #5 adds the
    DIB path — uncompressed bottom-up BGR, the other decode branch of
    ``decode_avi_frames``):

    - EVEN part key: MJPEG container packing jpeg-gate frames k and
      (k+3)%8 — two constant GRAY values through real JPEG entropy
      decode (v1 = vals[k], v2 = vals[(k+3)%8], r=g=b);
    - ODD part key: DIB (BI_RGB) container of two constant COLOR
      frames — per-channel constants drawn from the same value table
      (frame1 rgb = vals[k], vals[(k+1)%8], vals[(k+2)%8]; frame2 rgb
      = vals[(k+3)%8], vals[(k+4)%8], vals[(k+5)%8]) so the three
      channels differ (pinning BGR->RGB order and the bottom-up row
      unpadding, which a gray frame cannot).

    Constant frames are bit-exact through both decoders, so the
    closed-form oracle is mean (a+b)/2, min/max least/greatest, fgt
    the >64-indicator average, per channel — all dyadic."""
    global _AVI_FEAT_HEX_CACHE
    if _AVI_FEAT_HEX_CACHE is None:
        import numpy as np

        from spatialpandas_spark.operators.avi import (
            encode_avi_dib,
            encode_avi_mjpeg,
        )

        vals = _JPEG_GATE_VALUES
        hexes = []
        for k in range(8):
            if k % 2 == 0:
                hexes.append(
                    encode_avi_mjpeg(
                        [
                            bytes.fromhex(_JPEG_GATE_HEX[k]),
                            bytes.fromhex(_JPEG_GATE_HEX[(k + 3) % 8]),
                        ],
                        8, 8, fps=5,
                    ).hex().upper()
                )
            else:
                frames = [
                    np.full((8, 8, 3), 0, dtype=np.uint8),
                    np.full((8, 8, 3), 0, dtype=np.uint8),
                ]
                frames[0][..., :] = [
                    vals[k], vals[(k + 1) % 8], vals[(k + 2) % 8],
                ]
                frames[1][..., :] = [
                    vals[(k + 3) % 8], vals[(k + 4) % 8],
                    vals[(k + 5) % 8],
                ]
                hexes.append(
                    encode_avi_dib(frames, fps=5).hex().upper()
                )
        _AVI_FEAT_HEX_CACHE = hexes
    return _AVI_FEAT_HEX_CACHE


_FLAC_GATE_HEX_CACHE = None


def _flac_gate_hexes() -> list:
    """8 distinct 16-sample STEREO 16-bit FLAC payloads (sample
    s(k,i,c) = (((k*13 + i*7 + c*5) % 256) - 128) * 129 — every value
    within int16, statistics dyadic rationals over 16 so float32 is
    exact), encoded once per process with the independent spec encoder
    (operators/flac.py) as FIXED-order-1 mid/side frames — the engine
    side re-derives the PCM through real Rice decode + stereo
    decorrelation + CRC/MD5 verification."""
    global _FLAC_GATE_HEX_CACHE
    if _FLAC_GATE_HEX_CACHE is None:
        import numpy as np

        from spatialpandas_spark.operators.flac import encode_flac

        hexes = []
        for k in range(8):
            pcm = np.array(
                [
                    [(((k * 13 + i * 7 + c * 5) % 256) - 128) * 129
                     for c in range(2)]
                    for i in range(16)
                ],
                dtype=np.int32,
            )
            hexes.append(
                encode_flac(
                    pcm, sample_rate=8000, bps=16, mode="fixed",
                    order=1, rice_k=12, blocksize=16,
                    channel_mode="mid_side",
                ).hex().upper()
            )
        _FLAC_GATE_HEX_CACHE = hexes
    return _FLAC_GATE_HEX_CACHE


def _pick_by_key_expr(hexes, key_mod: int):
    """payload = unhex(hexes[p_partkey % key_mod]) as a Catalyst expr."""
    return F.unhex(
        F.element_at(
            F.array(*[F.lit(h) for h in hexes]),
            (F.col("p_partkey") % key_mod + 1).cast("int"),
        )
    )


def q_extract_features(spark, sf_dir):
    """Multimodal decode on REAL pixels: 4x4 binary-PPM (P6) payloads are
    synthesized JVM-side from part keys (header + 48 raster bytes via
    chr/encode — every byte is in 1..127 so UTF-8 encoding is identity),
    then decoded with the pure-numpy PPM decoder in an Arrow-batched
    mapInPandas stage; per-channel pixel statistics come back as the
    feature vector. Every statistic is a ratio of small integers over 16,
    so the closed-form oracle reproduces the floats bit-exactly."""
    from spatialpandas_spark.operators.multimodal import extract_features

    part = _t(spark, sf_dir, "part")
    media = part.select(
        F.col("p_partkey").alias("media_id"),
        _ppm_payload_expr().alias("payload"),
    )
    out = extract_features(media, decoder="ppm")
    names = [
        "mean_r", "mean_g", "mean_b",
        "min_r", "min_g", "min_b",
        "max_r", "max_g", "max_b",
        "fgt_r", "fgt_g", "fgt_b",
    ]
    return out.select(
        "media_id",
        *[
            F.get(F.col("feature"), j).cast("double").alias(nm)
            for j, nm in enumerate(names)
        ],
        "decode_ok",
    )


# 44-byte RIFF/WAVE header: PCM, mono, 8-bit, 8 kHz, 16-sample data chunk
_WAV_HDR_HEX = (
    "524946463400000057415645666D7420100000000100"
    "0100401F0000401F0000010008006461746110000000"
)


def q_extract_features_audio(spark, sf_dir):
    """Multimodal decode on REAL audio samples: 16-sample 8-bit-PCM
    RIFF/WAVE payloads are synthesized JVM-side from part keys (fixed
    header hex + per-sample hex via unhex — arbitrary bytes, no UTF-8
    identity trick needed), then decoded with the pure-numpy WAV parser
    in the same Arrow-batched extract_features stage; per-channel sample
    statistics come back in the image-parallel 12-slot layout (channels
    beyond the first zero-filled). Every statistic is a ratio of small
    integers over 16, so the closed-form oracle is bit-exact."""
    from spatialpandas_spark.operators.multimodal import extract_features

    part = _t(spark, sf_dir, "part")
    media = part.select(
        F.col("p_partkey").alias("media_id"),
        _wav_payload_expr().alias("payload"),
    )
    out = extract_features(media, decoder="wav")
    names = [
        "mean_r", "mean_g", "mean_b",
        "min_r", "min_g", "min_b",
        "max_r", "max_g", "max_b",
        "fgt_r", "fgt_g", "fgt_b",
    ]
    return out.select(
        "media_id",
        *[
            F.get(F.col("feature"), j).cast("double").alias(nm)
            for j, nm in enumerate(names)
        ],
        "decode_ok",
    )


def q_extract_features_png(spark, sf_dir):
    """Multimodal decode on REAL COMPRESSED payloads: 8 distinct 4x4 PNGs
    (pixel value (k*7 + i*5 + c*11) % 127 + 1 for k = media_id % 8 — the
    PPM gate's formula keyed on k) are encoded ONCE at query-build time
    with the pure-stdlib PNG encoder (operators/png.py: DEFLATE via
    zlib, CRC-framed chunks) and embedded as hex literals; each part row
    picks its payload by key. The engine side then runs the FULL real
    path — magic sniff (decoder="image"), chunk CRC verification, zlib
    inflate, filter reconstruction — inside the Arrow-batched
    extract_features stage. Stats are ratios of small integers over 16,
    so the closed-form oracle (same formula on k) is bit-exact."""
    from spatialpandas_spark.operators.multimodal import extract_features

    part = _t(spark, sf_dir, "part")
    media = part.select(
        F.col("p_partkey").alias("media_id"),
        _pick_by_key_expr(_png_gate_hexes(), 8).alias("payload"),
    )
    out = extract_features(media, decoder="image")
    names = [
        "mean_r", "mean_g", "mean_b",
        "min_r", "min_g", "min_b",
        "max_r", "max_g", "max_b",
        "fgt_r", "fgt_g", "fgt_b",
    ]
    return out.select(
        "media_id",
        *[
            F.get(F.col("feature"), j).cast("double").alias(nm)
            for j, nm in enumerate(names)
        ],
        "decode_ok",
    )


def q_extract_features_jpeg(spark, sf_dir):
    """Multimodal decode through the REAL JPEG path: 8 constant-gray
    8x8 payloads (4 BASELINE SOF0 + 4 PROGRESSIVE SOF2, see
    _JPEG_GATE_HEX) picked by part key, magic-sniffed and decoded —
    marker walk, Huffman entropy decode (sequential and
    spectral-selection/successive-approximation progressive scans),
    dequant, IDCT, YCbCr. Constant images decode bit-exactly, so the
    closed-form oracle (value table keyed on p_partkey % 8) is exact."""
    from spatialpandas_spark.operators.multimodal import extract_features

    part = _t(spark, sf_dir, "part")
    media = part.select(
        F.col("p_partkey").alias("media_id"),
        _pick_by_key_expr(_JPEG_GATE_HEX, 8).alias("payload"),
    )
    out = extract_features(media, decoder="image")
    names = [
        "mean_r", "mean_g", "mean_b",
        "min_r", "min_g", "min_b",
        "max_r", "max_g", "max_b",
        "fgt_r", "fgt_g", "fgt_b",
    ]
    return out.select(
        "media_id",
        *[
            F.get(F.col("feature"), j).cast("double").alias(nm)
            for j, nm in enumerate(names)
        ],
        "decode_ok",
    )


def q_extract_features_probe(spark, sf_dir):
    """Header-only metadata probes over a MIXED media column — one
    probe_media_metadata pass profiling six formats (p_partkey % 6:
    PPM / WAV / PNG / JPEG-incl-progressive / BMP / GIF) with no
    decoder run.
    Header fields are mapped into the media gate's 12-slot layout
    (mean_r=width, mean_g=height, mean_b=sample_rate,
    min_r=n_channels, min_g=n_samples, min_b=n_bytes, rest 0.0;
    decode_ok carries 'probe_ok:format') so the probe unions with the
    decode variants; the oracle is closed-form from the same payload
    constructions. Probe agreement with full decode is additionally
    pinned by tests/test_image_probe.py.

    Seven formats by p_partkey % 7: PPM / WAV / PNG / JPEG(+SOF2) /
    BMP / GIF / AVI — the GIF payload is a HEADER-ONLY 13-byte stream
    (no image data at all) and the AVI probe reads only the ``hdrl``
    list, pinning that the probe reads headers and never decodes
    (round 12: MJPEG-in-AVI container, operators/avi.py —
    tests/test_multimodal_avi.py)."""
    from spatialpandas_spark.operators.multimodal import (
        probe_media_metadata,
    )

    part = _t(spark, sf_dir, "part")
    m6 = F.col("p_partkey") % 7
    payload = (
        F.when(m6 == 0, _ppm_payload_expr())
        .when(m6 == 1, _wav_payload_expr())
        .when(m6 == 2, _pick_by_key_expr(_png_gate_hexes(), 8))
        .when(m6 == 3, _pick_by_key_expr(_JPEG_GATE_HEX, 8))
        .when(m6 == 4, _pick_by_key_expr(_bmp_gate_hexes(), 8))
        .when(m6 == 5, F.unhex(F.lit(_GIF_PROBE_HEX)))
        .otherwise(F.unhex(F.lit(_avi_gate_hex())))
    )
    media = part.select(
        F.col("p_partkey").alias("media_id"), payload.alias("payload")
    )
    out = probe_media_metadata(media)

    def slot(c):
        return F.coalesce(F.col(c).cast("double"), F.lit(0.0))

    return out.select(
        "media_id",
        slot("width").alias("mean_r"),
        slot("height").alias("mean_g"),
        slot("sample_rate").alias("mean_b"),
        slot("n_channels").alias("min_r"),
        slot("n_samples").alias("min_g"),
        slot("n_bytes").alias("min_b"),
        F.lit(0.0).alias("max_r"),
        F.lit(0.0).alias("max_g"),
        F.lit(0.0).alias("max_b"),
        F.lit(0.0).alias("fgt_r"),
        F.lit(0.0).alias("fgt_g"),
        F.lit(0.0).alias("fgt_b"),
        F.concat_ws(":", "probe_ok", "format").alias("decode_ok"),
    )


def q_extract_features_flac(spark, sf_dir):
    """Multimodal decode through the REAL COMPRESSED AUDIO path: 8
    distinct stereo FLAC payloads (see :func:`_flac_gate_hexes`) picked
    by part key, sniffed by the 'media' decoder (``fLaC`` magic) and
    decoded for real — frame parse, Rice residual decode, fixed-order
    prediction, mid/side decorrelation, CRC-8/16 and STREAMINFO MD5
    verification (operators/flac.py, round-10 codec per VERDICT r9 #7;
    tests/test_multimodal_flac.py). Stats land in the shared 12-slot
    layout (two real channels + zero-filled third; 16-bit threshold
    8192); every statistic is a dyadic rational so the closed-form
    oracle on the same PCM formula is bit-exact."""
    from spatialpandas_spark.operators.multimodal import extract_features

    part = _t(spark, sf_dir, "part")
    media = part.select(
        F.col("p_partkey").alias("media_id"),
        _pick_by_key_expr(_flac_gate_hexes(), 8).alias("payload"),
    )
    out = extract_features(media, decoder="media")
    names = [
        "mean_r", "mean_g", "mean_b",
        "min_r", "min_g", "min_b",
        "max_r", "max_g", "max_b",
        "fgt_r", "fgt_g", "fgt_b",
    ]
    return out.select(
        "media_id",
        *[
            F.get(F.col("feature"), j).cast("double").alias(nm)
            for j, nm in enumerate(names)
        ],
        "decode_ok",
    )


def q_extract_features_avi(spark, sf_dir):
    """Multimodal decode through the REAL VIDEO-COLUMN path (round 13,
    VERDICT r12 ask #5): 8 two-frame MJPEG-in-AVI containers (see
    :func:`_avi_feat_gate_hexes`) picked by part key, then container
    walk -> frame chunk slices -> JPEG entropy decode -> pooled
    per-channel pixel statistics, all inside one Arrow-batched
    extract_features stage (operators/avi.py + operators/jpeg.py +
    operators/multimodal.py _avi_features;
    tests/test_multimodal_avi.py). Constant frames decode bit-exactly,
    so the closed-form oracle over the two frame values (v1 =
    vals[k], v2 = vals[(k+3)%8]) is exact: mean (v1+v2)/2, min/max
    least/greatest, fgt the >64-indicator average."""
    from spatialpandas_spark.operators.multimodal import extract_features

    part = _t(spark, sf_dir, "part")
    media = part.select(
        F.col("p_partkey").alias("media_id"),
        _pick_by_key_expr(_avi_feat_gate_hexes(), 8).alias("payload"),
    )
    out = extract_features(media, decoder="avi")
    names = [
        "mean_r", "mean_g", "mean_b",
        "min_r", "min_g", "min_b",
        "max_r", "max_g", "max_b",
        "fgt_r", "fgt_g", "fgt_b",
    ]
    return out.select(
        "media_id",
        *[
            F.get(F.col("feature"), j).cast("double").alias(nm)
            for j, nm in enumerate(names)
        ],
        "decode_ok",
    )


def q_extract_features_media(spark, sf_dir):
    """Merged multimodal gate, tagged union through the same
    extract_features / probe surface:

    - 'image': 4x4 binary PPM, real pixel decode
      [operators/multimodal.py decode_ppm — tests/test_multimodal_ppm.py];
    - 'audio': 16-sample 8-bit PCM RIFF/WAVE
      [operators/multimodal.py decode_wav — tests/test_multimodal_wav.py];
    - 'png': real DEFLATE/CRC/filter decode, magic-sniffed
      [operators/png.py — tests/test_multimodal_png.py];
    - 'flac': real COMPRESSED audio decode, magic-sniffed (round 10)
      [operators/flac.py — tests/test_multimodal_flac.py];
    - 'avi': the FULL video-column path — container walk, frame
      slices, JPEG entropy decode, pooled frame statistics (round 13)
      [operators/avi.py + multimodal.py _avi_features —
      tests/test_multimodal_avi.py];
    The 'jpeg' and 'probe' variants were promoted to the ``media_probe``
    gate in round 7 (densest-union split) so entropy-decoder and
    header-probe regressions localize to their own row."""
    return (
        _variant(q_extract_features(spark, sf_dir), "image")
        .unionByName(_variant(q_extract_features_audio(spark, sf_dir), "audio"))
        .unionByName(_variant(q_extract_features_png(spark, sf_dir), "png"))
        .unionByName(_variant(q_extract_features_flac(spark, sf_dir), "flac"))
        .unionByName(_variant(q_extract_features_avi(spark, sf_dir), "avi"))
    )


def q_media_probe(spark, sf_dir):
    """JPEG entropy decode + header-only probes — promoted from the
    ``extract_features`` union in round 7, tagged union:

    - 'jpeg': constant-gray baseline SOF0 + progressive SOF2 entropy
      decode, bit-exact [operators/jpeg.py —
      tests/test_multimodal_jpeg.py, tests/test_jpeg_progressive.py,
      tests/test_entry_jpeg_gate.py];
    - 'probe': header-only metadata over a six-format mixed column
      (PPM/WAV/PNG/JPEG/BMP/GIF by p_partkey % 6 — the GIF payload is
      header-only 13 bytes, pinning that no decoder runs)
      [operators/multimodal.py probe_media_metadata —
      tests/test_image_probe.py]."""
    return _variant(q_extract_features_jpeg(spark, sf_dir), "jpeg").unionByName(
        _variant(q_extract_features_probe(spark, sf_dir), "probe")
    )


def q_tpch_joins(spark, sf_dir):
    """Merged relational-join gate (round 7: Q3 + Q5 were single-purpose
    J3 evidence rows; merging freed a slot for the new operator wave),
    tagged union on (variant, k, revenue):

    - 'q3': TPC-H Q3-ish shipping priority — broadcast dim join + hash
      agg by order key (k = o_orderkey as string);
    - 'q5': TPC-H Q5-ish local-supplier revenue — six-table join with
      broadcast dims + time-range scan filter (k = n_name)."""
    q3 = q_tpch_q3(spark, sf_dir).select(
        F.col("o_orderkey").cast("string").alias("k"), "revenue"
    )
    q5 = q_tpch_q5(spark, sf_dir).select(
        F.col("n_name").alias("k"), "revenue"
    )
    return _variant(q3, "q3").unionByName(_variant(q5, "q5"))


# ----------------------------------------------------- consolidated gates
# The driver verifies at most 50 queries per round (round-2 finding), so
# closely-related gates are merged: unions carry a `variant` tag, joins
# share the natural key. Every underlying operator is still exercised —
# the constituent q_* functions above run unchanged inside the merge.
def _variant(df: DataFrame, v: str) -> DataFrame:
    return df.withColumn("variant", F.lit(v))


def q_cx_bbox_merged(spark, sf_dir):
    """P1/P2 .cx selection, regular + inverted-slice variants.
    Breadcrumbs: both -> operators/cx.py cx_filter
    (tests/test_predicates_cx.py; 'inverted' pins the slice-inversion path)."""
    return _variant(q_cx_bbox(spark, sf_dir), "select").unionByName(
        _variant(q_cx_bbox_inverted(spark, sf_dir), "inverted")
    )


def q_cx_refine_merged(spark, sf_dir):
    """P5 exact cx refinement for line + polygon geometry types.
    Breadcrumbs: both -> functions/predicates.py intersects_bounds
    refinement (tests/test_predicates_cx.py, tests/test_concave_battery.py)."""
    return _variant(q_cx_lines(spark, sf_dir), "line").unionByName(
        _variant(q_cx_diamonds(spark, sf_dir), "diamond")
    )


def q_sjoin_inner_merged(spark, sf_dir):
    """J1/J2 inner sjoin through both physical strategies (broadcast
    filter-refine vs grid-cell shuffle) — identical results by contract.
    Breadcrumbs: 'broadcast'/'grid' -> operators/sjoin.py sjoin
    strategy='broadcast'/'grid' (tests/test_sjoin.py,
    tests/test_plans.py)."""
    return _variant(q_sjoin_inner(spark, sf_dir), "broadcast").unionByName(
        _variant(q_sjoin_grid(spark, sf_dir), "grid")
    )


def q_sjoin_left_merged(spark, sf_dir):
    """J1/J2 left-outer sjoin, broadcast vs grid strategies.
    Breadcrumbs: as q_sjoin_inner_merged, how='left'
    (tests/test_sjoin.py)."""
    return _variant(q_sjoin_left(spark, sf_dir), "broadcast").unionByName(
        _variant(q_sjoin_grid_left(spark, sf_dir), "grid")
    )


def q_fillna_merged(spark, sf_dir):
    """P8 missing-data handling: constant fill + pad (ffill) variants.
    Breadcrumbs: 'value' -> functions/transforms.py fillna_geom;
    'pad' -> pad_geom two-phase ffill (tests/test_transforms.py)."""
    return _variant(q_fillna_points(spark, sf_dir), "value").unionByName(
        _variant(q_fillna_pad(spark, sf_dir), "pad")
    )


def q_area_length_by_group(spark, sf_dir):
    """F1/F2 grouped measures: shoelace area + perimeter length, one row
    per brand.
    Breadcrumbs: join of area (functions/measures.py area, F2) +
    length (measures.py length, F1) per brand
    (tests/test_measures.py, tests/test_arrow_bitexact.py)."""
    return q_area_by_group(spark, sf_dir).join(
        q_length_by_group(spark, sf_dir), "brand"
    )


def q_poly_measures(spark, sf_dir):
    """F2/F6 signed area + st_centroid per polygon, keyed by id.
    Breadcrumbs: oriented_area (functions/transforms.py oriented +
    measures.py signed area) + st_centroid (measures.py)
    (tests/test_centroid.py)."""
    return q_oriented_area(spark, sf_dir).join(q_centroid(spark, sf_dir), "id")


def q_diamond_stats(spark, sf_dir):
    """A5 sjoin counts + F8 boundary length per diamond, keyed by did.
    Breadcrumbs: sjoin counts (operators/sjoin.py, A5/A6) + boundary
    length (functions/transforms.py boundary, F8)
    (tests/test_sjoin.py, tests/test_transforms.py)."""
    return q_sjoin_counts(spark, sf_dir).join(
        q_boundary_length(spark, sf_dir), "did"
    )


def _gate_classifier_model() -> dict:
    """Deterministic dyadic-weight model for the scoring gate: weights
    k/1024 with small |k| make every margin an exact float under ANY
    summation order, so the DuckDB replay is bit-equal with no rounding
    (see operators/classifier.py score_documents link='margin'). Real
    training is pytest-covered (tests/test_classifier.py); MLlib's
    fitted coefficients are FP-order-dependent and have no cross-engine
    twin — same reasoning as the IVF kmeans gate split."""
    return {
        "weights": [((i * 37 + 11) % 41 - 20) / 1024.0 for i in range(64)],
        "intercept": 3.0 / 1024.0,
        "n_features": 64,
        "lowercase": True,
    }


def q_quality_margin(spark, sf_dir):
    """Classifier scoring over documents with the fixed gate model:
    hashed unigram+bigram buckets (md5-prefix family), linear margin."""
    from spatialpandas_spark.operators.classifier import score_documents

    return score_documents(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        _gate_classifier_model(),
        score_col="quality_margin",
        link="margin",
    ).select("doc_id", "quality_margin")


def q_doc_stats_merged(spark, sf_dir):
    """Text stats: whitespace tokens/chars/avg-word-len + BPE token
    count + classifier quality margin (fixed dyadic gate model).
    Breadcrumbs: doc_stats -> operators/text.py token_count/char_count/avg_word_length
    (tests/test_repetition.py); bpe_tokens -> operators/bpe.py
    (tests/test_bpe.py); quality_margin -> operators/classifier.py
    score_documents (tests/test_classifier.py)."""
    return (
        q_doc_stats(spark, sf_dir)
        .join(q_bpe_tokens(spark, sf_dir), "doc_id")
        .join(q_quality_margin(spark, sf_dir), "doc_id")
    )


#: deterministic 26-letter transliteration targets for the multilingual
#: gate stream (a-z, char-for-char — F.translate and DuckDB translate
#: are both character-based, so the derived text is engine-identical)
_ASCII26 = "abcdefghijklmnopqrstuvwxyz"
_XLIT26 = {
    1: "абвгдежзийклмнопрстуфхцчшщ",  # ru — Cyrillic
    2: "ابتثجحخدذرزسشصضطظعغفقكلمنه",  # ar — Arabic
    3: "的一是不了人我在有他这中大来上国个到说们为子和你地出",  # zh — CJK
    4: "αβγδεζηθικλμνξοπρστυφχψωάέ",  # el — Greek
}


def _gate_multilingual_text(max_chars: int):
    """Derived gate stream: each doc's text, lowercased and truncated
    to the model window, transliterated by doc_id % 5 into Cyrillic /
    Arabic / CJK / Greek (doc_id % 5 == 0 stays latin) — non-latin
    scripts flow through the classifier gate without touching the
    fixtures. Lower/truncate run BEFORE translate so the only
    case-folding ever applied is ASCII (engine-neutral)."""
    base = F.lower(F.substring(F.col("text"), 1, max_chars))
    out = base
    for k, to in _XLIT26.items():
        out = F.when(
            F.col("doc_id") % 5 == k, F.translate(base, _ASCII26, to)
        ).otherwise(out)
    return out


def q_lang_clf(spark, sf_dir):
    """Shipped 38-language classifier over the derived multilingual
    stream. Dyadic-quantized weights make every margin exact, so the
    DuckDB replay (same offset-binary hex table, substring-indexed)
    is bit-identical — the quality_margin trick, multiclass.
    Breadcrumbs: operators/langid.py score_langs/builtin_langid_model
    (tests/test_langid.py)."""
    from spatialpandas_spark.operators.langid import (
        builtin_langid_model,
        score_langs,
    )

    m = builtin_langid_model()
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _gate_multilingual_text(m["max_chars"]).alias("text")
    )
    return score_langs(d, m, "text", "lang_clf").select("doc_id", "lang_clf")


def q_lang_clf_gap(spark, sf_dir):
    """Calibrated abstention over the same derived multilingual stream
    (round 13, VERDICT r12 ask #6): ``min_gap=RECOMMENDED_MIN_GAP``
    relabels low-top-2-gap rows 'und' — the knob the round-12 holdout
    calibration shipped (keeps 95.1% of correct predictions, abstains
    on 73.5% of wrong ones at 0.01). The oracle replays the SAME
    integer-numerator top-2 gap through the sorted margin list (see
    :func:`_langid_pred_sql` ``min_gap``). Breadcrumbs:
    operators/langid.py score_langs min_gap / RECOMMENDED_MIN_GAP
    (tests/test_langid.py, tools/eval_langid_holdout.py)."""
    from spatialpandas_spark.operators.langid import (
        RECOMMENDED_MIN_GAP,
        builtin_langid_model,
        score_langs,
    )

    m = builtin_langid_model()
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _gate_multilingual_text(m["max_chars"]).alias("text")
    )
    return score_langs(
        d, m, "text", "lang_gap", min_gap=RECOMMENDED_MIN_GAP
    ).select("doc_id", "lang_gap")


def q_lang_segments(spark, sf_dir):
    """Per-SEGMENT classification (round 12, VERDICT r11 ask #4): each
    document becomes a two-segment page — its latin text plus a
    transliterated copy (doc_id % 4 + 1 picks the script) joined by a
    \\x1f separator — run through the REAL split+posexplode+score
    operator, then pivoted back to one row per doc
    (lang_seg0 = latin segment, lang_seg1 = transliterated segment;
    NULL where the segment was blank and dropped). Breadcrumbs:
    operators/langid.py classify_language_segments
    (tests/test_langid.py)."""
    from spatialpandas_spark.operators.langid import (
        builtin_langid_model,
        classify_language_segments,
    )

    m = builtin_langid_model()
    base = F.lower(F.substring(F.col("text"), 1, m["max_chars"]))
    xlit = base
    for k, to in _XLIT26.items():
        xlit = F.when(
            F.col("doc_id") % 4 + 1 == k, F.translate(base, _ASCII26, to)
        ).otherwise(xlit)
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(base, F.lit("\x1f"), xlit).alias("text"),
    )
    segs = classify_language_segments(d, "text", sep="\x1f", model=m)
    piv = segs.groupBy("doc_id").agg(
        F.max(
            F.when(F.col("seg_id") == 0, F.col("lang_pred"))
        ).alias("lang_seg0"),
        F.max(
            F.when(F.col("seg_id") == 1, F.col("lang_pred"))
        ).alias("lang_seg1"),
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .join(piv, "doc_id", "left")
        .select("doc_id", "lang_seg0", "lang_seg1")
    )


def q_text_signals(spark, sf_dir):
    """Language-ID (stopword heuristic + shipped classifier over the
    derived multilingual stream + per-segment classifier over a
    two-script page) + quality score per document.
    Breadcrumbs: lang_id -> operators/text.py lang_id;
    lang_clf -> operators/langid.py (tests/test_langid.py);
    lang_gap -> operators/langid.py score_langs
    min_gap=RECOMMENDED_MIN_GAP (round 13 — calibrated abstention,
    tests/test_langid.py);
    lang_seg0/lang_seg1 -> operators/langid.py
    classify_language_segments (tests/test_langid.py);
    quality_score -> operators/text.py quality_score
    (tests/test_repetition.py)."""
    return (
        q_lang_id(spark, sf_dir)
        .join(q_quality_score(spark, sf_dir), "doc_id")
        .join(q_lang_clf(spark, sf_dir), "doc_id")
        .join(q_lang_clf_gap(spark, sf_dir), "doc_id")
        .join(q_lang_segments(spark, sf_dir), "doc_id")
    )


def q_doc_quality_signals(spark, sf_dir):
    """Repetition signals + unigram-LM quality per document.
    Breadcrumbs: repetition_signals -> operators/text.py
    duplicate_line_fraction/top_ngram_fraction (tests/test_repetition.py); unigram_quality ->
    operators/lm.py unigram_fit/logprob (tests/test_bigram_lm.py)."""
    return q_repetition_signals(spark, sf_dir).join(
        q_unigram_quality(spark, sf_dir), "doc_id"
    )


def q_minhash_index_probe(spark, sf_dir):
    """Persistent MinHash-LSH dedup index probe (continuous-ingestion
    shape): index 3/4 of the documents (doc_id % 4 != 0), probe the
    remaining 1/4 as the 'new batch'. Same signature math as
    ``minhash_pairs`` — the oracle replays the split + band collisions +
    estimated-Jaccard filter in SQL; partition-pruned band scan is
    plan-asserted in tests/test_dedup_index.py."""
    import tempfile

    from spatialpandas_spark.operators.dedup_index import (
        build_minhash_index,
        dedup_against_index,
    )

    docs = _t(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="mh_idx_"), "index")
    build_minhash_index(docs.filter(F.col("doc_id") % 4 != 0), path)
    out = dedup_against_index(
        spark, path, docs.filter(F.col("doc_id") % 4 == 0), threshold=0.5
    )
    return out.select(
        F.least("new_id", "dup_of").alias("id_a"),
        F.greatest("new_id", "dup_of").alias("id_b"),
        F.round(F.col("est_jaccard"), 6).alias("jaccard"),
    )


def q_minhash_merged(spark, sf_dir):
    """MinHash-LSH candidate pairs + exact Jaccard verification + the
    persistent-index probe variant (src marks which formulation each row
    came from; the probe's jaccard column is the signature ESTIMATE, the
    pairs rows carry the exact value).

    Breadcrumbs: src='pairs' -> operators/dedup.py minhash_lsh_pairs +
    ngram_jaccard_pairs (tests/test_dedup_text.py); src='index' ->
    operators/dedup_index.py build/probe (tests/test_dedup_index.py)."""
    pairs = (
        q_minhash_pairs(spark, sf_dir)
        .join(q_jaccard_verify(spark, sf_dir), ["id_a", "id_b"])
        .withColumn("src", F.lit("pairs"))
    )
    probe = q_minhash_index_probe(spark, sf_dir).withColumn(
        "src", F.lit("index")
    )
    return pairs.unionByName(probe)


def q_user_journeys(spark, sf_dir):
    """Sessionization + conversion funnel per user.
    Breadcrumbs: user_sessions -> streaming/events.py sessionize
    batch twin (tests/test_sessionization.py); event_funnel ->
    conversion funnel over events (tests/test_events_json.py)."""
    return q_user_sessions(spark, sf_dir).join(
        q_event_funnel(spark, sf_dir), "user_id"
    )


# ---------------------------------------------------------------- contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial join of derived points into diamond polygons with
    per-polygon counts, on sf0.001."""
    return q_sjoin_counts(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ≤50 entries (the driver verifies at most 50 per round, in order);
    # the queries with the least prior driver evidence come first.
    return {
        # --- round-10 promoted streaming twin first
        "streaming_sketch": q_streaming_sketch,
        # --- round-8 new variants (kmv, wordpiece, sq8, pps)
        "decontamination": q_decontamination_merged,
        "doc_chunks": q_doc_chunks,
        "ann_topk": q_ann_topk_merged,
        "stratified_sample": q_stratified_sample,
        # --- round-7 new/promoted gates
        "training_mix": q_training_mix,
        "training_sequences": q_training_sequences,
        "unigram_encode": q_unigram_encode,
        "media_probe": q_media_probe,
        "tpch_joins": q_tpch_joins,
        # --- round-2 unchecked tail, promoted to the front
        "curation_pipeline": q_curation_pipeline,
        "dedup_clusters": q_dedup_clusters,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_index": q_ann_ivf_index,
        "embedding_near_dup": q_embedding_near_dup,
        "simhash_pairs": q_simhash_pairs,
        "events_asof": q_events_asof,
        "top_terms": q_top_terms,
        "shard_pack": q_shard_pack,
        "label_centroid_sim": q_label_centroid_sim,
        "extract_features": q_extract_features_media,
        # --- temporal / events
        "user_sessions": q_user_journeys,
        "events_hourly": q_events_hourly,
        "events_json": q_events_json,
        "interval_join": q_interval_join,
        # --- LLM-pipeline text ops
        "minhash_pairs": q_minhash_merged,
        "dedup_exact": q_dedup_exact,
        "span_dedup": q_span_dedup,
        "doc_stats": q_doc_stats_merged,
        "lang_id": q_text_signals,
        "repetition_signals": q_doc_quality_signals,
        "scrub_normalize": q_scrub_normalize,
        "length_filter": q_length_filter,
        "knn_join": q_knn_join,
        # --- spatial core
        "cx_bbox": q_cx_bbox_merged,
        "cx_refine": q_cx_refine_merged,
        "cx_read_covered": q_cx_read_covered,
        "ref_interop": q_ref_interop,
        "area_by_group": q_area_length_by_group,
        "oriented_area": q_poly_measures,
        "sjoin_inner": q_sjoin_inner_merged,
        "sjoin_left": q_sjoin_left_merged,
        "sjoin_counts": q_diamond_stats,
        "sjoin_poly_poly": q_sjoin_poly_poly,
        "hilbert_pack": q_hilbert_pack,
        "geom_sort": q_geom_sort,
        "wkb_roundtrip": q_wkb_roundtrip,
        "screen_batch": q_screen_batch,
        # --- relational shell
        "tpch_q1": q_tpch_q1,
        "top_orders_per_priority": q_top_orders_per_priority,
    }


def retired_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Gates retired from the 50-slot driver registry in round 7 to free
    slots for the promoted/new rows (VERDICT r6 'What's missing' #1):
    low-information singletons (geom_groupby/total_bounds, 1 row each;
    corpus_pipeline overlaps its constituent gates) and the Q3/Q5 pair
    (merged into ``tpch_joins``). Their oracle SQL stays in
    ``_base_oracle_sql`` and tests/test_retired_gates.py contract-checks
    every one of them each CI run, so no operator lost oracle-checked
    coverage — only the driver slot moved. Round 10 retired
    ``bounds_multipoint`` the same way (a pytest-redundant per-row
    measure: F3 coverage also flows through area_by_group/oriented_area
    and tests/test_measures.py) to free the slot the promoted
    ``streaming_sketch`` twin now holds (VERDICT r9 ask #3). Round 11
    retired ``fillna_points`` (pytest-redundant: the transforms battery
    + tests/test_degenerate_contracts.py cover P8 fill/pad) to free the
    slot the promoted ``screen_batch`` streaming twin now holds
    (VERDICT r10 ask #4)."""
    return {
        "fillna_points": q_fillna_merged,
        "bounds_multipoint": q_bounds_multipoint,
        "total_bounds": q_total_bounds,
        "geom_groupby": q_geom_groupby,
        "corpus_pipeline": q_corpus_pipeline,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
    }


def retired_oracle_sql() -> dict[str, str]:
    """Oracle twins for :func:`retired_queries` (same base SQL the driver
    used through round 6; ``fillna_points`` keeps the exact variant
    union the driver checked through round 10)."""
    o = _base_oracle_sql()
    out = {k: o[k] for k in retired_queries() if k in o}
    out["fillna_points"] = (
        f"SELECT x.*, 'value' AS variant FROM ({o['fillna_points']}) x "
        f"UNION ALL SELECT y.*, 'pad' AS variant FROM ({o['fillna_pad']}) y"
    )
    return out


def _hilbert_oracle_sql(p: int = 10) -> str:
    """Pure-SQL Skilling transform (J. Skilling, AIP Conf. Proc. 707, 2004)
    as a generated CTE chain — an independent DuckDB re-implementation of
    ``functions/hilbert.py`` for the gate. Grid discretization mirrors
    ``_data2coord`` exactly: trunc((v - lo) * (side / (hi - lo))) clipped to
    [0, side-1], with a degenerate range widened to 1.0."""
    side = 1 << p

    def grid(v: str, lo: str, hi: str) -> str:
        rng = f"(CASE WHEN {hi} = {lo} THEN 1.0 ELSE {hi} - {lo} END)"
        return (
            f"CAST(LEAST(GREATEST(TRUNC((p.{v} - tb.{lo}) * ({side}.0 / {rng})), 0.0), "
            f"{side - 1}.0) AS BIGINT)"
        )

    ctes = [
        f"pts AS ({_POINTS_SQL})",
        "tb AS (SELECT MIN(x) AS bx0, MIN(y) AS by0, MAX(x) AS bx1, MAX(y) AS by1 FROM pts)",
        (
            "g0 AS (SELECT id, "
            + grid("x", "bx0", "bx1") + " AS x, "
            + grid("y", "by0", "by1") + " AS y FROM pts p CROSS JOIN tb)"
        ),
    ]
    prev, i, q = "g0", 0, side >> 1
    while q > 1:  # inverse-undo-excess-work loop, q = 2^(p-1) .. 2
        m = q - 1
        ctes.append(
            f"s{i}a AS (SELECT id, CASE WHEN (x & {q}) != 0 THEN xor(x, {m}) "
            f"ELSE x END AS x, y FROM {prev})"
        )
        ctes.append(
            f"s{i}b AS (SELECT id, x, y, CASE WHEN (y & {q}) != 0 THEN 0 "
            f"ELSE xor(x, y) & {m} END AS t FROM s{i}a)"
        )
        ctes.append(
            f"s{i}c AS (SELECT id, CASE WHEN (y & {q}) != 0 THEN xor(x, {m}) "
            f"ELSE xor(x, t) END AS x, xor(y, t) AS y FROM s{i}b)"
        )
        prev, i, q = f"s{i}c", i + 1, q >> 1
    ctes.append(f"ga AS (SELECT id, x, xor(y, x) AS y FROM {prev})")
    t_expr, q = "0", side >> 1
    while q > 1:  # gray-encode correction accumulator (XOR-commutative)
        t_expr = f"xor({t_expr}, CASE WHEN (y & {q}) != 0 THEN {q - 1} ELSE 0 END)"
        q >>= 1
    ctes.append(f"gb AS (SELECT id, x, y, {t_expr} AS t FROM ga)")
    ctes.append("gc AS (SELECT id, xor(x, t) AS x, xor(y, t) AS y FROM gb)")
    h_terms = " + ".join(
        f"(((x >> {b}) & 1) << {2 * b + 1}) + (((y >> {b}) & 1) << {2 * b})"
        for b in range(p)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, CAST({h_terms} AS BIGINT) AS hilbert_distance FROM gc"
    )


def _shingle_cte(shingle_n: int) -> str:
    """Distinct word n-gram shingles per document (mirrors
    ``operators/dedup.py word_shingles`` / the Arrow kernel tokenizer)."""
    return f"""
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[u.i:u.i+{shingle_n - 1}], ' ') AS s
  FROM (SELECT doc_id, {_TOKS} AS tk FROM documents WHERE trim(text) != '') t,
       UNNEST(range(1, len(tk) - {shingle_n - 2})) AS u(i)
)"""


def _kmv_oracle_sql(k: int, shingle_n: int = 5, seed: int = 42) -> str:
    """SQL replay of the KMV corpus-overlap screen (the 'kmv:*' rows of
    the merged decontamination gate): the sketch is a pure function of
    the distinct shingle-hash set, so the oracle computes the EXACT
    bottom-k per side with ROW_NUMBER over the same md5-prefix hash —
    which is precisely what the engine's HLL-prefiltered path must
    equal. Estimator arithmetic mirrors operators/sketch.py op-for-op:
    est = (k-1)*H/h_k with the numerator inlined as one double literal
    (Spark constant-folds F.lit((k-1.0)) * F.lit(float(H)) the same
    way), jaccard = n_both/k_used, intersection = jaccard*union_est,
    containment = jaccard*union_est/side_est; all rounded to 6.
    Returns ``(ctes, select)`` so the caller can splice the chain into
    a WITH-bearing union (DuckDB forbids WITH after UNION ALL)."""
    from spatialpandas_spark.operators.sketch import HSPACE

    num = repr(float(k - 1) * float(HSPACE))
    n = shingle_n
    ctes = f"""ksh AS (
  SELECT DISTINCT doc_id % 2 AS side,
         array_to_string(tk[u.i:u.i+{n - 1}], ' ') AS s
  FROM (SELECT doc_id, {_TOKS} AS tk FROM documents
        WHERE trim(text) != '') t,
       UNNEST(range(1, len(tk) - {n - 2})) AS u(i)
),
khv AS (SELECT DISTINCT side,
               ('0x' || substr(md5('{seed}:' || s), 1, 15))::BIGINT AS h
        FROM ksh),
krk AS (SELECT side, h,
               ROW_NUMBER() OVER (PARTITION BY side ORDER BY h) AS rank
        FROM khv),
ska AS (SELECT CAST(rank AS BIGINT) AS rank, h FROM krk
        WHERE side = 0 AND rank <= {k}),
skb AS (SELECT CAST(rank AS BIGINT) AS rank, h FROM krk
        WHERE side = 1 AND rank <= {k}),
sa AS (SELECT COUNT(*) AS n, MAX(CASE WHEN rank = {k} THEN h END) AS kth
       FROM ska),
sb AS (SELECT COUNT(*) AS n, MAX(CASE WHEN rank = {k} THEN h END) AS kth
       FROM skb),
ku AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rank
       FROM (SELECT DISTINCT h FROM
              (SELECT h FROM ska UNION ALL SELECT h FROM skb))),
ukk AS (SELECT h, rank FROM ku WHERE rank <= {k}),
fl AS (SELECT ukk.rank, ukk.h,
              CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
              CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
       FROM ukk LEFT JOIN ska a ON ukk.h = a.h
                LEFT JOIN skb b ON ukk.h = b.h),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
              CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
              MAX(CASE WHEN rank = {k} THEN h END) AS kth
       FROM fl),
est AS (SELECT st.k_used, st.n_both,
          CASE WHEN st.k_used > 0
               THEN CAST(st.n_both AS DOUBLE) / st.k_used
               ELSE 0.0 END AS jacc,
          CASE WHEN st.k_used < {k} THEN CAST(st.k_used AS DOUBLE)
               ELSE {num} / CAST(st.kth AS DOUBLE) END AS uest,
          CASE WHEN sa.n < {k} THEN CAST(sa.n AS DOUBLE)
               ELSE {num} / CAST(sa.kth AS DOUBLE) END AS da,
          CASE WHEN sb.n < {k} THEN CAST(sb.n AS DOUBLE)
               ELSE {num} / CAST(sb.kth AS DOUBLE) END AS db
        FROM st, sa, sb)"""
    select = f"""
SELECT 'kmv:sketch_a' AS src, rank AS doc_id, h AS total_ngrams,
       CAST(NULL AS BIGINT) AS matched_ngrams,
       CAST(NULL AS DOUBLE) AS overlap
FROM ska
UNION ALL
SELECT 'kmv:sketch_b', rank, h, NULL, NULL FROM skb
UNION ALL SELECT 'kmv:k_used', k_used, NULL, NULL, NULL FROM est
UNION ALL SELECT 'kmv:n_both', n_both, NULL, NULL, NULL FROM est
UNION ALL SELECT 'kmv:jaccard', NULL, NULL, NULL, ROUND(jacc, 6) FROM est
UNION ALL SELECT 'kmv:union_est', NULL, NULL, NULL, ROUND(uest, 6) FROM est
UNION ALL SELECT 'kmv:intersection_est', NULL, NULL, NULL,
                 ROUND(jacc * uest, 6) FROM est
UNION ALL SELECT 'kmv:distinct_a_est', NULL, NULL, NULL, ROUND(da, 6)
          FROM est
UNION ALL SELECT 'kmv:distinct_b_est', NULL, NULL, NULL, ROUND(db, 6)
          FROM est
UNION ALL SELECT 'kmv:containment_a', NULL, NULL, NULL,
                 ROUND(CASE WHEN da > 0 THEN jacc * uest / da
                            ELSE 0.0 END, 6) FROM est
UNION ALL SELECT 'kmv:containment_b', NULL, NULL, NULL,
                 ROUND(CASE WHEN db > 0 THEN jacc * uest / db
                            ELSE 0.0 END, 6) FROM est
"""
    return ctes, select


def _decon_body_sql() -> str:
    """The exact per-doc benchmark-overlap set-join replay (the 'decon'
    gate variant's body), factored out because the 'bloom' variant —
    the bloom-prefiltered path, exact by construction — reuses it
    verbatim under its own tag."""
    return f"""
            WITH bench AS (
              SELECT DISTINCT array_to_string(tk[u.i:u.i+4], ' ') AS s
              FROM (SELECT {_TOKS} AS tk FROM documents
                    WHERE doc_id % 17 = 0) x,
                   UNNEST(range(1, len(tk) - 3)) AS u(i)
            ),
            train AS (SELECT doc_id, {_TOKS} AS tk FROM documents
                      WHERE doc_id % 17 != 0),
            dsh AS (
              SELECT DISTINCT doc_id, array_to_string(tk[u.i:u.i+4], ' ') AS s
              FROM train, UNNEST(range(1, len(tk) - 3)) AS u(i)
            ),
            m AS (SELECT d.doc_id, COUNT(*) AS total, COUNT(b.s) AS matched
                  FROM dsh d LEFT JOIN bench b USING (s) GROUP BY 1)
            SELECT t.doc_id,
                   CAST(COALESCE(m.total, 0) AS BIGINT) AS total_ngrams,
                   CAST(COALESCE(m.matched, 0) AS BIGINT) AS matched_ngrams,
                   CASE WHEN COALESCE(m.total, 0) > 0
                        THEN CAST(m.matched AS DOUBLE) / m.total
                        ELSE 0.0 END AS overlap
            FROM train t LEFT JOIN m USING (doc_id)
            """


def _probe_oracle_sql(pk: int, shingle_n: int = 5, seed: int = 42) -> str:
    """SQL replay of the direct containment probe (the 'probe:*' rows
    of the merged decontamination gate): the probe set is the EXACT
    bottom-``pk`` of the benchmark's distinct md5-prefix shingle hashes
    (ROW_NUMBER over the distinct hash set — same replay as the KMV
    sketch oracle), each probed hash LEFT JOINed against the corpus's
    distinct shingle-hash set for its membership flag. A pure function
    of the two shingle sets, so the engine's broadcast-semi-join
    formulation must equal it bit for bit. Returns ``(ctes, select)``
    for splicing (DuckDB forbids WITH after UNION ALL)."""
    n = shingle_n
    ctes = f"""bsh AS (
  SELECT DISTINCT array_to_string(tk[u.i:u.i+{n - 1}], ' ') AS s
  FROM (SELECT {_TOKS} AS tk FROM documents
        WHERE doc_id % 17 = 0 AND trim(text) != '') t,
       UNNEST(range(1, len(tk) - {n - 2})) AS u(i)
),
bhv AS (SELECT DISTINCT
               ('0x' || substr(md5('{seed}:' || s), 1, 15))::BIGINT AS h
        FROM bsh),
pbk AS (SELECT CAST(rank AS BIGINT) AS rank, h FROM
          (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rank FROM bhv)
        WHERE rank <= {pk}),
tsh AS (
  SELECT DISTINCT array_to_string(tk[u.i:u.i+{n - 1}], ' ') AS s
  FROM (SELECT {_TOKS} AS tk FROM documents
        WHERE doc_id % 17 != 0 AND trim(text) != '') t,
       UNNEST(range(1, len(tk) - {n - 2})) AS u(i)
),
chv AS (SELECT DISTINCT
               ('0x' || substr(md5('{seed}:' || s), 1, 15))::BIGINT AS h
        FROM tsh),
pfl AS (SELECT pbk.rank, pbk.h,
               CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS found
        FROM pbk LEFT JOIN chv c ON pbk.h = c.h),
pst AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
               CAST(SUM(found) AS BIGINT) AS nf
        FROM pfl)"""
    select = f"""
SELECT 'probe:hits' AS src, rank AS doc_id, h AS total_ngrams,
       CAST(found AS BIGINT) AS matched_ngrams,
       CAST(NULL AS DOUBLE) AS overlap
FROM pfl
UNION ALL SELECT 'probe:n_probed', np, NULL, NULL, NULL FROM pst
UNION ALL SELECT 'probe:n_found', nf, NULL, NULL, NULL FROM pst
UNION ALL SELECT 'probe:containment', NULL, NULL, NULL,
                 ROUND(CASE WHEN np > 0
                            THEN CAST(nf AS DOUBLE) / np
                            ELSE 0.0 END, 6) FROM pst
"""
    return ctes, select


def _minhash_oracle_sql(
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
    seed: int = 42,
) -> str:
    """Full SQL re-computation of MinHash-LSH candidate pairs: identical
    60-bit md5-prefix base hash, the same seeded multiply-shift family
    (constants inlined), per-band signature-slice collision, and the
    estimated-Jaccard filter. HUGEINT arithmetic & the 62-bit mask equal
    numpy's wrapped int64 & mask (low 62 bits agree)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    mask = (1 << 62) - 1
    A = rng.integers(1, 1 << 61, size=num_hashes, dtype=np.int64) * 2 + 1
    B = rng.integers(0, 1 << 61, size=num_hashes, dtype=np.int64)
    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN((CAST({int(A[j])} AS HUGEINT) * h + {int(B[j])}) & {mask}) AS m{j}"
        for j in range(num_hashes)
    )
    nmatch = " + ".join(
        f"(CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(num_hashes)
    )
    band_hit = " OR ".join(
        "("
        + " AND ".join(f"a.m{b * rows + r} = b.m{b * rows + r}" for r in range(rows))
        + ")"
        for b in range(bands)
    )
    return f"""
WITH {_shingle_cte(shingle_n)},
hv AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
sig AS (SELECT doc_id,
         {mins}
        FROM hv GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE ({band_hit})
  AND CAST({nmatch} AS DOUBLE) / {num_hashes} >= {threshold}
"""


def _minhash_index_oracle_sql(
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
    seed: int = 42,
) -> str:
    """SQL replay of the persistent-index probe: the same signature math
    as ``_minhash_oracle_sql``, with corpus membership doc_id % 4 != 0
    and batch membership doc_id % 4 = 0 (matching
    ``q_minhash_index_probe``), band-slice collision, and the rounded
    estimated-Jaccard output."""
    import numpy as np

    rng = np.random.default_rng(seed)
    mask = (1 << 62) - 1
    A = rng.integers(1, 1 << 61, size=num_hashes, dtype=np.int64) * 2 + 1
    B = rng.integers(0, 1 << 61, size=num_hashes, dtype=np.int64)
    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN((CAST({int(A[j])} AS HUGEINT) * h + {int(B[j])}) & {mask}) AS m{j}"
        for j in range(num_hashes)
    )
    nmatch = " + ".join(
        f"(CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(num_hashes)
    )
    band_hit = " OR ".join(
        "("
        + " AND ".join(f"a.m{b * rows + r} = b.m{b * rows + r}" for r in range(rows))
        + ")"
        for b in range(bands)
    )
    return f"""
WITH {_shingle_cte(shingle_n)},
hv AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
sig AS (SELECT doc_id,
         {mins}
        FROM hv GROUP BY doc_id)
SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
       GREATEST(a.doc_id, b.doc_id) AS id_b,
       ROUND(CAST({nmatch} AS DOUBLE) / {num_hashes}, 6) AS jaccard
FROM sig a JOIN sig b
  ON (a.doc_id % 4) <> 0 AND (b.doc_id % 4) = 0
WHERE ({band_hit})
  AND CAST({nmatch} AS DOUBLE) / {num_hashes} >= {threshold}
"""


def _quality_margin_oracle_sql() -> str:
    """SQL replay of classifier scoring with the fixed gate model:
    tokenization parity with ``classifier._tokens`` (split + drop empty
    strings), unigram + bigram grams, md5-prefix bucket hash, weight
    lookup via a VALUES table, exact dyadic margin sum (no rounding
    needed — see ``_gate_classifier_model``)."""
    m = _gate_classifier_model()
    wt = ", ".join(f"({i}, {w!r})" for i, w in enumerate(m["weights"]))
    return f"""
WITH q AS (
  SELECT doc_id, list_filter({_TOKS}, x -> x != '') AS tk FROM documents
),
g AS (
  SELECT doc_id, tk[u.i] AS gram
  FROM q, UNNEST(range(1, len(tk) + 1)) AS u(i)
  UNION ALL
  SELECT doc_id, tk[u.i] || ' ' || tk[u.i + 1] AS gram
  FROM q, UNNEST(range(1, len(tk))) AS u(i)
),
wt(bucket, w) AS (VALUES {wt}),
s AS (
  SELECT b.doc_id, SUM(wt.w) AS msum
  FROM (SELECT doc_id,
               ('0x' || substr(md5(gram), 1, 15))::BIGINT % {m["n_features"]}
                 AS bucket
        FROM g) b
  JOIN wt ON wt.bucket = b.bucket
  GROUP BY b.doc_id
)
SELECT q.doc_id, ({m["intercept"]!r} + COALESCE(s.msum, 0.0)) AS quality_margin
FROM q LEFT JOIN s USING (doc_id)
"""


def _langid_pred_sql(
    src_sql: str, pred_col: str, min_gap: float | None = None
) -> str:
    """SQL replay of the shipped language-ID classifier over an
    arbitrary keyed text source: ``src_sql`` must yield ``(gid, t)``
    (one row per unit to classify — whole docs for ``lang_clf``,
    segments with an encoded composite key for ``lang_segments``).
    Char 1/2/3-grams + word unigrams, md5-prefix buckets, weight
    lookup by substring-indexing the SAME offset-binary hex rows the
    model module ships, INTEGER numerator margins (exact — no floats
    anywhere), and the ordered-CASE first-max tie-break mirroring
    np.argmax. Returns SQL yielding ``(gid, {pred_col})``.

    With ``min_gap`` (round 13, VERDICT r12 ask #6): replays the
    calibrated abstention of ``score_langs(min_gap=...)`` — the
    per-feature top-2 gap ``(best - second) / n_grams``. The engine's
    float64 pipeline is exact-dyadic up to the final division
    ((n1 - n2)/DENOM is representable; / n_grams is one IEEE-rounded
    divide), so the SQL mirror — BIGINT numerators, ``/ DENOM``,
    ``/ nb``, both true-division DOUBLE — is bit-identical; the
    runner-up is the sorted margin list's second element, which
    reproduces ``np.partition``'s tie semantics (a tied max ⇒ gap 0 ⇒
    abstain)."""
    from spatialpandas_spark.operators import _langid_model as M

    langs = M.CLASSES
    # round 14: length-standardized model — margins are compared in
    # the order-equivalent integer form nb*ki + LEN_STD*s (pure BIGINT;
    # = DENOM*LEN_STD times the engine's exact-dyadic float margin
    # (nb/LEN_STD)*I + S — see operators/langid.margins_kernel)
    len_std = getattr(M, "LEN_STD", None)
    sums = ",\n         ".join(
        f"SUM(('0x' || substr('{M.WEIGHTS_HEX[c]}', b*4+1, 4))::BIGINT"
        f" - 32768) AS s_{c}"
        for c in langs
    )
    # the clamped gram count must be inlined (not the `nb` alias: in
    # the lm CTE that name would resolve to ls.nb, NULL on empty text)
    nb1 = "GREATEST(COALESCE(nb, 0), 1)"
    margins = ",\n         ".join(
        (
            f"{nb1} * {M.INTERCEPT_NUMS[i]}"
            f" + {len_std} * COALESCE(s_{c}, 0) AS m_{c}"
            if len_std is not None
            else f"{M.INTERCEPT_NUMS[i]} + COALESCE(s_{c}, 0) AS m_{c}"
        )
        for i, c in enumerate(langs)
    )
    gm = "GREATEST(" + ", ".join(f"m_{c}" for c in langs) + ")"
    case = " ".join(f"WHEN m_{c} = gm THEN '{c}'" for c in langs)
    pred_expr = f"CASE {case} END"
    inner_cols = "*"
    if min_gap is not None:
        mlist = "[" + ", ".join(f"m_{c}" for c in langs) + "]"
        inner_cols = (
            f"*, list_sort({mlist})[{len(langs) - 1}] AS sec"
        )
        denom = (
            M.DENOM if len_std is None else M.DENOM * len_std
        )
        pred_expr = (
            f"CASE WHEN (gm - sec) / {denom} / nb "
            f">= CAST({min_gap!r} AS DOUBLE) "
            f"THEN ({pred_expr}) ELSE 'und' END"
        )
    return f"""
WITH lsrc AS ({src_sql}),
lg AS (
  SELECT gid, substr(t, u.i, 1) AS gram
  FROM lsrc, UNNEST(range(1, len(t) + 1)) u(i)
  UNION ALL
  SELECT gid, substr(t, u.i, 2)
  FROM lsrc, UNNEST(range(1, len(t))) u(i)
  UNION ALL
  SELECT gid, substr(t, u.i, 3)
  FROM lsrc, UNNEST(range(1, len(t) - 1)) u(i)
  UNION ALL
  SELECT gid, w.w
  FROM lsrc,
       UNNEST(list_filter(str_split_regex(t, '\\s+'), x -> x != '')) w(w)
),
ls AS (
  SELECT gid,
         COUNT(*) AS nb,
         {sums}
  FROM (SELECT gid,
               ('0x' || substr(md5(gram), 1, 15))::BIGINT % {M.N_FEATURES}
                 AS b
        FROM lg)
  GROUP BY gid
),
lm AS (
  SELECT lsrc.gid,
         GREATEST(COALESCE(nb, 0), 1) AS nb,
         {margins}
  FROM lsrc LEFT JOIN ls USING (gid)
)
SELECT gid, {pred_expr} AS {pred_col}
FROM (SELECT {inner_cols}, {gm} AS gm FROM lm)
"""


def _xlit_case_sql(base: str, mod_expr: str) -> str:
    """The doc_id-keyed transliteration CASE shared by the lang_clf and
    lang_segments oracle streams."""
    whens = " ".join(
        f"WHEN {k} THEN translate({base}, '{_ASCII26}', '{v}')"
        for k, v in sorted(_XLIT26.items())
    )
    return f"CASE {mod_expr} {whens} ELSE {base} END"


def _lang_clf_oracle_sql() -> str:
    """Whole-document replay over the same derived multilingual stream
    as ``q_lang_clf`` (see :func:`_langid_pred_sql`)."""
    from spatialpandas_spark.operators import _langid_model as M

    base = f"lower(substr(text, 1, {M.MAX_CHARS}))"
    src = (
        f"SELECT doc_id AS gid, {_xlit_case_sql(base, 'doc_id % 5')} AS t"
        " FROM documents"
    )
    return (
        "SELECT gid AS doc_id, lang_clf FROM ("
        + _langid_pred_sql(src, "lang_clf")
        + ")"
    )


def _lang_clf_gap_oracle_sql() -> str:
    """The abstention twin of :func:`_lang_clf_oracle_sql`: same
    stream, same margins, plus the exact top-2-gap replay at
    ``RECOMMENDED_MIN_GAP`` (round 13, VERDICT r12 ask #6)."""
    from spatialpandas_spark.operators import _langid_model as M
    from spatialpandas_spark.operators.langid import RECOMMENDED_MIN_GAP

    base = f"lower(substr(text, 1, {M.MAX_CHARS}))"
    src = (
        f"SELECT doc_id AS gid, {_xlit_case_sql(base, 'doc_id % 5')} AS t"
        " FROM documents"
    )
    return (
        "SELECT gid AS doc_id, lang_gap FROM ("
        + _langid_pred_sql(src, "lang_gap", min_gap=RECOMMENDED_MIN_GAP)
        + ")"
    )


def _lang_segments_oracle_sql() -> str:
    """Per-segment replay of ``q_lang_segments``: the two derived
    segments (latin base, transliterated copy) are keyed
    ``gid = doc_id * 2 + seg_id``, blank segments dropped exactly as
    ``classify_language_segments(min_chars=1)`` drops them, scored by
    the same hex-table margin machinery, then pivoted back to one row
    per document (LEFT JOIN keeps empty-text docs with NULL preds)."""
    from spatialpandas_spark.operators import _langid_model as M

    base = f"lower(substr(text, 1, {M.MAX_CHARS}))"
    src = f"""
  SELECT doc_id * 2 AS gid, {base} AS t FROM documents
  WHERE length(trim({base})) >= 1
  UNION ALL
  SELECT doc_id * 2 + 1 AS gid,
         {_xlit_case_sql(base, 'doc_id % 4 + 1')} AS t
  FROM documents
  WHERE length(trim({base})) >= 1
"""
    return f"""
SELECT d.doc_id, p.lang_seg0, p.lang_seg1
FROM documents d
LEFT JOIN (
  SELECT gid // 2 AS doc_id,
         MAX(CASE WHEN gid % 2 = 0 THEN pred END) AS lang_seg0,
         MAX(CASE WHEN gid % 2 = 1 THEN pred END) AS lang_seg1
  FROM ({_langid_pred_sql(src, "pred")})
  GROUP BY 1
) p USING (doc_id)
"""


def _jaccard_oracle_sql(
    shingle_n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> str:
    """LSH candidates (same signature math as ``_minhash_oracle_sql`` with
    a trivially-true estimate filter) + exact Jaccard by shingle-set
    joins: |A∩B| from an equi-join on shingles, |A∪B| = nA + nB - |A∩B|."""
    import numpy as np

    rng = np.random.default_rng(seed)
    mask = (1 << 62) - 1
    A = rng.integers(1, 1 << 61, size=num_hashes, dtype=np.int64) * 2 + 1
    B = rng.integers(0, 1 << 61, size=num_hashes, dtype=np.int64)
    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN((CAST({int(A[j])} AS HUGEINT) * h + {int(B[j])}) & {mask}) AS m{j}"
        for j in range(num_hashes)
    )
    band_hit = " OR ".join(
        "("
        + " AND ".join(f"a.m{b * rows + r} = b.m{b * rows + r}" for r in range(rows))
        + ")"
        for b in range(bands)
    )
    return f"""
WITH {_shingle_cte(shingle_n)},
hv AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
sig AS (SELECT doc_id,
         {mins}
        FROM hv GROUP BY doc_id),
cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         WHERE ({band_hit})),
counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS ni
          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b, jaccard FROM (
    SELECT c.id_a, c.id_b,
           ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE)
                 / (ca.n + cb.n - COALESCE(i.ni, 0)), 6) AS jaccard
    FROM cand c
    JOIN counts ca ON ca.doc_id = c.id_a
    JOIN counts cb ON cb.doc_id = c.id_b
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
) WHERE jaccard >= {threshold}
"""


def _cluster_oracle_sql(
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
    seed: int = 42,
) -> str:
    """Near-dup clusters: the exact MinHash-LSH pair SQL (same constants as
    ``_minhash_oracle_sql``) closed transitively with a recursive CTE, then
    min-id cluster labels + sizes over all documents (singletons keep their
    own id)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    mask = (1 << 62) - 1
    A = rng.integers(1, 1 << 61, size=num_hashes, dtype=np.int64) * 2 + 1
    B = rng.integers(0, 1 << 61, size=num_hashes, dtype=np.int64)
    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN((CAST({int(A[j])} AS HUGEINT) * h + {int(B[j])}) & {mask}) AS m{j}"
        for j in range(num_hashes)
    )
    nmatch = " + ".join(
        f"(CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(num_hashes)
    )
    band_hit = " OR ".join(
        "("
        + " AND ".join(f"a.m{b * rows + r} = b.m{b * rows + r}" for r in range(rows))
        + ")"
        for b in range(bands)
    )
    return f"""
WITH RECURSIVE {_shingle_cte(shingle_n)},
hv AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
sig AS (SELECT doc_id,
         {mins}
        FROM hv GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE ({band_hit})
            AND CAST({nmatch} AS DOUBLE) / {num_hashes} >= {threshold}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
),
comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u),
clustered AS (
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
)
SELECT cl.doc_id, cl.cluster_id, s.cluster_size
FROM clustered cl
JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM clustered GROUP BY cluster_id) s USING (cluster_id)
"""


_SCRUB_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "text, 'https?://[^\\s]+', '<URL>', 'g'), "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'), "
    "'\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g')"
)


def _curation_oracle_sql(
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
    seed: int = 42,
    budget: int = 1000,
) -> str:
    """SQL twin of the full curation pipeline (see ``q_curation_pipeline``)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    mask = (1 << 62) - 1
    A = rng.integers(1, 1 << 61, size=num_hashes, dtype=np.int64) * 2 + 1
    B = rng.integers(0, 1 << 61, size=num_hashes, dtype=np.int64)
    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN((CAST({int(A[j])} AS HUGEINT) * h + {int(B[j])}) & {mask}) AS m{j}"
        for j in range(num_hashes)
    )
    nmatch = " + ".join(
        f"(CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(num_hashes)
    )
    band_hit = " OR ".join(
        "("
        + " AND ".join(f"a.m{b * rows + r} = b.m{b * rows + r}" for r in range(rows))
        + ")"
        for b in range(bands)
    )
    return f"""
WITH RECURSIVE clean AS (
  SELECT doc_id, lang,
         trim(regexp_replace(lower({_SCRUB_SQL}), '\\s+', ' ', 'g')) AS t
  FROM documents
),
exact AS (SELECT MIN(doc_id) AS doc_id FROM clean GROUP BY t),
ex AS (SELECT c.doc_id, c.lang, c.t FROM clean c JOIN exact e USING (doc_id)),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[u.i:u.i+{shingle_n - 1}], ' ') AS s
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(t)), '\\s+') AS tk
        FROM ex WHERE trim(t) != '') x,
       UNNEST(range(1, len(tk) - {shingle_n - 2})) AS u(i)
),
hv AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
sig AS (SELECT doc_id,
         {mins}
        FROM hv GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE ({band_hit})
            AND CAST({nmatch} AS DOUBLE) / {num_hashes} >= {threshold}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
),
comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u),
canon AS (
  SELECT e.doc_id, e.lang, e.t FROM ex e
  LEFT JOIN comp c ON e.doc_id = c.doc_id
  WHERE COALESCE(c.cluster_id, e.doc_id) = e.doc_id
),
tok AS (SELECT doc_id, lang,
          CAST(len(regexp_extract_all(t, '{_BPE_PAT_SQL}')) AS BIGINT) AS w
        FROM canon),
thr AS (SELECT lang, quantile_cont(w, 0.25) AS q FROM tok GROUP BY lang),
keepq AS (SELECT tok.doc_id, tok.lang, tok.w
          FROM tok JOIN thr ON tok.lang = thr.lang WHERE tok.w >= thr.q),
samp AS (
  SELECT * FROM keepq
  WHERE ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        % 1000000
      < CASE lang WHEN 'en' THEN 500000 ELSE 1000000 END
),
rs AS (SELECT doc_id, w,
         SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS s
       FROM samp)
SELECT CAST((s - w) // {budget} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS sum_tokens
FROM rs GROUP BY 1
"""


def _simhash_oracle_sql(
    bits: int = 60, bands: int = 8, max_hamming: int = 5, shingle_n: int = 2
) -> str:
    """SQL re-computation of SimHash pairs: same md5-prefix bit source,
    same per-bit ±1 vote, same pigeonhole band collision on fingerprint
    slices, exact hamming distance on the full bit array."""
    band_bits = bits // bands
    zeros = "[" + ", ".join("0" for _ in range(bits)) + "]"
    band_hit = " OR ".join(
        f"(a.fp[{b * band_bits + 1}:{b * band_bits + band_bits}] = "
        f"b.fp[{b * band_bits + 1}:{b * band_bits + band_bits}])"
        for b in range(bands)
    )
    ham = f"len(list_filter(range(1, {bits + 1}), i -> a.fp[i] != b.fp[i]))"
    return f"""
WITH {_shingle_cte(shingle_n)},
hv AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS v FROM sh),
bitsum AS (
  SELECT doc_id, u.b AS b,
         SUM(CASE WHEN (v >> u.b) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM hv, UNNEST(range(0, {bits})) AS u(b)
  GROUP BY doc_id, u.b
),
fp0 AS (SELECT doc_id, list(CASE WHEN c > 0 THEN 1 ELSE 0 END ORDER BY b) AS fp
        FROM bitsum GROUP BY doc_id),
fp AS (SELECT d.doc_id, COALESCE(f.fp, {zeros}) AS fp
       FROM documents d LEFT JOIN fp0 f ON d.doc_id = f.doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST({ham} AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE ({band_hit}) AND {ham} <= {max_hamming}
"""


_ISO_E_SQL = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"

# DuckDB twin of __spark_entry__._clustered_vecs: exact integer-hash
# arithmetic -> bit-identical doubles in both engines (verified row-equal)
_CLUSTERED_E_SQL = """
SELECT vec_id,
  list_transform(range(0, 64), i ->
     ((CAST(label AS BIGINT)*73856093 + i*19349663) % 2000001)/1000000.0 - 1.0
     + 0.15 * (((CAST(vec_id AS BIGINT)*1103515245 + i*12345 + 54321)
                % 2000001)/1000000.0 - 1.0)
  ) AS v
FROM embeddings"""


def _sq8_oracle_sql(k: int = 5) -> str:
    """SQL replay of the FULL SQ8 pipeline on the clustered twin:
    sequential-fold normalization, per-dim MIN/MAX, half-up codes via
    floor(x+0.5), dequantize, sequential-fold ADC sims, rank. Every op
    mirrors operators/sq.py one-for-one (the engine's numpy kernels use
    the _seq_dot fold and floor(x+0.5) precisely so this replay is
    bit-exact on the lossy path)."""
    d = _CLUSTER_DIM
    return f"""
        WITH cvx AS ({_CLUSTERED_E_SQL}),
        nrm AS (SELECT vec_id,
                       list_transform(v, x ->
                         x / sqrt(list_dot_product(v, v))) AS vn
                FROM cvx),
        dmm AS (SELECT u.i AS j, MIN(vn[u.i]) AS lo, MAX(vn[u.i]) AS hi
                FROM nrm, UNNEST(range(1, {d} + 1)) AS u(i)
                GROUP BY u.i),
        prm AS (SELECT list(lo ORDER BY j) AS lo,
                       list(CASE WHEN hi = lo THEN 1.0
                                 ELSE (hi - lo) / 255.0 END ORDER BY j)
                         AS sc
                FROM dmm),
        xh AS (SELECT vec_id,
                      list_transform(range(1, {d} + 1), j ->
                        prm.lo[j] + LEAST(255.0, GREATEST(0.0,
                          floor((vn[j] - prm.lo[j]) / prm.sc[j] + 0.5)))
                        * prm.sc[j]) AS xhat
               FROM nrm, prm),
        qv AS (SELECT vec_id AS qid, vn AS qn FROM nrm WHERE vec_id < 5)
        SELECT qid, vec_id, ROUND(sim, 6) AS sim, rk AS rank FROM (
          SELECT qv.qid, xh.vec_id,
                 list_dot_product(xh.xhat, qv.qn) AS sim,
                 ROW_NUMBER() OVER (PARTITION BY qv.qid
                                    ORDER BY sim DESC, xh.vec_id) AS rk
          FROM qv CROSS JOIN xh
        ) WHERE rk <= {k}
    """


def _ivfsq8_oracle_sql(
    k: int = 5, n_centroids: int = 16, n_probe: int = 4
) -> str:
    """SQL replay of the persistent IVF-SQ8 probe on the clustered
    twin: the IVF replay's centroid sample / max-cosine assignment /
    probe ranking (cos DESC, ci DESC — _ivf_oracle_sql) composed with
    the SQ8 replay's normalize / MIN-MAX train / half-up dequantize /
    sequential-fold ADC sims (_sq8_oracle_sql). Every op mirrors
    operators/similarity_index.py query_ivfsq8_index one-for-one, so
    the LOSSY bucket-pruned int8 pipeline is hash-exact end to end."""
    d = _CLUSTER_DIM

    def cos(a: str, b: str) -> str:
        return (
            f"CASE WHEN sqrt(list_dot_product({a},{a})) > 0 "
            f"AND sqrt(list_dot_product({b},{b})) > 0 "
            f"THEN list_dot_product({a},{b}) / "
            f"(sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))) "
            f"ELSE 0.0 END"
        )

    return f"""
WITH e AS ({_CLUSTERED_E_SQL}),
cent AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) AS ci, cv FROM
  (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, v AS cv FROM e
   ORDER BY 1, 2 LIMIT {n_centroids})
),
asg AS (
  SELECT vec_id, ci FROM (
    SELECT e.vec_id, c.ci,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos('e.v', 'c.cv')} DESC, c.ci ASC) AS rk
    FROM e CROSS JOIN cent c) WHERE rk = 1
),
nrm AS (SELECT vec_id,
               list_transform(v, x ->
                 x / sqrt(list_dot_product(v, v))) AS vn
        FROM e),
dmm AS (SELECT u.i AS j, MIN(vn[u.i]) AS lo, MAX(vn[u.i]) AS hi
        FROM nrm, UNNEST(range(1, {d} + 1)) AS u(i)
        GROUP BY u.i),
prm AS (SELECT list(lo ORDER BY j) AS lo,
               list(CASE WHEN hi = lo THEN 1.0
                         ELSE (hi - lo) / 255.0 END ORDER BY j) AS sc
        FROM dmm),
xh AS (SELECT vec_id,
              list_transform(range(1, {d} + 1), j ->
                prm.lo[j] + LEAST(255.0, GREATEST(0.0,
                  floor((vn[j] - prm.lo[j]) / prm.sc[j] + 0.5)))
                * prm.sc[j]) AS xhat
       FROM nrm, prm),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
qn AS (SELECT vec_id AS qid, vn AS qn FROM nrm WHERE vec_id < 5),
pr AS (
  SELECT qid, ci FROM (
    SELECT q.qid, c.ci,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {cos('q.qv', 'c.cv')} DESC, c.ci DESC) AS rk
    FROM q CROSS JOIN cent c) WHERE rk <= {n_probe}
),
sims AS (
  SELECT pr.qid, a.vec_id, list_dot_product(xh.xhat, qn.qn) AS sim
  FROM pr JOIN asg a ON pr.ci = a.ci
  JOIN qn ON pr.qid = qn.qid JOIN xh ON a.vec_id = xh.vec_id
)
SELECT qid, vec_id, ROUND(sim, 6) AS sim, CAST(rk AS BIGINT) AS rank FROM (
  SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
  FROM sims) WHERE rk <= {k}
"""


def _bf_oracle_sql(e_sql: str = _ISO_E_SQL, k: int = 5) -> str:
    """Brute-force cosine top-k replay over any (vec_id, v) source CTE."""
    return f"""
        SELECT qid, vec_id, ROUND(sim, 6) AS sim, rk AS rank FROM (
            SELECT q.vec_id AS qid, c.vec_id AS vec_id,
                   CASE WHEN sqrt(list_dot_product(q.v, q.v)) > 0
                             AND sqrt(list_dot_product(c.v, c.v)) > 0
                        THEN list_dot_product(q.v, c.v)
                             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
                        ELSE 0.0 END AS sim,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY sim DESC, c.vec_id) AS rk
            FROM (SELECT * FROM ({e_sql}) WHERE vec_id < 5) q
            CROSS JOIN ({e_sql}) c
        ) WHERE rk <= {k}
    """


def _ivf_oracle_sql(
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    e_sql: str = _ISO_E_SQL,
) -> str:
    """SQL replay of IVF top-k: md5-ordered centroid sample, max-cosine
    bucket assignment (first index wins ties), per-query top-n_probe
    centroids (index DESC on ties, mirroring sort_array desc on (d, i)
    structs), exact cosine re-rank of probed buckets. ``e_sql`` supplies
    the (vec_id, v) source — the raw embeddings by default, or the
    clustered deterministic twin (_CLUSTERED_E_SQL)."""

    def cos(a: str, b: str) -> str:
        return (
            f"CASE WHEN sqrt(list_dot_product({a},{a})) > 0 "
            f"AND sqrt(list_dot_product({b},{b})) > 0 "
            f"THEN list_dot_product({a},{b}) / "
            f"(sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))) "
            f"ELSE 0.0 END"
        )

    return f"""
WITH e AS ({e_sql}),
cent AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) AS ci, cv FROM
  (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, v AS cv FROM e
   ORDER BY 1, 2 LIMIT {n_centroids})
),
asg AS (
  SELECT vec_id, ci FROM (
    SELECT e.vec_id, c.ci,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos('e.v', 'c.cv')} DESC, c.ci ASC) AS rk
    FROM e CROSS JOIN cent c) WHERE rk = 1
),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
pr AS (
  SELECT qid, ci FROM (
    SELECT q.qid, c.ci,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {cos('q.qv', 'c.cv')} DESC, c.ci DESC) AS rk
    FROM q CROSS JOIN cent c) WHERE rk <= {n_probe}
),
sims AS (
  SELECT pr.qid, a.vec_id, {cos('q.qv', 'e.v')} AS sim
  FROM pr JOIN asg a ON pr.ci = a.ci
  JOIN q ON pr.qid = q.qid JOIN e ON a.vec_id = e.vec_id
)
SELECT qid, vec_id, ROUND(sim, 6) AS sim, CAST(rk AS BIGINT) AS rank FROM (
  SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
  FROM sims) WHERE rk <= {k}
"""


_EN = "'the','and','of','to','in','is','that','it','was','for'"
_DE = "'der','die','das','und','ist','nicht','ein','mit','für','von'"
_FR = "'le','la','les','et','est','pas','un','une','pour','dans'"
_ES = "'el','la','los','las','es','no','un','una','por','para'"

def _embedding_near_dup_oracle_sql(
    threshold: float = 0.3, bits: int = 16, bands: int = 4
) -> str:
    """DuckDB twin of ``embedding_near_dup_pairs``: the seeded hyperplanes
    are embedded as literal DOUBLE[] values (full repr precision), the
    sign signature is the same bit-packing, and band keys use the same
    shift/mask arithmetic."""
    from spatialpandas_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, bits, seed=42)
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    plits = ", ".join(
        f"({b}, [{', '.join(repr(float(x)) for x in plane)}]::DOUBLE[])"
        for b, plane in enumerate(planes)
    )
    bandvals = ", ".join(f"({b})" for b in range(bands))
    cos = (
        "CASE WHEN sqrt(list_dot_product(a.v, a.v)) > 0 "
        "AND sqrt(list_dot_product(b.v, b.v)) > 0 "
        "THEN list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) "
        "ELSE 0.0 END"
    )
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sig AS (
            SELECT e.vec_id, e.v,
                   CAST(SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                            THEN (1::BIGINT << p.b) ELSE 0 END) AS BIGINT) AS sig
            FROM e CROSS JOIN (VALUES {plits}) p(b, plane)
            GROUP BY e.vec_id, e.v
        ),
        banded AS (
            SELECT vec_id, v, band,
                   (sig >> (band * {band_bits})) & {mask} AS key
            FROM sig CROSS JOIN (VALUES {bandvals}) bb(band)
        )
        SELECT id_a, id_b, ROUND(sim, 6) AS sim FROM (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS sim
            FROM banded a
            JOIN banded b
              ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
        ) WHERE sim >= {threshold}
    """


def _semantic_pairs_oracle_sql(
    n_clusters: int = 16, threshold: float = 0.3
) -> str:
    """DuckDB twin of ``semantic_dedup_pairs`` at ``kmeans_iters=0``:
    md5-ordered centroid sample + max-cosine assignment (the same
    ``cent``/``asg`` replay as the IVF gates), then exact cosine over
    same-cluster (id_a < id_b) pairs above the threshold."""

    def cos(a: str, b: str) -> str:
        return (
            f"CASE WHEN sqrt(list_dot_product({a},{a})) > 0 "
            f"AND sqrt(list_dot_product({b},{b})) > 0 "
            f"THEN list_dot_product({a},{b}) / "
            f"(sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))) "
            f"ELSE 0.0 END"
        )

    return f"""
WITH e AS ({_ISO_E_SQL}),
cent AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) AS ci, cv FROM
  (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, v AS cv FROM e
   ORDER BY 1, 2 LIMIT {n_clusters})
),
asg AS (
  SELECT vec_id, ci FROM (
    SELECT e.vec_id, c.ci,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos('e.v', 'c.cv')} DESC, c.ci ASC) AS rk
    FROM e CROSS JOIN cent c) WHERE rk = 1
)
SELECT id_a, id_b, ROUND(sim, 6) AS sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos('ea.v', 'eb.v')} AS sim
  FROM asg a JOIN asg b ON a.ci = b.ci AND a.vec_id < b.vec_id
  JOIN e ea ON a.vec_id = ea.vec_id
  JOIN e eb ON b.vec_id = eb.vec_id
) WHERE sim >= {threshold}
"""


_EVENTS_EDGES_SQL = """SELECT DISTINCT user_id AS src,
                        CAST(json_extract(props, '$.k') AS BIGINT)
                          + 10000000 AS dst
                 FROM events
                 WHERE json_extract(props, '$.k') IS NOT NULL"""


def _jpeg_vals_sql() -> str:
    """The jpeg-gate constant-gray value table as a DuckDB list
    literal — shared by the 'jpeg', 'probe', and (keyed through the
    AVI container) 'avi' oracle blocks."""
    return "[" + ", ".join(f"{v}.0" for v in _JPEG_GATE_VALUES) + "]"


def _jpeg_probe_oracle_sql() -> str:
    """Closed-form oracle blocks for the 'jpeg' and 'probe' variants of
    the media gate. 'jpeg': constant-gray payloads decode to their pixel
    value exactly (DC-only blocks, unit quant tables). 'probe': header
    fields derived from the payload constructions themselves — PPM/PNG
    are 4x4, JPEG 8x8, WAV mono 8-bit 8 kHz 16 samples; byte lengths
    come from the very hex blobs / builders the Spark side embeds."""
    vals = _jpeg_vals_sql()
    jpeg_lens = "[" + ", ".join(
        str(len(h) // 2) for h in _JPEG_GATE_HEX
    ) + "]"
    png_lens = "[" + ", ".join(
        str(len(h) // 2) for h in _png_gate_hexes()
    ) + "]"
    bmp_lens = "[" + ", ".join(
        str(len(h) // 2) for h in _bmp_gate_hexes()
    ) + "]"
    return f"""
            SELECT media_id,
                   v AS mean_r, v AS mean_g, v AS mean_b,
                   v AS min_r, v AS min_g, v AS min_b,
                   v AS max_r, v AS max_g, v AS max_b,
                   gt AS fgt_r, gt AS fgt_g, gt AS fgt_b,
                   'ok' AS decode_ok, 'jpeg' AS variant
            FROM (
              SELECT p_partkey AS media_id,
                     ({vals})[p_partkey % 8 + 1] AS v,
                     CASE WHEN ({vals})[p_partkey % 8 + 1] > 64
                          THEN 1.0 ELSE 0.0 END AS gt
              FROM part)
            UNION ALL
            SELECT p_partkey AS media_id,
                   CASE p_partkey % 7 WHEN 1 THEN 0.0
                        WHEN 3 THEN 8.0 WHEN 6 THEN 8.0
                        ELSE 4.0 END AS mean_r,
                   CASE p_partkey % 7 WHEN 1 THEN 0.0
                        WHEN 3 THEN 8.0 WHEN 6 THEN 8.0
                        ELSE 4.0 END AS mean_g,
                   CASE p_partkey % 7 WHEN 1 THEN 8000.0
                        WHEN 6 THEN 5.0 ELSE 0.0 END AS mean_b,
                   CASE p_partkey % 7 WHEN 1 THEN 1.0
                        WHEN 6 THEN 1.0 ELSE 0.0 END AS min_r,
                   CASE p_partkey % 7 WHEN 1 THEN 16.0
                        WHEN 6 THEN 2.0 ELSE 0.0 END AS min_g,
                   CASE p_partkey % 7
                        WHEN 0 THEN 59.0
                        WHEN 1 THEN 60.0
                        WHEN 2 THEN CAST(({png_lens})[p_partkey % 8 + 1]
                                         AS DOUBLE)
                        WHEN 3 THEN CAST(({jpeg_lens})[p_partkey % 8 + 1]
                                         AS DOUBLE)
                        WHEN 4 THEN CAST(({bmp_lens})[p_partkey % 8 + 1]
                                         AS DOUBLE)
                        WHEN 5 THEN 13.0
                        ELSE {len(_avi_gate_hex()) // 2}.0 END AS min_b,
                   0.0 AS max_r, 0.0 AS max_g, 0.0 AS max_b,
                   0.0 AS fgt_r, 0.0 AS fgt_g, 0.0 AS fgt_b,
                   'ok:' || (['ppm', 'wav', 'png', 'jpeg', 'bmp', 'gif',
                              'avi'])
                            [p_partkey % 7 + 1] AS decode_ok,
                   'probe' AS variant
            FROM part"""


#: closed-form replay of the 'linkpr' gate's synthesized page links:
#: each document's page on host h{doc_id%7}.test carries absolute,
#: uppercase-scheme, and protocol-relative hrefs to the three formula
#: hosts plus the sink; the relative href resolves to the page's own
#: host (self-edge, dropped — matching host_link_edges) and the
#: in-script href must NOT contribute (skip{...}.test never appears).
_LINK_EDGES_SQL = """
    SELECT DISTINCT src, dst FROM (
      SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.test' AS src,
             'h' || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) || '.test' AS dst
      FROM documents
      UNION ALL
      SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.test',
             'h' || CAST((doc_id * 5 + 2) % 7 AS VARCHAR) || '.test'
      FROM documents
      UNION ALL
      SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.test',
             'h' || CAST((doc_id + 1) % 7 AS VARCHAR) || '.test'
      FROM documents
      UNION ALL
      SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.test', 'sink.test'
      FROM documents
    ) WHERE src != dst"""


def _pagerank_oracle_sql(
    edges_sql: str = _EVENTS_EDGES_SQL, iters: int = 5, damping: float = 0.85
) -> str:
    """Fixed-iteration PageRank as a generated CTE chain — an
    independent DuckDB replay of ``operators/graph.py pagerank`` (the
    same precedent as ``_hilbert_oracle_sql``: a closed-form SQL replay
    of an iterative operator), parameterized by the edge derivation so
    the events-interaction graph ('pr' variant) and the crawl host
    link graph ('linkpr' variant) share one replay. Out-degree
    weights, per-round dangling-mass redistribution, and the damped
    update are each one CTE per iteration; the literal ``(1.0 - d)``
    matches the Spark side's Python-computed ``(1.0 - damping)`` IEEE
    ops exactly."""
    d = repr(damping)
    ctes = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS dg FROM e GROUP BY src)",
        "ew AS (SELECT src, dst, 1.0 / dg AS w FROM e JOIN deg USING (src))",
        """dang AS (SELECT node FROM nodes LEFT JOIN deg ON node = src
                    WHERE src IS NULL)""",
        "r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)",
    ]
    for i in range(iters):
        ctes.append(
            f"dm{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm "
            f"FROM r{i} JOIN dang USING (node))"
        )
        ctes.append(
            f"c{i} AS (SELECT dst AS node, SUM(rank * w) AS cin "
            f"FROM r{i} JOIN ew ON r{i}.node = ew.src GROUP BY dst)"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT nodes.node, "
            f"(1.0 - {d}) / n + {d} * (COALESCE(cin, 0.0) + dm / n) AS rank "
            f"FROM nodes LEFT JOIN c{i} USING (node) "
            f"CROSS JOIN dm{i} CROSS JOIN nn)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(node AS VARCHAR) AS k, ROUND(rank, 9) AS val "
        f"FROM r{iters}"
    )


_TOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def _span_content_oracle_block(min_span_tokens: int = 1) -> str:
    """DuckDB replay of content-defined span dedup (window prefix-sum
    boundary derivation). ``min_span_tokens > 1`` adds the r12
    minimum-match-length guard ON THE COUNTING CTE ONLY — short spans
    are kept verbatim and never counted, mirroring
    ``remove_duplicate_spans(min_span_tokens=)`` (identical text ⇒
    identical length, so the anti-join stays safe)."""
    guard = (
        f"WHERE len(str_split(s, ' ')) >= {min_span_tokens} "
        if min_span_tokens > 1
        else ""
    )
    return f"""
              WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents
                         WHERE text IS NOT NULL AND trim(text) != ''),
              tok AS (SELECT doc_id, u.i AS pos, tk[u.i] AS tkn
                      FROM t, UNNEST(range(1, len(tk) + 1)) AS u(i)),
              -- content-defined boundaries: span_id(pos) = number of
              -- boundary tokens strictly before pos (window prefix-sum)
              sp AS (SELECT doc_id, pos, tkn,
                            COALESCE(SUM(CASE WHEN
                              ('0x' || substr(md5(tkn), 1, 15))::BIGINT
                                % 8 = 0 THEN 1 ELSE 0 END)
                              OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS sid
                     FROM tok),
              w AS (SELECT doc_id, sid,
                           string_agg(tkn, ' ' ORDER BY pos) AS s
                    FROM sp GROUP BY doc_id, sid),
              c AS (SELECT s FROM w {guard}
                    GROUP BY s HAVING COUNT(*) >= 2),
              k AS (SELECT doc_id, sid, s FROM w ANTI JOIN c USING (s)),
              r AS (SELECT doc_id, COUNT(*) AS kept,
                           string_agg(s, ' ' ORDER BY sid) AS txt
                    FROM k GROUP BY doc_id)
              SELECT d.doc_id,
                     CAST(COALESCE(r.kept, 0) AS BIGINT) AS kept_spans,
                     md5(COALESCE(r.txt, '')) AS text_md5
              FROM documents d LEFT JOIN r USING (doc_id)
"""

# BPE pretokenizer pattern with SQL-escaped quotes (same regex the engine
# uses; lookahead-free so RE2 and Java agree)
from spatialpandas_spark.operators.text import BPE_TOKEN_PATTERN as _BPE_PAT

_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")


def _hits(words: str) -> str:
    return f"len(list_filter({_TOKS}, t -> t IN ({words})))"


def _base_oracle_sql() -> dict[str, str]:
    diamonds = _DIAMONDS_SQL
    points = _POINTS_SQL
    poly_area = (
        "SELECT p_brand AS brand, "
        " 2.0*r*r - 2.0*(r/2)*(r/2) AS a FROM ("
        "SELECT p_brand, CAST(p_partkey % 5 + 1 AS DOUBLE) AS r FROM part)"
    )
    return {
        "cx_bbox": f"""
            SELECT id, x, y FROM ({points})
            WHERE x >= 10.0 AND x <= 50.0 AND y >= 8.0 AND y <= 72.0
        """,
        "cx_bbox_inverted": f"""
            SELECT id, x, y FROM ({points})
            WHERE x >= 10.0 AND x <= 50.0 AND y >= 8.0 AND y <= 72.0
        """,
        "ref_interop": f"""
            SELECT id, x, y FROM ({points})
            WHERE x >= 10.0 AND x <= 40.0 AND y >= 8.0 AND y <= 72.0
        """,
        "cx_read_covered": f"""
            SELECT id, x, y FROM ({points})
            WHERE x >= 10.0 AND x <= 70.0 AND y >= 8.0 AND y <= 80.0
        """,
        "area_by_group": f"""
            SELECT brand, SUM(a) AS sum_area, COUNT(*) AS n
            FROM ({poly_area}) GROUP BY brand
        """,
        "length_by_group": """
            SELECT brand, ROUND(SUM(4*SQRT(2*r*r) + 4*SQRT(2*(r/2)*(r/2))), 4) AS sum_len
            FROM (SELECT p_brand AS brand, CAST(p_partkey % 5 + 1 AS DOUBLE) AS r FROM part)
            GROUP BY brand
        """,
        "bounds_multipoint": """
            SELECT o_orderkey AS id,
                   LEAST(x1, x2, x3) AS x0, LEAST(y1, y2, y3) AS y0,
                   GREATEST(x1, x2, x3) AS x1, GREATEST(y1, y2, y3) AS y1
            FROM (SELECT o_orderkey,
                   CAST(o_orderkey % 101 AS DOUBLE) AS x1,
                   CAST(o_orderkey % 37 AS DOUBLE) AS y1,
                   CAST(o_custkey % 53 AS DOUBLE) AS x2,
                   CAST(o_custkey % 29 AS DOUBLE) AS y2,
                   CAST((o_orderkey + o_custkey) % 71 AS DOUBLE) AS x3,
                   CAST((o_orderkey + o_custkey) % 43 AS DOUBLE) AS y3
                  FROM orders)
        """,
        "total_bounds": f"""
            SELECT MIN(x) AS x0, MIN(y) AS y0, MAX(x) AS x1, MAX(y) AS y1
            FROM ({points})
        """,
        "cx_lines": """
            SELECT id FROM (
                SELECT o_orderkey AS id,
                       CAST(o_orderkey % 101 AS DOUBLE) AS ax,
                       CAST(o_orderkey % 97 AS DOUBLE) AS ay,
                       CAST(o_custkey % 89 AS DOUBLE) AS bx,
                       CAST(o_custkey % 83 AS DOUBLE) AS by
                FROM orders)
            WHERE LEAST(ax, bx) <= 40.0 AND GREATEST(ax, bx) >= 20.0
              AND LEAST(ay, by) <= 35.0 AND GREATEST(ay, by) >= 20.0
              AND LEAST((bx-ax)*(20.0-ay) - (by-ay)*(20.0-ax),
                        (bx-ax)*(20.0-ay) - (by-ay)*(40.0-ax),
                        (bx-ax)*(35.0-ay) - (by-ay)*(20.0-ax),
                        (bx-ax)*(35.0-ay) - (by-ay)*(40.0-ax)) <= 0
              AND GREATEST((bx-ax)*(20.0-ay) - (by-ay)*(20.0-ax),
                           (bx-ax)*(20.0-ay) - (by-ay)*(40.0-ax),
                           (bx-ax)*(35.0-ay) - (by-ay)*(20.0-ax),
                           (bx-ax)*(35.0-ay) - (by-ay)*(40.0-ax)) >= 0
        """,
        "cx_diamonds": """
            SELECT p_partkey AS id FROM (
                SELECT p_partkey,
                       CAST(p_partkey % 120 AS DOUBLE) AS cx,
                       CAST(p_size * 2 AS DOUBLE) AS cy
                FROM part)
            WHERE GREATEST(0.0, 30.0 - cx, cx - 60.0)
                + GREATEST(0.0, 20.0 - cy, cy - 44.0) <= 7.5
        """,
        "oriented_area": """
            SELECT p_partkey AS id,
                   2.0 * r * r AS area
            FROM (SELECT p_partkey, CAST(p_partkey % 5 + 1 AS DOUBLE) AS r FROM part)
        """,
        "centroid": """
            SELECT p_partkey AS id,
                   ROUND(cx, 6) AS px, ROUND(cy, 6) AS py,
                   ROUND((r*(2*cx + r)/2 + 2*r*(cx + r)) / (3*r), 6) AS lx,
                   ROUND((r*cy + 2*r*(cy + r)) / (3*r), 6) AS ly
            FROM (SELECT p_partkey,
                         CAST(p_partkey % 50 AS DOUBLE) AS cx,
                         CAST(p_size * 2 AS DOUBLE) AS cy,
                         CAST(p_partkey % 5 + 1 AS DOUBLE) AS r
                  FROM part)
        """,
        "boundary_length": """
            SELECT did, ROUND(4 * SQRT(2 * 12.5 * 12.5), 6) AS blen
            FROM (SELECT n_nationkey AS did FROM nation)
        """,
        "fillna_points": """
            SELECT c_custkey AS id,
                   CASE WHEN c_custkey % 10 = 0 THEN 0.0
                        ELSE CAST(c_custkey % 97 AS DOUBLE) END AS x,
                   CASE WHEN c_custkey % 10 = 0 THEN 0.0
                        ELSE CAST(c_nationkey * 4 AS DOUBLE) END AS y
            FROM customer
        """,
        "fillna_pad": """
            SELECT id,
                   last_value(x IGNORE NULLS) OVER
                       (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x,
                   last_value(y IGNORE NULLS) OVER
                       (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y
            FROM (SELECT c_custkey AS id,
                         CASE WHEN c_custkey % 5 = 0 THEN NULL
                              ELSE CAST(c_custkey % 97 AS DOUBLE) END AS x,
                         CASE WHEN c_custkey % 5 = 0 THEN NULL
                              ELSE CAST(c_nationkey * 4 AS DOUBLE) END AS y
                  FROM customer)
        """,
        "extract_features": f"""
            WITH px AS (
              SELECT p_partkey AS media_id,
                     CAST((p_partkey*7 + u.i*5 + 0)  % 127 + 1 AS DOUBLE) AS r,
                     CAST((p_partkey*7 + u.i*5 + 11) % 127 + 1 AS DOUBLE) AS g,
                     CAST((p_partkey*7 + u.i*5 + 22) % 127 + 1 AS DOUBLE) AS b
              FROM part, UNNEST(range(0, 16)) AS u(i)
            ), au AS (
              SELECT p_partkey AS media_id,
                     CAST((p_partkey*13 + u.i*7) % 256 AS DOUBLE) AS s
              FROM part, UNNEST(range(0, 16)) AS u(i)
            ), fl AS (
              SELECT p_partkey AS media_id,
                     CAST((((p_partkey % 8)*13 + u.i*7 + 0) % 256 - 128) * 129 AS DOUBLE) AS l,
                     CAST((((p_partkey % 8)*13 + u.i*7 + 5) % 256 - 128) * 129 AS DOUBLE) AS r2
              FROM part, UNNEST(range(0, 16)) AS u(i)
            )
            SELECT media_id,
                   AVG(r) AS mean_r, AVG(g) AS mean_g, AVG(b) AS mean_b,
                   MIN(r) AS min_r, MIN(g) AS min_g, MIN(b) AS min_b,
                   MAX(r) AS max_r, MAX(g) AS max_g, MAX(b) AS max_b,
                   AVG(CASE WHEN r > 64 THEN 1.0 ELSE 0.0 END) AS fgt_r,
                   AVG(CASE WHEN g > 64 THEN 1.0 ELSE 0.0 END) AS fgt_g,
                   AVG(CASE WHEN b > 64 THEN 1.0 ELSE 0.0 END) AS fgt_b,
                   'ok' AS decode_ok, 'image' AS variant
            FROM px GROUP BY media_id
            UNION ALL
            SELECT media_id,
                   AVG(s) AS mean_r, 0.0 AS mean_g, 0.0 AS mean_b,
                   MIN(s) AS min_r, 0.0 AS min_g, 0.0 AS min_b,
                   MAX(s) AS max_r, 0.0 AS max_g, 0.0 AS max_b,
                   AVG(CASE WHEN s > 64 THEN 1.0 ELSE 0.0 END) AS fgt_r,
                   0.0 AS fgt_g, 0.0 AS fgt_b,
                   'ok' AS decode_ok, 'audio' AS variant
            FROM au GROUP BY media_id
            UNION ALL
            SELECT media_id,
                   AVG(r) AS mean_r, AVG(g) AS mean_g, AVG(b) AS mean_b,
                   MIN(r) AS min_r, MIN(g) AS min_g, MIN(b) AS min_b,
                   MAX(r) AS max_r, MAX(g) AS max_g, MAX(b) AS max_b,
                   AVG(CASE WHEN r > 64 THEN 1.0 ELSE 0.0 END) AS fgt_r,
                   AVG(CASE WHEN g > 64 THEN 1.0 ELSE 0.0 END) AS fgt_g,
                   AVG(CASE WHEN b > 64 THEN 1.0 ELSE 0.0 END) AS fgt_b,
                   'ok' AS decode_ok, 'png' AS variant
            FROM (
              SELECT p_partkey AS media_id,
                     CAST(((p_partkey % 8)*7 + u.i*5 + 0)  % 127 + 1 AS DOUBLE) AS r,
                     CAST(((p_partkey % 8)*7 + u.i*5 + 11) % 127 + 1 AS DOUBLE) AS g,
                     CAST(((p_partkey % 8)*7 + u.i*5 + 22) % 127 + 1 AS DOUBLE) AS b
              FROM part, UNNEST(range(0, 16)) AS u(i)
            ) GROUP BY media_id
            UNION ALL
            SELECT media_id,
                   AVG(l) AS mean_r, AVG(r2) AS mean_g, 0.0 AS mean_b,
                   MIN(l) AS min_r, MIN(r2) AS min_g, 0.0 AS min_b,
                   MAX(l) AS max_r, MAX(r2) AS max_g, 0.0 AS max_b,
                   AVG(CASE WHEN l > 8192 THEN 1.0 ELSE 0.0 END) AS fgt_r,
                   AVG(CASE WHEN r2 > 8192 THEN 1.0 ELSE 0.0 END) AS fgt_g,
                   0.0 AS fgt_b,
                   'ok' AS decode_ok, 'flac' AS variant
            FROM fl GROUP BY media_id
            UNION ALL
            SELECT media_id,
                   (r1+r2)/2 AS mean_r, (g1+g2)/2 AS mean_g,
                   (b1+b2)/2 AS mean_b,
                   LEAST(r1,r2) AS min_r, LEAST(g1,g2) AS min_g,
                   LEAST(b1,b2) AS min_b,
                   GREATEST(r1,r2) AS max_r, GREATEST(g1,g2) AS max_g,
                   GREATEST(b1,b2) AS max_b,
                   (CASE WHEN r1 > 64 THEN 0.5 ELSE 0.0 END
                    + CASE WHEN r2 > 64 THEN 0.5 ELSE 0.0 END) AS fgt_r,
                   (CASE WHEN g1 > 64 THEN 0.5 ELSE 0.0 END
                    + CASE WHEN g2 > 64 THEN 0.5 ELSE 0.0 END) AS fgt_g,
                   (CASE WHEN b1 > 64 THEN 0.5 ELSE 0.0 END
                    + CASE WHEN b2 > 64 THEN 0.5 ELSE 0.0 END) AS fgt_b,
                   'ok' AS decode_ok, 'avi' AS variant
            FROM (
              -- even key: MJPEG gray pair (r=g=b); odd key: DIB color
              -- pair with per-channel constants (round 14 ask #5)
              SELECT p_partkey AS media_id,
                     ({_jpeg_vals_sql()})[p_partkey % 8 + 1] AS r1,
                     ({_jpeg_vals_sql()})[(p_partkey + 3) % 8 + 1] AS r2,
                     ({_jpeg_vals_sql()})[CASE WHEN p_partkey % 2 = 0
                       THEN p_partkey % 8 ELSE (p_partkey + 1) % 8 END + 1]
                       AS g1,
                     ({_jpeg_vals_sql()})[CASE WHEN p_partkey % 2 = 0
                       THEN (p_partkey + 3) % 8
                       ELSE (p_partkey + 4) % 8 END + 1] AS g2,
                     ({_jpeg_vals_sql()})[CASE WHEN p_partkey % 2 = 0
                       THEN p_partkey % 8 ELSE (p_partkey + 2) % 8 END + 1]
                       AS b1,
                     ({_jpeg_vals_sql()})[CASE WHEN p_partkey % 2 = 0
                       THEN (p_partkey + 3) % 8
                       ELSE (p_partkey + 5) % 8 END + 1] AS b2
              FROM part)
        """,
        "media_probe": _jpeg_probe_oracle_sql(),
        "hilbert_pack": _hilbert_oracle_sql(p=10),
        "geom_sort": """
            SELECT id, ROW_NUMBER() OVER (ORDER BY cx + r, cy, cx, id) AS rk
            FROM (SELECT p_partkey AS id,
                         CAST(p_partkey % 40 AS DOUBLE) AS cx,
                         CAST(p_size % 9 AS DOUBLE) AS cy,
                         CAST(p_partkey % 3 + 1 AS DOUBLE) AS r
                  FROM part)
        """,
        "user_sessions": """
            SELECT user_id,
                   CAST(SUM(new_s) AS BIGINT) AS n_sessions,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM (SELECT user_id,
                         CASE WHEN LAG(epoch_us(ts)) OVER
                                   (PARTITION BY user_id ORDER BY ts, event_id)
                                   IS NULL THEN 1
                              WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                                   (PARTITION BY user_id ORDER BY ts, event_id)
                                   > 1800 * 1000000 THEN 1
                              ELSE 0 END AS new_s
                  FROM events)
            GROUP BY user_id
        """,
        "geom_groupby": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(MAX(cnt) AS BIGINT) AS max_cnt,
                   CAST(SUM(cnt) AS BIGINT) AS total
            FROM (SELECT COUNT(*) AS cnt FROM part
                  GROUP BY p_partkey % 7, p_size % 5)
        """,
        "wkb_roundtrip": f"""
            SELECT id, x, y FROM ({points})
        """,
        "sjoin_inner": f"""
            SELECT p.id, d.did
            FROM ({points}) p JOIN ({diamonds}) d
            ON abs(p.x - d.cx) + abs(p.y - d.cy) <= d.r
        """,
        "sjoin_grid": f"""
            SELECT p.id, d.did
            FROM ({points}) p JOIN ({diamonds}) d
            ON abs(p.x - d.cx) + abs(p.y - d.cy) <= d.r
        """,
        "sjoin_grid_left": f"""
            SELECT p.id, d.did
            FROM ({points}) p LEFT JOIN ({diamonds}) d
            ON abs(p.x - d.cx) + abs(p.y - d.cy) <= d.r
        """,
        "sjoin_left": f"""
            SELECT p.id, d.did
            FROM ({points}) p LEFT JOIN ({diamonds}) d
            ON abs(p.x - d.cx) + abs(p.y - d.cy) <= d.r
        """,
        "sjoin_counts": f"""
            SELECT d.did, COUNT(*) AS n_points
            FROM ({points}) p JOIN ({diamonds}) d
            ON abs(p.x - d.cx) + abs(p.y - d.cy) <= d.r
            GROUP BY d.did
        """,
        "sjoin_poly_poly": """
            SELECT n.did, s.sid
            FROM (SELECT n_nationkey AS did,
                         CAST(n_nationkey * 5 AS DOUBLE) AS cx,
                         CAST(n_regionkey * 25 AS DOUBLE) AS cy,
                         10.5 AS r
                  FROM nation) n
            JOIN (SELECT s_suppkey AS sid,
                         CAST(s_suppkey % 130 AS DOUBLE) AS cx,
                         CAST(s_nationkey * 4 AS DOUBLE) AS cy,
                         CAST(s_suppkey % 5 + 2.5 AS DOUBLE) AS r
                  FROM supplier) s
            ON abs(n.cx - s.cx) + abs(n.cy - s.cy) <= n.r + s.r
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,6))), 2)
                             AS DECIMAL(38,6)) AS VARCHAR) AS sum_qty,
                   CAST(CAST(ROUND(SUM(CAST(l_extendedprice
                                            AS DECIMAL(38,6))), 4)
                             AS DECIMAL(38,6)) AS VARCHAR) AS sum_base_price,
                   CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                            AS DECIMAL(38,6))), 4)
                             AS DECIMAL(38,6)) AS VARCHAR) AS sum_disc_price,
                   ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                              AS DOUBLE) / COUNT(*), 4) AS avg_qty,
                   ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6)))
                              AS DOUBLE) / COUNT(*), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT o_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
        """,
        "top_orders_per_priority": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
                FROM orders) WHERE rk <= 3
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id FROM documents
            GROUP BY text
        """,
        "bpe_tokens": f"""
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKS}) END AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '{_BPE_PAT_SQL}')) AS BIGINT) AS bpe_tokens
            FROM documents
        """,
        "doc_stats": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len({_TOKS}) END AS n_tokens,
                   length(text) AS n_chars2,
                   ROUND(CASE WHEN trim(text) = '' THEN 0.0
                        ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                             / len({_TOKS}) END, 6) AS avg_word_len
            FROM documents
        """,
        "decontamination": f"""
            SELECT 'decon' AS src, * FROM ({_decon_body_sql()})
            UNION ALL
            SELECT * FROM (
              WITH {"%s %s" % _kmv_oracle_sql(_KMV_K)}
            )
            UNION ALL
            SELECT * FROM (
              WITH {"%s %s" % _probe_oracle_sql(_PROBE_K)}
            )
            UNION ALL
            -- 'bloom' variant: the engine's bloom-prefiltered path is
            -- EXACT by construction (no-false-negative prefilter +
            -- exact verify join), so its oracle is the identical
            -- set-join replay retagged
            SELECT 'bloom' AS src, * FROM ({_decon_body_sql()})
        """,
        "repetition_signals": f"""
            WITH lt AS (
              SELECT doc_id,
                     list_filter(list_transform(string_split(text, ' '),
                                                x -> trim(x)),
                                 x -> x != '') AS ls
              FROM documents
            ),
            dup AS (SELECT doc_id,
                     CASE WHEN len(ls) > 0
                          THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
                               / len(ls)
                          ELSE 0.0 END AS dup_token_frac
                    FROM lt),
            t AS (SELECT doc_id, {_TOKS} AS tk FROM documents
                  WHERE text IS NOT NULL AND trim(text) != ''),
            n AS (SELECT doc_id, len(tk) AS ntok FROM t),
            c2 AS (SELECT doc_id, MAX(c) AS maxc FROM (
                     SELECT t.doc_id, array_to_string(tk[u.i:u.i+1], ' ') AS g,
                            COUNT(*) AS c
                     FROM t, UNNEST(range(1, len(tk))) AS u(i)
                     GROUP BY 1, 2) GROUP BY 1),
            c3 AS (SELECT doc_id, MAX(c) AS maxc FROM (
                     SELECT t.doc_id, array_to_string(tk[u.i:u.i+2], ' ') AS g,
                            COUNT(*) AS c
                     FROM t, UNNEST(range(1, len(tk) - 1)) AS u(i)
                     GROUP BY 1, 2) GROUP BY 1)
            SELECT d.doc_id, dup.dup_token_frac,
                   COALESCE(LEAST(CAST(c2.maxc * 2 AS DOUBLE) / n.ntok, 1.0),
                            0.0) AS top2_frac,
                   COALESCE(LEAST(CAST(c3.maxc * 3 AS DOUBLE) / n.ntok, 1.0),
                            0.0) AS top3_frac
            FROM documents d
            JOIN dup USING (doc_id)
            LEFT JOIN n USING (doc_id)
            LEFT JOIN c2 USING (doc_id)
            LEFT JOIN c3 USING (doc_id)
        """,
        "doc_chunks": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents
                       WHERE text IS NOT NULL AND trim(text) != ''),
            c AS (SELECT doc_id, tk,
                   1 + CASE WHEN len(tk) > 32
                            THEN (len(tk) - 32 + 23) // 24 ELSE 0 END AS nc
                  FROM t),
            ch AS (SELECT doc_id, u.i AS chunk_id,
                          tk[u.i*24 + 1 : u.i*24 + 32] AS ct
                   FROM c, UNNEST(range(0, nc)) AS u(i))
            SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                   CAST(len(ct) AS BIGINT) AS n_tokens,
                   md5(array_to_string(ct, ' ')) AS chunk_md5
            FROM ch
        """,
        "bpe_ids": _bpe_oracle_sql(),
        "wp_ids": _wordpiece_oracle_sql(),
        "wpb_ids": _wordpiece_bytes_oracle_sql(),
        "unigram_ids": _unigram_oracle_sql(),
        "span_dedup": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents
                       WHERE text IS NOT NULL AND trim(text) != ''),
            w AS (SELECT doc_id, u.i AS wid,
                         array_to_string(tk[u.i*8 + 1 : u.i*8 + 8], ' ') AS s
                  FROM t, UNNEST(range(0, (len(tk) + 7) // 8)) AS u(i)),
            c AS (SELECT s FROM w GROUP BY s HAVING COUNT(*) >= 2),
            k AS (SELECT doc_id, wid, s FROM w ANTI JOIN c USING (s)),
            r AS (SELECT doc_id, COUNT(*) AS kept,
                         string_agg(s, ' ' ORDER BY wid) AS txt
                  FROM k GROUP BY doc_id)
            SELECT 'fixed' AS variant, d.doc_id,
                   CAST(COALESCE(r.kept, 0) AS BIGINT) AS kept_spans,
                   md5(COALESCE(r.txt, '')) AS text_md5
            FROM documents d LEFT JOIN r USING (doc_id)
            UNION ALL
            SELECT 'content' AS variant, doc_id, kept_spans, text_md5
            FROM ({_span_content_oracle_block()})
            UNION ALL
            SELECT 'guarded' AS variant, doc_id, kept_spans, text_md5
            FROM ({_span_content_oracle_block(min_span_tokens=3)})
        """,
        "events_json": f"""
            SELECT 'json' AS variant, event_type AS k,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(json_extract(props, '$.k') AS INT))
                        AS BIGINT) AS sum_k,
                   ROUND(AVG(CAST(json_extract(props, '$.k') AS INT)), 6)
                        AS val
            FROM events GROUP BY event_type
            UNION ALL
            SELECT 'pr' AS variant, k,
                   CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS sum_k,
                   val
            FROM ({_pagerank_oracle_sql()})
            UNION ALL
            SELECT 'linkpr' AS variant, k,
                   CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS sum_k,
                   val
            FROM ({_pagerank_oracle_sql(edges_sql=_LINK_EDGES_SQL)})
        """,
        "unigram_quality": f"""
            WITH tok AS (
              SELECT doc_id, u.t AS token
              FROM (SELECT doc_id, {_TOKS} AS tk FROM documents) x,
                   UNNEST(tk) AS u(t)
            ),
            m AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
            tot AS (SELECT SUM(n) AS total FROM m),
            sc AS (SELECT doc_id, COUNT(*) AS nt,
                          AVG(ln(CAST(n AS DOUBLE) / total)) AS lp
                   FROM tok JOIN m USING (token) CROSS JOIN tot
                   GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(sc.nt, 0) AS BIGINT) AS n_tokens,
                   COALESCE(ROUND(sc.lp, 6), 0.0) AS avg_logp
            FROM documents d LEFT JOIN sc USING (doc_id)
        """,
        "event_funnel": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                       FROM events),
            f AS (SELECT user_id,
                         MIN(CASE WHEN event_type = 'view' THEN us END) AS fv
                  FROM e GROUP BY 1),
            c AS (SELECT e.user_id, MIN(us) AS fc
                  FROM e JOIN f USING (user_id)
                  WHERE event_type = 'click' AND us >= fv GROUP BY 1)
            SELECT f.user_id,
                   CAST(COALESCE(f.fv, -1) AS BIGINT) AS first_view_us,
                   CAST(COALESCE(c.fc, -1) AS BIGINT) AS first_click_us,
                   CAST(CASE WHEN c.fc IS NOT NULL
                              AND c.fc - f.fv <= 86400000000
                             THEN 1 ELSE 0 END AS BIGINT) AS converted_1d
            FROM f LEFT JOIN c USING (user_id)
        """,
        "tpch_q5": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "lang_id": f"""
            SELECT doc_id,
                   CASE WHEN GREATEST(en, de, fr, es) = 0 THEN 'und'
                        WHEN en = GREATEST(en, de, fr, es) THEN 'en'
                        WHEN de = GREATEST(en, de, fr, es) THEN 'de'
                        WHEN fr = GREATEST(en, de, fr, es) THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM (SELECT doc_id,
                         {_hits(_EN)} AS en, {_hits(_DE)} AS de,
                         {_hits(_FR)} AS fr, {_hits(_ES)} AS es
                  FROM documents)
        """,
        "quality_score": f"""
            SELECT doc_id, ROUND(
                0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 200.0, 1.0)
              + 0.3 * LEAST(CASE WHEN n_tokens > 0
                                 THEN CAST(en_hits AS DOUBLE) / n_tokens ELSE 0.0 END / 0.4, 1.0)
              + 0.3 * CASE WHEN length(text) > 0
                           THEN CAST(length(regexp_replace(text, '[^A-Za-z\\s]', '', 'g')) AS DOUBLE)
                                / length(text) ELSE 0.0 END, 6) AS quality
            FROM (SELECT doc_id, text,
                         CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tokens,
                         {_hits(_EN)} AS en_hits
                  FROM documents)
        """,
        "corpus_pipeline": f"""
            WITH deduped AS (
                SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
            ),
            scored AS (
                SELECT doc_id,
                       CASE WHEN GREATEST(en, de, fr, es) = 0 THEN 'und'
                            WHEN en = GREATEST(en, de, fr, es) THEN 'en'
                            WHEN de = GREATEST(en, de, fr, es) THEN 'de'
                            WHEN fr = GREATEST(en, de, fr, es) THEN 'fr'
                            ELSE 'es' END AS lang_pred,
                       0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 200.0, 1.0)
                     + 0.3 * LEAST(CASE WHEN n_tokens > 0
                                        THEN CAST(en AS DOUBLE) / n_tokens ELSE 0.0 END / 0.4, 1.0)
                     + 0.3 * CASE WHEN length(text) > 0
                                  THEN CAST(length(regexp_replace(text, '[^A-Za-z\\s]', '', 'g')) AS DOUBLE)
                                       / length(text) ELSE 0.0 END AS q
                FROM (SELECT doc_id, text,
                             CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tokens,
                             {_hits(_EN)} AS en, {_hits(_DE)} AS de,
                             {_hits(_FR)} AS fr, {_hits(_ES)} AS es
                      FROM deduped)
            )
            SELECT lang_pred, COUNT(*) AS n_docs, ROUND(AVG(q), 6) AS avg_quality
            FROM scored WHERE q >= 0.4 GROUP BY lang_pred
        """,
        "minhash_pairs": _minhash_oracle_sql(),
        "jaccard_verify": _jaccard_oracle_sql(),
        "knn_join": f"""
            WITH l AS (SELECT c_custkey AS lid,
                        CAST(c_custkey % 97 AS DOUBLE) AS lx,
                        CAST(c_nationkey * 4 AS DOUBLE) AS ly FROM customer),
            r AS (SELECT s_suppkey AS rid,
                        CAST(s_suppkey * 7 % 90 AS DOUBLE) AS rx,
                        CAST(s_nationkey * 3 % 80 AS DOUBLE) AS ry FROM supplier),
            bf AS (
              SELECT l.lid, r.rid,
                     (l.lx - r.rx) * (l.lx - r.rx)
                   + (l.ly - r.ry) * (l.ly - r.ry) AS dist2,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY l.lid
                       ORDER BY (l.lx - r.rx) * (l.lx - r.rx)
                              + (l.ly - r.ry) * (l.ly - r.ry), r.rid
                     ) AS BIGINT) AS rank
              FROM l CROSS JOIN r
            )
            SELECT lid, rid, dist2 AS d, rank, 'knn' AS variant
            FROM bf WHERE rank <= 3
            UNION ALL
            SELECT l.lid, n.rid, n.d, CAST(NULL AS BIGINT) AS rank,
                   'nearest' AS variant
            FROM l LEFT JOIN (
              SELECT lid, rid, sqrt(dist2) AS d
              FROM bf WHERE rank = 1 AND dist2 <= {_NEAREST_CUT**2!r}
            ) n USING (lid)
            UNION ALL
            SELECT lid, rid, dist2 AS d, CAST(NULL AS BIGINT) AS rank,
                   'dwithin' AS variant
            FROM bf WHERE dist2 <= {_NEAREST_CUT**2!r}
        """,
        "interval_join": """
            SELECT n.n_nationkey AS band_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(e.value), 4) AS sum_value
            FROM events e
            JOIN nation n
              ON e.value >= n.n_nationkey * 17.0
             AND e.value <= n.n_nationkey * 17.0 + 40.0
            GROUP BY 1
        """,
        "scrub_normalize": r"""
            WITH dirty AS (
              SELECT doc_id,
                     text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                       || '@example.com  see https://site' || CAST(doc_id AS VARCHAR)
                       || '.org/a?b=1 at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.7 or +1 555-000-' || CAST(doc_id % 10000 AS VARCHAR) AS t
              FROM documents
            ),
            scrubbed AS (
              SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g'),
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                  '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS t
              FROM dirty
            )
            SELECT 'scrub' AS variant, CAST(doc_id AS VARCHAR) AS k,
                   md5(trim(regexp_replace(lower(t), '\s+', ' ', 'g'))) AS h,
                   CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_refs
            FROM scrubbed
            UNION ALL
            SELECT 'hosts', lower(source) || '.example.com',
                   CAST(NULL AS VARCHAR),
                   CAST(COUNT(*) AS BIGINT), CAST(2 * COUNT(*) AS BIGINT)
            FROM documents GROUP BY source
            UNION ALL
            SELECT 'hosts', 'h' || CAST(doc_id % 7 AS VARCHAR) || '.test',
                   CAST(NULL AS VARCHAR),
                   CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT)
            FROM documents GROUP BY doc_id % 7
            UNION ALL
            -- crawl chain replay: the WARC/HTML round trip is the
            -- identity on the template, so the expectation is closed
            -- form — title 'Doc N'; text = original lines with runs of
            -- whitespace collapsed, trimmed, blanks dropped
            SELECT 'crawl', CAST(doc_id AS VARCHAR),
                   md5('Doc ' || CAST(doc_id AS VARCHAR) || '|' ||
                       array_to_string(
                         list_filter(
                           list_transform(
                             string_split(text, chr(10)),
                             x -> trim(regexp_replace(x, '\s+', ' ', 'g'))),
                           x -> x != ''),
                         chr(10))),
                   CAST(200 AS BIGINT), CAST(NULL AS BIGINT)
            FROM documents WHERE doc_id % 5 = 0
        """,
        "length_filter": f"""
            WITH tc AS (SELECT doc_id, lang,
                   CAST(len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS BIGINT) AS w
                 FROM documents),
            thr AS (SELECT lang, quantile_cont(w, 0.25) AS t FROM tc GROUP BY lang),
            cap AS (
              SELECT doc_id, cap_rank FROM (
                SELECT doc_id,
                       CAST(ROW_NUMBER() OVER (
                         PARTITION BY source
                         ORDER BY ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                                  doc_id
                       ) AS BIGINT) AS cap_rank
                FROM documents
              ) WHERE cap_rank <= 20
            )
            SELECT tc.doc_id, tc.lang, tc.w, cap.cap_rank
            FROM tc JOIN thr ON tc.lang = thr.lang
            LEFT JOIN cap USING (doc_id)
            WHERE tc.w >= thr.t
        """,
        "top_terms": f"""
            WITH t AS (
              SELECT doc_id, unnest({_TOKS}) AS term
              FROM documents WHERE trim(text) != ''
            ),
            posts AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM t
              WHERE term != '' GROUP BY doc_id, term
            ),
            dls AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                          ELSE len({_TOKS}) END AS dl
              FROM documents
            ),
            consts AS (
              SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dls
            ),
            dfs AS (
              SELECT term, COUNT(*) AS df FROM posts GROUP BY term
            ),
            q AS (
              SELECT unnest(['data','pipeline','quality','model','training'])
                     AS term, 1 AS qtf
            ),
            bm AS (
              SELECT p.doc_id,
                     SUM(
                       ln(1 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * p.tf * 2.2
                       / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / c.avgdl))
                       * q.qtf
                     ) AS score
              FROM posts p
              JOIN q ON p.term = q.term
              JOIN dfs d ON p.term = d.term
              JOIN dls l ON p.doc_id = l.doc_id
              CROSS JOIN consts c
              GROUP BY p.doc_id
            )
            SELECT * FROM (
              SELECT 'terms' AS variant, term AS k,
                     CAST(COUNT(*) AS BIGINT) AS tf,
                     CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                     CAST(NULL AS DOUBLE) AS score
              FROM t WHERE term != ''
              GROUP BY term ORDER BY tf DESC, k LIMIT 50
            )
            UNION ALL
            SELECT 'bm25' AS variant, CAST(doc_id AS VARCHAR) AS k,
                   CAST(NULL AS BIGINT) AS tf, CAST(NULL AS BIGINT) AS df,
                   ROUND(score, 6) AS score
            FROM bm
        """,
        "events_asof": """
            SELECT l.event_id, l.user_id, r.event_id AS view_id,
                   epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "stratified_sample": f"""
            SELECT 'sample' AS variant, doc_id, lang AS grp,
                   CAST(ROW_NUMBER() OVER (
                     ORDER BY ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                              doc_id
                   ) - 1 AS BIGINT) AS rnk
            FROM (
              SELECT doc_id, lang FROM documents
              WHERE ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000
                  < CASE lang WHEN 'en' THEN 300000
                              WHEN 'fr' THEN 1000000
                              WHEN 'de' THEN 1000000
                              ELSE 500000 END
            )
            UNION ALL
            -- mix_sources replay: en x2.4 (epochs 0,1 full + 40% epoch
            -- 2 by the 'en#2#key' hash), rest x0.5 (epoch 0 by the
            -- 'rest#0#key' hash); global order = md5-prefix hash of
            -- '7:source#epoch#key', ties (source, epoch, key)
            SELECT 'mix' AS variant, doc_id,
                   source || '#' || CAST(epoch AS VARCHAR) AS grp,
                   CAST(ROW_NUMBER() OVER (
                     ORDER BY ('0x' || substr(md5('7:' || source || '#'
                                || CAST(epoch AS VARCHAR) || '#'
                                || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                              source, epoch, doc_id
                   ) - 1 AS BIGINT) AS rnk
            FROM (
              SELECT doc_id, 'en' AS source, u.e AS epoch
              FROM documents, UNNEST([0, 1]) AS u(e) WHERE lang = 'en'
              UNION ALL
              SELECT doc_id, 'en', 2 FROM documents
              WHERE lang = 'en'
                AND ('0x' || substr(md5('7:en#2#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000 < 400000
              UNION ALL
              SELECT doc_id, 'rest', 0 FROM documents
              WHERE lang != 'en'
                AND ('0x' || substr(md5('7:rest#0#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000 < 500000
            )
            UNION ALL
            -- systematic PPS replay: exact integer lattice over the
            -- n_chars cumsum in doc_id order; rnk = hits in [s-w, s)
            SELECT 'pps' AS variant, doc_id, grp, CAST(hi - lo AS BIGINT) AS rnk
            FROM (
              SELECT doc_id, lang AS grp,
                CASE WHEN s <= {_pps_offset()} THEN 0
                     ELSE (s - {_pps_offset()} - 1) // {_PPS_STEP} + 1 END AS hi,
                CASE WHEN s - w <= {_pps_offset()} THEN 0
                     ELSE (s - w - {_pps_offset()} - 1) // {_PPS_STEP} + 1 END AS lo
              FROM (SELECT doc_id, lang, n_chars AS w,
                           SUM(n_chars) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS s
                    FROM documents)
            ) WHERE hi > lo
            UNION ALL
            -- split replay: disjoint exhaustive hash ranges, cumulative
            -- thresholds 0.8 / 0.9 / 1.0 over the same md5-prefix hash
            SELECT 'split' AS variant, doc_id,
                   CASE WHEN hv < 800000 THEN 'train'
                        WHEN hv < 900000 THEN 'val'
                        ELSE 'test' END AS grp,
                   CAST(NULL AS BIGINT) AS rnk
            FROM (SELECT doc_id,
                         ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                         % 1000000 AS hv
                  FROM documents)
        """,
        "shard_pack": f"""
            WITH RECURSIVE tc AS (SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS BIGINT) AS w
                 FROM documents),
            rs AS (SELECT doc_id, w,
                   SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS s
                 FROM tc),
            -- 'nf' replay: sequential next-fit as a recursive CTE over
            -- in-group positions (rank groups of 64, budget 500)
            p AS (SELECT doc_id, w,
                         ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS r
                  FROM tc WHERE w > 0),
            gg AS (SELECT doc_id, w, r // 64 AS grp, r % 64 AS pos FROM p),
            nf AS (
              SELECT grp, pos, doc_id, w,
                     CAST(0 AS BIGINT) AS lb, w AS fill
              FROM gg WHERE pos = 0
              UNION ALL
              SELECT g.grp, g.pos, g.doc_id, g.w,
                     CASE WHEN nf.fill + g.w > 500
                          THEN nf.lb + 1 ELSE nf.lb END,
                     CASE WHEN nf.fill + g.w > 500
                          THEN g.w ELSE nf.fill + g.w END
              FROM nf JOIN gg g ON g.grp = nf.grp AND g.pos = nf.pos + 1
            ),
            nfb AS (SELECT grp, grp * 64 + lb AS bin,
                           COUNT(*) AS v1, SUM(w) AS v2,
                           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                                          ORDER BY pos)) AS h
                    FROM nf GROUP BY grp, lb),
            -- 'ffd' replay: first-fit-decreasing as a recursive CTE
            -- carrying the group's bin-fill LIST; placement order =
            -- (weight DESC, rank ASC), first bin with room wins
            -- (list_position over the fits mask), else append a bin
            fgg AS (SELECT doc_id, w, grp,
                           ROW_NUMBER() OVER (PARTITION BY grp
                             ORDER BY w DESC, pos ASC) - 1 AS fpos
                    FROM gg),
            ffd AS (
              SELECT grp, fpos, doc_id, w,
                     CAST(0 AS BIGINT) AS lb, [w] AS fills
              FROM fgg WHERE fpos = 0
              UNION ALL
              SELECT grp, fpos, doc_id, w,
                     CAST(CASE WHEN p IS NULL THEN len(fills)
                               ELSE p - 1 END AS BIGINT) AS lb,
                     CASE WHEN p IS NULL THEN list_append(fills, w)
                          ELSE list_transform(range(1, len(fills) + 1),
                                 i -> CASE WHEN i = p THEN fills[i] + w
                                           ELSE fills[i] END)
                     END AS fills
              FROM (
                -- list_position returns 0 (not NULL) when no element
                -- matches: NULLIF folds both no-fit encodings into NULL
                SELECT g.grp, g.fpos, g.doc_id, g.w, f.fills,
                       NULLIF(list_position(
                         list_transform(f.fills, x -> x + g.w <= 500),
                         true), 0) AS p
                FROM ffd f JOIN fgg g
                  ON g.grp = f.grp AND g.fpos = f.fpos + 1
              )
            ),
            ffdb AS (SELECT grp, grp * 64 + lb AS bin,
                            COUNT(*) AS v1, SUM(w) AS v2,
                            md5(string_agg(CAST(doc_id AS VARCHAR), ','
                                           ORDER BY doc_id)) AS h
                     FROM ffd GROUP BY grp, lb)
            SELECT 'nf' AS variant, CAST(grp AS BIGINT) AS k1,
                   CAST(bin AS BIGINT) AS k2,
                   CAST(v1 AS BIGINT) AS v1, CAST(v2 AS BIGINT) AS v2, h
            FROM nfb
            UNION ALL
            SELECT 'ffd' AS variant, CAST(grp AS BIGINT) AS k1,
                   CAST(bin AS BIGINT) AS k2,
                   CAST(v1 AS BIGINT) AS v1, CAST(v2 AS BIGINT) AS v2, h
            FROM ffdb
            UNION ALL
            SELECT 'shard' AS variant,
                   CAST((s - w) // 2000 AS BIGINT) AS k1,
                   CAST(NULL AS BIGINT) AS k2,
                   CAST(COUNT(*) AS BIGINT) AS v1,
                   CAST(SUM(w) AS BIGINT) AS v2,
                   CAST(NULL AS VARCHAR) AS h
            FROM rs GROUP BY 2
            UNION ALL
            SELECT 'seq', rs.doc_id,
                   CAST(u.q AS BIGINT),
                   CAST(greatest(s - w, u.q * 512) - (s - w) AS BIGINT),
                   CAST(least(s, (u.q + 1) * 512)
                        - greatest(s - w, u.q * 512) AS BIGINT),
                   CAST(NULL AS VARCHAR)
            FROM rs,
                 UNNEST(range(CAST((s - w) // 512 AS BIGINT),
                              CAST((s - 1) // 512 + 1 AS BIGINT))) AS u(q)
            WHERE w > 0
        """,
        "training_sequences": _mseq_oracle_sql(),
        "training_mix": _training_mix_oracle_sql(),
        "curation_pipeline": _curation_oracle_sql(),
        "dedup_clusters": _cluster_oracle_sql(),
        "simhash_pairs": _simhash_oracle_sql(),
        "ann_ivf_topk": _ivf_oracle_sql(),
        "ann_ivf_index": _ivf_oracle_sql(),
        "embedding_near_dup": _embedding_near_dup_oracle_sql(),
        "semantic_pairs": _semantic_pairs_oracle_sql(),
        "ann_topk": _bf_oracle_sql(),
        "label_centroid_sim": """
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            idx AS (SELECT unnest(range(1, 65)) AS i),
            ex AS (SELECT e.vec_id, e.label, idx.i, e.v[idx.i] AS val
                   FROM e CROSS JOIN idx),
            cent AS (SELECT label, i, SUM(val) / COUNT(*) AS c
                     FROM ex GROUP BY label, i),
            dots AS (SELECT ex.vec_id, ex.label,
                            SUM(ex.val * cent.c) AS dot,
                            SUM(ex.val * ex.val) AS nv,
                            SUM(cent.c * cent.c) AS nc
                     FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
                     GROUP BY ex.vec_id, ex.label),
            cs AS (SELECT label,
                          CASE WHEN sqrt(nv) > 0 AND sqrt(nc) > 0
                               THEN dot / (sqrt(nv) * sqrt(nc)) ELSE 0.0 END AS cs
                   FROM dots)
            SELECT label, ROUND(AVG(cs), 6) AS avg_cos, COUNT(*) AS n
            FROM cs GROUP BY label
        """,
    }


def oracle_sql() -> dict[str, str]:
    """Oracle twins for every `queries()` entry, composing the per-operator
    base SQL for the consolidated gates exactly the way the Spark side
    composes the per-operator DataFrames (tagged UNION ALL / key join)."""
    o = _base_oracle_sql()

    def union(a: str, b: str, ta: str, tb: str) -> str:
        return (
            f"SELECT x.*, '{ta}' AS variant FROM ({o[a]}) x "
            f"UNION ALL SELECT y.*, '{tb}' AS variant FROM ({o[b]}) y"
        )

    def join(a: str, b: str, keys: str) -> str:
        return f"SELECT * FROM ({o[a]}) ja JOIN ({o[b]}) jb USING ({keys})"

    # IVF gates additionally carry recall@5 vs exact brute force (driver-
    # verified ANN quality): oracle recomputes recall from its own replicas
    def ivf_recall(ivf_sql: str, bf_sql: str) -> str:
        return f"""
        WITH ivf AS ({ivf_sql}), bf AS ({bf_sql}),
        rc AS (SELECT ivf.qid,
                      CAST(SUM(CASE WHEN bf.vec_id IS NOT NULL
                                    THEN 1 ELSE 0 END) AS DOUBLE) / 5 AS recall
               FROM ivf LEFT JOIN bf
                 ON ivf.qid = bf.qid AND ivf.vec_id = bf.vec_id
               GROUP BY ivf.qid)
        SELECT ivf.*, rc.recall FROM ivf JOIN rc USING (qid)
    """

    iso_recall = ivf_recall(o["ann_ivf_topk"], o["ann_topk"])
    clus_recall = ivf_recall(
        _ivf_oracle_sql(e_sql=_CLUSTERED_E_SQL),
        _bf_oracle_sql(_CLUSTERED_E_SQL),
    )
    merged = {
        # iso variant = raw embeddings (isotropic: recall ~ scan fraction,
        # the bound for any partition index); clustered variant = the
        # deterministic clustered twin, recall 1.0 at the same 4/16
        "ann_ivf_topk": (
            f"SELECT x.*, 'iso' AS variant FROM ({iso_recall}) x "
            f"UNION ALL "
            f"SELECT y.*, 'clustered' AS variant FROM ({clus_recall}) y"
        ),
        "ann_ivf_index": (
            f"SELECT x.*, 'iso' AS variant FROM ({iso_recall}) x "
            f"UNION ALL "
            f"SELECT y.*, 'clustered' AS variant FROM ({clus_recall}) y "
            f"UNION ALL "
            f"SELECT s.*, 'ivfsq8' AS variant FROM ("
            f"{ivf_recall(_ivfsq8_oracle_sql(), _bf_oracle_sql(_CLUSTERED_E_SQL))}"
            f") s"
        ),
        # bf variant = full corpus; pq_exact = the PQ pipeline in its
        # lossless configuration (200-vector corpus, n_codes=200), where
        # encode -> ADC -> exact rerank provably equals brute force
        "ann_topk": (
            f"SELECT x.*, 'bf' AS variant FROM ({o['ann_topk']}) x "
            f"UNION ALL SELECT y.*, 'pq_exact' AS variant FROM ("
            f"{_bf_oracle_sql(e_sql=_ISO_E_SQL + ' WHERE vec_id < 200')}) y "
            f"UNION ALL SELECT z.*, 'sq8' AS variant FROM ("
            f"{_sq8_oracle_sql()}) z"
        ),
        "cx_bbox": union("cx_bbox", "cx_bbox_inverted", "select", "inverted"),
        "cx_refine": union("cx_lines", "cx_diamonds", "line", "diamond"),
        "sjoin_inner": union("sjoin_inner", "sjoin_grid", "broadcast", "grid"),
        "sjoin_left": union("sjoin_left", "sjoin_grid_left", "broadcast", "grid"),
        "fillna_points": union("fillna_points", "fillna_pad", "value", "pad"),
        "doc_chunks": (
            union("doc_chunks", "bpe_ids", "chunk", "bpe")
            + f" UNION ALL SELECT z.*, 'wp' AS variant FROM ({o['wp_ids']}) z"
            + f" UNION ALL SELECT b.*, 'wpb' AS variant"
            f" FROM ({o['wpb_ids']}) b"
        ),
        "unigram_encode": (
            "SELECT doc_id, n_tokens, chunk_md5 AS ids_md5 FROM ("
            + o["unigram_ids"]
            + ")"
        ),
        "tpch_joins": (
            f"SELECT 'q3' AS variant, CAST(o_orderkey AS VARCHAR) AS k, "
            f"revenue FROM ({o['tpch_q3']}) "
            f"UNION ALL SELECT 'q5', n_name, revenue FROM ({o['tpch_q5']})"
        ),
        "embedding_near_dup": union(
            "embedding_near_dup", "semantic_pairs", "rp", "semantic"
        ),
        "area_by_group": join("area_by_group", "length_by_group", "brand"),
        "oriented_area": join("oriented_area", "centroid", "id"),
        "sjoin_counts": join("sjoin_counts", "boundary_length", "did"),
        "doc_stats": (
            "SELECT * FROM ("
            + join("doc_stats", "bpe_tokens", "doc_id")
            + ") jds JOIN ("
            + _quality_margin_oracle_sql()
            + ") jqm USING (doc_id)"
        ),
        "lang_id": (
            "SELECT * FROM ("
            + join("lang_id", "quality_score", "doc_id")
            + ") jls JOIN ("
            + _lang_clf_oracle_sql()
            + ") jlc USING (doc_id) JOIN ("
            + _lang_clf_gap_oracle_sql()
            + ") jlg USING (doc_id) JOIN ("
            + _lang_segments_oracle_sql()
            + ") jlsg USING (doc_id)"
        ),
        "repetition_signals": join("repetition_signals", "unigram_quality", "doc_id"),
        "minhash_pairs": (
            "SELECT *, 'pairs' AS src FROM ("
            + join("minhash_pairs", "jaccard_verify", "id_a, id_b")
            + ") UNION ALL SELECT *, 'index' AS src FROM ("
            + _minhash_index_oracle_sql()
            + ")"
        ),
        "user_sessions": join("user_sessions", "event_funnel", "user_id"),
        "streaming_sketch": _streaming_sketch_oracle_sql(_STREAM_SKETCH_K),
        "screen_batch": _screen_batch_oracle_sql(_PROBE_K),
    }
    out = dict(o)
    out.update(merged)
    declared = set(queries())
    return {k: v for k, v in out.items() if k in declared}
