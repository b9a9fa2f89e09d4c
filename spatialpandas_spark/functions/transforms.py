"""Geometry transforms: orientation normalization, boundary extraction,
missing-value handling, coordinate casting — all pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spatialpandas_spark.functions.measures import NESTING, _ring_area, _seq0


def _reverse_ring(ring: Column) -> Column:
    """Reverse vertex order of an interleaved ring (keeps x,y pairing)."""
    npts = (F.size(ring) / 2).cast("int")
    return F.flatten(
        F.transform(
            _seq0(npts),
            lambda i: F.array(
                F.get(ring, 2 * (npts - 1 - i)),
                F.get(ring, 2 * (npts - 1 - i) + 1),
            ),
        )
    )


def st_oriented(geom: Column, geom_type: str = "polygon") -> Column:
    """Normalize ring orientation: ring 0 (shell) CCW (positive signed
    area), rings 1.. (holes) CW — flipping only rings that disagree (ref
    ``_algorithms/orientation.py:38-77``, ``polygon.py:177-191``)."""

    def fix_poly(poly: Column) -> Column:
        return F.transform(
            poly,
            lambda ring, idx: F.when(
                ((idx == 0) & (_ring_area(ring) < 0))
                | ((idx > 0) & (_ring_area(ring) > 0)),
                _reverse_ring(ring),
            ).otherwise(ring),
        )

    if geom_type == "polygon":
        return fix_poly(geom)
    if geom_type == "multipolygon":
        return F.transform(geom, fix_poly)
    raise ValueError(f"st_oriented applies to polygons, got {geom_type}")


def st_boundary(geom: Column, geom_type: str) -> Column:
    """Polygon -> MultiLine (identity reinterpretation: the encodings are
    the same nested array, ref ``polygon.py:93-95``); MultiPolygon ->
    MultiLine (drop one nesting level, ref ``multipolygon.py:218-223``)."""
    if geom_type == "polygon":
        return geom
    if geom_type == "multipolygon":
        return F.flatten(geom)
    raise ValueError(f"st_boundary applies to polygons, got {geom_type}")


def st_is_missing(geom: Column) -> Column:
    """isna: top-level NULL (ref ``base.py:315-318``)."""
    return geom.isNull()


def st_fill_missing(geom: Column, fill_value, geom_type: str) -> Column:
    """fillna with a scalar geometry value (ref ``base.py:510-558``); for
    pad/backfill semantics use a last(ignorenulls) window over an explicit
    order column (SURVEY §2.2 P8)."""
    lvl = NESTING[geom_type]
    if geom_type == "point":
        lit = F.struct(
            F.lit(float(fill_value[0])).alias("x"),
            F.lit(float(fill_value[1])).alias("y"),
        )
    else:
        typ = "array<" * lvl + "double" + ">" * lvl
        lit = F.lit(fill_value).cast(typ)
    return F.coalesce(geom, lit)


def st_fill_missing_pad(
    df, geom: str, order_col: str, backfill: bool = False,
    nbuckets: int | None = None,
):
    """Pad (forward) or backfill missing geometries in `order_col` order —
    the reference's method-based fillna (ref ``base.py:510-558``). Requires
    an explicit numeric order column because Spark rows have no positional
    index (SURVEY §2.2 P8).

    Scale design (round-1 verdict: a no-partition window is a scale-killer):
    two-phase bucketed pad. Rows are bucketed by approx-quantile split
    points of ``order_col`` (literal values — bucket assignment is a pure
    function of the data, so re-execution is consistent), the running
    ``last(ignorenulls)`` window is *partitioned by bucket*, and the
    cross-bucket boundary is fixed up with a per-bucket carry table (one
    row per bucket, built from a tiny agg + driver prefix scan, broadcast
    back). No task ever sees more than one bucket; no single-partition
    exchange appears in the plan.
    """
    from pyspark.sql.types import IntegerType, StructField, StructType
    from pyspark.sql.window import Window

    spark = df.sparkSession
    if nbuckets is None:
        nbuckets = spark.sparkContext.defaultParallelism
    probs = [i / nbuckets for i in range(1, nbuckets)]
    splits = sorted(set(df.approxQuantile(order_col, probs, 0.001))) if probs else []
    if splits:
        # plain indicator-sum (codegen-friendly; a lambda HOF here trips
        # Spark 4's outer-reference binding when the column feeds a join key)
        bucket = F.coalesce(
            sum(
                (F.col(order_col) >= F.lit(float(s))).cast("int") for s in splits
            ),
            F.lit(0),
        )
    else:
        bucket = F.lit(0)
    b = df.withColumn("__b", bucket.cast("int"))

    direction = F.col(order_col).desc() if backfill else F.col(order_col).asc()
    w_in = Window.partitionBy("__b").orderBy(direction).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    padded = b.withColumn("__pad", F.last(F.col(geom), ignorenulls=True).over(w_in))

    # per-bucket boundary value: geometry at the extreme order among
    # non-null rows (max for pad, min for backfill); tiny agg -> collect
    # (bounded by nbuckets rows) -> prefix carry -> broadcast join back.
    pick = F.min_by if backfill else F.max_by
    bl = (
        b.filter(F.col(geom).isNotNull())
        .groupBy("__b")
        .agg(pick(F.col(geom), F.col(order_col)).alias("__v"))
        .collect()
    )
    lastmap = {r["__b"]: r["__v"] for r in bl}
    nb = max(len(splits) + 1, 1)
    order = range(nb - 1, -1, -1) if backfill else range(nb)
    carry_rows, prev = [], None
    for bb in order:
        carry_rows.append((bb, prev))
        if bb in lastmap:
            prev = lastmap[bb]
    cschema = StructType(
        [
            StructField("__b", IntegerType()),
            StructField("__carry", df.schema[geom].dataType),
        ]
    )
    carry_df = spark.createDataFrame(carry_rows, cschema)

    out = (
        padded.join(F.broadcast(carry_df), "__b", "left")
        .withColumn(geom, F.coalesce(F.col("__pad"), F.col("__carry")))
        .drop("__b", "__pad", "__carry")
    )
    return out


def st_astype(geom: Column, geom_type: str, subtype: str) -> Column:
    """Cast coordinate subtype (ref ``base.py:289-303``), e.g. to
    'float'/'int' — nested cast via Spark's native array cast."""
    lvl = NESTING[geom_type]
    if geom_type == "point":
        return F.struct(
            geom["x"].cast(subtype).alias("x"), geom["y"].cast(subtype).alias("y")
        )
    typ = "array<" * lvl + subtype + ">" * lvl
    return geom.cast(typ)
