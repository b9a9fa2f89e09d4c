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
    df, geom: str, order_col: str, backfill: bool = False
):
    """Pad (forward) or backfill missing geometries in `order_col` order —
    the reference's method-based fillna (ref ``base.py:510-558``), expressed
    as a ``last(ignorenulls)`` running window. Requires an explicit order
    column because Spark rows have no positional index (SURVEY §2.2 P8)."""
    from pyspark.sql.window import Window

    if backfill:
        w = (
            Window.orderBy(F.col(order_col).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = Window.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    filled = F.last(F.col(geom), ignorenulls=True).over(w)
    return df.withColumn(geom, filled)


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
