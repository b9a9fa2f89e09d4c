"""Geometry constructors — build geometry columns from plain columns.

The reference constructs geometry arrays from python/shapely objects at ingest
(ref ``geometry/base.py:799-871``); in Spark the equivalent is building the
nested-array encoding from existing columns with ``F.array``/``F.struct`` —
pure projection, no UDF, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c) -> Column:
    c = F.lit(c) if not isinstance(c, Column) else c
    return c.cast("double")


def st_point(x, y) -> Column:
    """point struct<x,y> from two numeric columns."""
    return F.struct(_d(x).alias("x"), _d(y).alias("y"))


def point_bounds(pt: Column) -> Column:
    """Degenerate bbox of a point (x,y,x,y)."""
    return F.struct(
        pt["x"].alias("x0"),
        pt["y"].alias("y0"),
        pt["x"].alias("x1"),
        pt["y"].alias("y1"),
    )


def st_make_box(x0, y0, x1, y1) -> Column:
    """Axis-aligned rectangle as a polygon (single closed CCW ring)."""
    x0, y0, x1, y1 = _d(x0), _d(y0), _d(x1), _d(y1)
    ring = F.array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)
    return F.array(ring)


def st_make_diamond(cx, cy, r) -> Column:
    """Diamond (square rotated 45°) centered at (cx, cy) with circumradius r,
    as a polygon (closed CCW ring). Useful because containment has the closed
    form |x-cx| + |y-cy| <= r, giving SQL-expressible oracles while still
    exercising non-axis-aligned edges in the kernels."""
    cx, cy, r = _d(cx), _d(cy), _d(r)
    ring = F.array(
        cx + r, cy,
        cx, cy + r,
        cx - r, cy,
        cx, cy - r,
        cx + r, cy,
    )
    return F.array(ring)


def st_multipoint(points: Column) -> Column:
    """Interleave an array<struct<x,y>> into a multipoint array<double>."""
    return F.flatten(
        F.transform(points, lambda p: F.array(p["x"], p["y"]))
    )


def _ring_from_pairs(pairs: Column, close: bool) -> Column:
    """[x, y] vertex pairs -> flat interleaved ring, optionally closed."""
    flat = F.flatten(pairs)
    if not close:
        return flat
    n = F.size(flat)
    is_closed = (F.element_at(flat, -2) == flat[0]) & (
        F.element_at(flat, -1) == flat[1]
    )
    return F.when(
        (n >= 4) & ~is_closed, F.concat(flat, F.slice(flat, 1, 2))
    ).otherwise(flat)


def st_polygon_from_exterior(coords: Column, close: bool = True) -> Column:
    """Polygon (single exterior ring, no holes) from an
    ``array<array<double>>`` of [x, y] vertex pairs — the reference's
    ``PolygonArray.from_exterior_coords`` (ref ``geometry/polygon.py:
    152-175``: each row's exterior ravels into one ring).

    ``close=True`` (default) appends the first vertex when the ring isn't
    closed — this engine's measure kernels iterate consecutive pairs
    without wraparound, same as the reference's, which assumes closed
    input. Pass ``close=False`` for exact reference parity on
    already-closed data."""
    return F.array(_ring_from_pairs(coords, close))


def st_multipolygon_from_exterior(coords: Column, close: bool = True) -> Column:
    """MultiPolygon from an ``array<array<array<double>>>`` of per-polygon
    exterior vertex-pair lists (ref ``geometry/multipolygon.py:164-197``)."""
    return F.transform(
        coords, lambda poly: F.array(_ring_from_pairs(poly, close))
    )


#: legal single-step promotions (ref construction-time promotion,
#: ``geometry/base.py:799-871``: Line+MultiLine -> MultiLine,
#: Polygon+MultiPolygon -> MultiPolygon)
_PROMOTIONS = {
    ("point", "multipoint"),
    ("line", "multiline"),
    ("ring", "multiline"),
    ("polygon", "multipolygon"),
}


def st_promote(geom: Column, from_type: str, to_type: str) -> Column:
    """Wrap a geometry one nesting level up (Line -> MultiLine with one
    part, Polygon -> MultiPolygon with one polygon, Point -> MultiPoint),
    so mixed-type columns can be unioned at the promoted type."""
    if (from_type, to_type) not in _PROMOTIONS:
        raise ValueError(f"cannot promote {from_type} -> {to_type}")
    if from_type == "point":
        return F.array(geom["x"], geom["y"])
    return F.array(geom)
