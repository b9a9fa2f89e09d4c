"""Spatial predicates as JVM column expressions.

Filter-refine discipline (ref ``spatialindex/rtree.py:312-359``,
``geometry/base.py:691-729``): always conjoin a cheap bbox test (plain double
comparisons — codegen-native, parquet-stats pushable) before the exact test.
The exact tests here are division-free and ANSI-mode safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spatialpandas_spark.functions.measures import _finite, _seq0

Bounds = tuple[float, float, float, float]


def _orient(b: Bounds) -> Bounds:
    """Swap inverted query bounds like the reference (``base.py:684-688``)."""
    x0, y0, x1, y1 = b
    if x1 < x0:
        x0, x1 = x1, x0
    if y1 < y0:
        y0, y1 = y1, y0
    return x0, y0, x1, y1


def bbox_intersects_bounds(bounds: Column, rect: Bounds) -> Column:
    """bounds struct<x0,y0,x1,y1> intersects the literal rect. Pure double
    comparisons: pushed to parquet row-group stats when `bounds` is a stored
    column over Hilbert-sorted data (replaces the reference's R-tree probe)."""
    x0, y0, x1, y1 = _orient(rect)
    return (
        (bounds["x0"] <= F.lit(x1))
        & (bounds["x1"] >= F.lit(x0))
        & (bounds["y0"] <= F.lit(y1))
        & (bounds["y1"] >= F.lit(y0))
    )


def bbox_overlap(b1: Column, b2: Column) -> Column:
    """bbox-vs-bbox intersection test between two bounds struct columns."""
    return (
        (b1["x0"] <= b2["x1"])
        & (b1["x1"] >= b2["x0"])
        & (b1["y0"] <= b2["y1"])
        & (b1["y1"] >= b2["y0"])
    )


def _point_in_rect(x: Column, y: Column, rect: Bounds) -> Column:
    x0, y0, x1, y1 = _orient(rect)
    return (
        (x >= F.lit(x0)) & (x <= F.lit(x1)) & (y >= F.lit(y0)) & (y <= F.lit(y1))
    )


def st_intersects_bounds(geom: Column, geom_type: str, rect: Bounds) -> Column:
    """Exact geometry-vs-rectangle intersection.

    Implemented exactly for point (ref ``geometry/point.py:196-210``) and
    multipoint (ref ``_algorithms/intersection.py:189-235``: any vertex in
    rect). For line/polygon families this v1 falls back to the bbox test,
    which over-approximates on the rare concave-around-corner cases; exact
    segment/corner refinement lands with the full intersection kernel port.
    """
    if geom_type == "point":
        return _point_in_rect(geom["x"], geom["y"], rect)
    if geom_type == "multipoint":
        n = (F.size(geom) / 2).cast("int")
        return F.exists(
            _seq0(n),
            lambda i: _point_in_rect(F.get(geom, 2 * i), F.get(geom, 2 * i + 1), rect),
        )
    # line / multiline / polygon / multipolygon: bbox approximation for now
    from spatialpandas_spark.functions.measures import st_bounds

    return bbox_intersects_bounds(st_bounds(geom, geom_type), rect)


def _ring_crossings(ring: Column, px: Column, py: Column) -> Column:
    """Number of upward-ray crossings of one closed ring (even-odd rule),
    division-free: an edge (p0,p1) crosses the ray iff it straddles py and
    the point is strictly left of the edge (cross-product sign test)."""
    npts = (F.size(ring) / 2).cast("int")

    def edge(acc: Column, i: Column) -> Column:
        x0 = F.get(ring, 2 * i)
        y0 = F.get(ring, 2 * i + 1)
        x1 = F.get(ring, 2 * i + 2)
        y1 = F.get(ring, 2 * i + 3)
        straddles = (y0 > py) != (y1 > py)
        # cross = (p1 - p0) x (P - p0); edge passes right of P iff sign
        # matches edge direction
        cross = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)
        crossed = straddles & ((cross > 0) == (y1 > y0))
        return acc + F.when(crossed, F.lit(1)).otherwise(F.lit(0))

    return F.aggregate(_seq0(npts - 1), F.lit(0), edge)


def st_point_in_polygon(px: Column, py: Column, poly: Column) -> Column:
    """Point-in-polygon (even-odd ray casting over all rings, so CW holes
    exclude). Pure JVM expression. Agrees with the reference's nonzero
    winding-number kernel (ref ``_algorithms/intersection.py:122-186``) on
    valid (non-self-intersecting) polygons with properly oriented holes."""
    total = F.aggregate(
        poly, F.lit(0), lambda acc, ring: acc + _ring_crossings(ring, px, py)
    )
    return (total % 2) == 1


def st_point_in_multipolygon(px: Column, py: Column, mpoly: Column) -> Column:
    return F.exists(mpoly, lambda poly: st_point_in_polygon(px, py, poly))
