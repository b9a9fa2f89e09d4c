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


def _sign(v: Column) -> Column:
    return F.when(v > 0, 1).when(v < 0, -1).otherwise(0)


def _tri_orient(ax, ay, bx, by, cx, cy) -> Column:
    """Orientation of triangle ABC: 1 CCW, -1 CW, 0 collinear (ref
    ``_algorithms/orientation.py:8-35``)."""
    return _sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def _segments_intersect(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    """Segment-segment intersection incl. endpoint touches; collinear
    segments intersect iff their bboxes overlap.

    DELIBERATE divergence from the reference: its collinear shortcut
    (ref ``_algorithms/intersection.py:102-104``) returns True for ANY
    fully-collinear pair, including disjoint ones on the same line — a
    false positive reachable only through degenerate inputs. This
    implementation keeps the exact semantics (overlap required), which
    agree with the standard CLRS formulation; the contract is pinned
    against an exact integer-arithmetic oracle in
    ``tests/test_segment_collinear.py`` including every degenerate class
    (collinear overlap/touch/disjoint, zero-length segments)."""
    d1 = _tri_orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = _tri_orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = _tri_orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = _tri_orient(bx0, by0, bx1, by1, ax1, ay1)
    proper = (d1 != d2) & (d3 != d4)
    collinear = (d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0)
    boxes = (
        (F.least(ax0, ax1) <= F.greatest(bx0, bx1))
        & (F.greatest(ax0, ax1) >= F.least(bx0, bx1))
        & (F.least(ay0, ay1) <= F.greatest(by0, by1))
        & (F.greatest(ay0, ay1) >= F.least(by0, by1))
    )
    touch = (
        ((d1 == 0) & _between(bx0, by0, ax0, ay0, ax1, ay1))
        | ((d2 == 0) & _between(bx1, by1, ax0, ay0, ax1, ay1))
        | ((d3 == 0) & _between(ax0, ay0, bx0, by0, bx1, by1))
        | ((d4 == 0) & _between(ax1, ay1, bx0, by0, bx1, by1))
    )
    return proper | (collinear & boxes) | touch


def _between(px, py, ax, ay, bx, by) -> Column:
    """Point P (already known collinear) lies within segment AB's bbox."""
    return (
        (px >= F.least(ax, bx))
        & (px <= F.greatest(ax, bx))
        & (py >= F.least(ay, by))
        & (py <= F.greatest(ay, by))
    )


def _any_vertex_in_rect(flat: Column, rect: Bounds) -> Column:
    n = (F.size(flat) / 2).cast("int")
    return F.exists(
        _seq0(n),
        lambda i: _point_in_rect(F.get(flat, 2 * i), F.get(flat, 2 * i + 1), rect),
    )


def _any_segment_crosses_rect_edge(ring: Column, rect: Bounds) -> Column:
    x0, y0, x1, y1 = _orient(rect)
    edges = [
        (x0, y0, x1, y0),
        (x1, y0, x1, y1),
        (x1, y1, x0, y1),
        (x0, y1, x0, y0),
    ]
    npts = (F.size(ring) / 2).cast("int")

    def seg_hits(i: Column) -> Column:
        sx0 = F.get(ring, 2 * i)
        sy0 = F.get(ring, 2 * i + 1)
        sx1 = F.get(ring, 2 * i + 2)
        sy1 = F.get(ring, 2 * i + 3)
        hit = F.lit(False)
        for ex0, ey0, ex1, ey1 in edges:
            hit = hit | _segments_intersect(
                sx0, sy0, sx1, sy1,
                F.lit(ex0), F.lit(ey0), F.lit(ex1), F.lit(ey1),
            )
        return hit

    return F.exists(_seq0(npts - 1), seg_hits)


def _rect_degenerate(rect: Bounds) -> bool:
    x0, y0, x1, y1 = _orient(rect)
    return x0 == x1 or y0 == y1


def st_intersects_bounds(geom: Column, geom_type: str, rect: Bounds) -> Column:
    """Exact geometry-vs-rectangle intersection, per type (ref
    ``_algorithms/intersection.py:189-569``):

    - point/multipoint: any vertex in rect;
    - line/multiline: vertex in rect, else any segment crosses a rect edge;
      zero-area rects never intersect (ref ``:332-334``);
    - polygon/multipolygon: adds rect-corner-inside-polygon (ray cast) for
      the rect-fully-inside case (ref ``:398-518``).
    """
    if geom_type == "point":
        return _point_in_rect(geom["x"], geom["y"], rect)
    if geom_type == "multipoint":
        return _any_vertex_in_rect(geom, rect)

    if geom_type in ("line", "ring"):
        if _rect_degenerate(rect):
            return F.lit(False) & geom.isNotNull()
        return _any_vertex_in_rect(geom, rect) | _any_segment_crosses_rect_edge(
            geom, rect
        )
    if geom_type == "multiline":
        if _rect_degenerate(rect):
            return F.lit(False) & geom.isNotNull()
        return _any_vertex_in_rect(F.flatten(geom), rect) | F.exists(
            geom, lambda ring: _any_segment_crosses_rect_edge(ring, rect)
        )
    if geom_type == "polygon":
        if _rect_degenerate(rect):
            return F.lit(False) & geom.isNotNull()
        x0, y0, x1, y1 = _orient(rect)
        corner_inside = st_point_in_polygon(F.lit(x0), F.lit(y0), geom)
        return (
            _any_vertex_in_rect(F.flatten(geom), rect)
            | F.exists(geom, lambda ring: _any_segment_crosses_rect_edge(ring, rect))
            | corner_inside
        )
    if geom_type == "multipolygon":
        if _rect_degenerate(rect):
            return F.lit(False) & geom.isNotNull()
        return F.exists(
            geom, lambda poly: st_intersects_bounds(poly, "polygon", rect)
        )
    raise ValueError(f"unknown geom_type: {geom_type}")


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


def _line_parts(geom: Column, geom_type: str) -> Column:
    """Normalize any line/polygon-family geometry to array<array<double>>
    of coordinate sequences (parts/rings)."""
    if geom_type in ("line", "ring"):
        return F.array(geom)
    if geom_type in ("multiline", "polygon"):
        return geom
    if geom_type == "multipolygon":
        return F.flatten(geom)
    raise ValueError(f"no line parts for {geom_type}")


def _ring_pair_cross(a: Column, b: Column) -> Column:
    """Any segment of ring a intersects any segment of ring b."""
    na = (F.size(a) / 2).cast("int")
    nb = (F.size(b) / 2).cast("int")

    def seg_a(i: Column) -> Column:
        ax0, ay0 = F.get(a, 2 * i), F.get(a, 2 * i + 1)
        ax1, ay1 = F.get(a, 2 * i + 2), F.get(a, 2 * i + 3)
        return F.exists(
            _seq0(nb - 1),
            lambda j: _segments_intersect(
                ax0, ay0, ax1, ay1,
                F.get(b, 2 * j), F.get(b, 2 * j + 1),
                F.get(b, 2 * j + 2), F.get(b, 2 * j + 3),
            ),
        )

    return F.exists(_seq0(na - 1), seg_a)


def _any_segments_cross(parts_a: Column, parts_b: Column) -> Column:
    return F.exists(
        parts_a, lambda a: F.exists(parts_b, lambda b: _ring_pair_cross(a, b))
    )


def _first_vertex_in_polygon(parts: Column, poly: Column) -> Column:
    """Any vertex of `parts` strictly inside `poly` (even-odd)."""
    flat = F.flatten(parts)
    n = (F.size(flat) / 2).cast("int")
    return F.exists(
        _seq0(n),
        lambda i: st_point_in_polygon(
            F.get(flat, 2 * i), F.get(flat, 2 * i + 1), poly
        ),
    )


def st_intersects(
    lgeom: Column, ltype: str, rgeom: Column, rtype: str
) -> Column:
    """General geometry × geometry `intersects` for all 7×7 type pairs —
    parity-plus: the reference only implements the point family
    (``base.py:634-651`` raises NotImplementedError otherwise).

    Line/polygon families reduce to: segments cross, or (for polygon
    operands) one side's vertex lies in the other's interior."""
    if ltype == "point":
        return st_point_intersects(lgeom["x"], lgeom["y"], rgeom, rtype)
    if rtype == "point":
        return st_point_intersects(rgeom["x"], rgeom["y"], lgeom, ltype)
    if ltype == "multipoint":
        n = (F.size(lgeom) / 2).cast("int")
        return F.exists(
            _seq0(n),
            lambda i: st_point_intersects(
                F.get(lgeom, 2 * i), F.get(lgeom, 2 * i + 1), rgeom, rtype
            ),
        )
    if rtype == "multipoint":
        return st_intersects(rgeom, rtype, lgeom, ltype)

    lpoly = ltype in ("polygon", "multipolygon")
    rpoly = rtype in ("polygon", "multipolygon")
    lparts = _line_parts(lgeom, ltype)
    rparts = _line_parts(rgeom, rtype)
    out = _any_segments_cross(lparts, rparts)

    def in_polys(parts: Column, geom: Column, gtype: str) -> Column:
        if gtype == "polygon":
            return _first_vertex_in_polygon(parts, geom)
        return F.exists(geom, lambda p: _first_vertex_in_polygon(parts, p))

    if rpoly:
        out = out | in_polys(lparts, rgeom, rtype)
    if lpoly:
        out = out | in_polys(rparts, lgeom, ltype)
    return out


def _point_on_segment(px, py, ax, ay, bx, by) -> Column:
    """Exact point-on-segment: collinear and within the segment bbox (ref
    ``_algorithms/intersection.py:9-40`` segment_intersects_point)."""
    return (_tri_orient(ax, ay, bx, by, px, py) == 0) & _between(
        px, py, ax, ay, bx, by
    )


def st_point_intersects(px: Column, py: Column, geom: Column, geom_type: str) -> Column:
    """Point-vs-geometry `intersects`, the reference's point family (ref
    ``geometry/point.py:87-149,212-321``): equality for points, vertex
    membership for multipoints, on-segment for line families, interior
    test for polygon families."""
    if geom_type == "point":
        return (px == geom["x"]) & (py == geom["y"])
    if geom_type == "multipoint":
        n = (F.size(geom) / 2).cast("int")
        return F.exists(
            _seq0(n),
            lambda i: (F.get(geom, 2 * i) == px) & (F.get(geom, 2 * i + 1) == py),
        )
    if geom_type in ("line", "ring"):
        npts = (F.size(geom) / 2).cast("int")
        return F.exists(
            _seq0(npts - 1),
            lambda i: _point_on_segment(
                px, py,
                F.get(geom, 2 * i), F.get(geom, 2 * i + 1),
                F.get(geom, 2 * i + 2), F.get(geom, 2 * i + 3),
            ),
        )
    if geom_type == "multiline":
        return F.exists(
            geom, lambda part: st_point_intersects(px, py, part, "line")
        )
    if geom_type == "polygon":
        return st_point_in_polygon(px, py, geom)
    if geom_type == "multipolygon":
        return st_point_in_multipolygon(px, py, geom)
    raise ValueError(f"unknown geom_type: {geom_type}")
