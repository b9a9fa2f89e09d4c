"""Pure-Python reference oracles, implemented independently of the engine
(different algorithms where possible) for property-based comparison.
Mirrors the reference's oracle philosophy (SURVEY.md §5) with shapely
unavailable in this runtime."""

from __future__ import annotations

import math


def ring_area(ring: list[float]) -> float:
    """Shoelace via the trapezoid formula (different association than the
    engine's cross-product form)."""
    n = len(ring) // 2
    if n < 3:
        return 0.0
    total = 0.0
    for i in range(n):
        x0, y0 = ring[2 * i], ring[2 * i + 1]
        j = (i + 1) % n
        x1, y1 = ring[2 * j], ring[2 * j + 1]
        total += (x0 - x1) * (y0 + y1)
    return total / 2.0


def polygon_area(poly: list[list[float]]) -> float:
    return sum(ring_area(r) for r in poly)


def ring_length(ring: list[float]) -> float:
    n = len(ring) // 2
    total = 0.0
    for i in range(n - 1):
        x0, y0 = ring[2 * i], ring[2 * i + 1]
        x1, y1 = ring[2 * i + 2], ring[2 * i + 3]
        if all(map(math.isfinite, (x0, y0, x1, y1))):
            total += math.hypot(x1 - x0, y1 - y0)
    return total


def coords_bounds(flat: list[float]):
    xs = [v for i, v in enumerate(flat) if i % 2 == 0 and math.isfinite(v)]
    ys = [v for i, v in enumerate(flat) if i % 2 == 1 and math.isfinite(v)]
    if not xs or not ys:
        nan = float("nan")
        return (nan, nan, nan, nan)
    return (min(xs), min(ys), max(xs), max(ys))


def point_in_ring_winding(x: float, y: float, ring: list[float]) -> int:
    """Winding-number contribution of one ring (the engine uses even-odd ray
    casting — intentionally a different algorithm)."""
    wn = 0
    n = len(ring) // 2
    for i in range(n - 1):
        x0, y0 = ring[2 * i], ring[2 * i + 1]
        x1, y1 = ring[2 * i + 2], ring[2 * i + 3]
        if y0 <= y:
            if y1 > y and (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0) > 0:
                wn += 1
        else:
            if y1 <= y and (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0) < 0:
                wn -= 1
    return wn


def point_in_polygon(x: float, y: float, poly: list[list[float]]) -> bool:
    return sum(point_in_ring_winding(x, y, r) for r in poly) != 0


def _seg_seg(a, b, c, d) -> bool:
    """Segment intersection via parametric clipping (independent of the
    engine's orientation-sign method)."""
    (ax, ay), (bx, by), (cx, cy), (dx, dy) = a, b, c, d
    r = (bx - ax, by - ay)
    s = (dx - cx, dy - cy)
    denom = r[0] * s[1] - r[1] * s[0]
    qp = (cx - ax, cy - ay)
    if denom == 0:
        if qp[0] * r[1] - qp[1] * r[0] != 0:
            return False  # parallel non-collinear
        # collinear: overlap iff 1-D projections overlap
        if abs(r[0]) >= abs(r[1]):
            lo, hi = sorted((ax, bx))
            clo, chi = sorted((cx, dx))
        else:
            lo, hi = sorted((ay, by))
            clo, chi = sorted((cy, dy))
        return max(lo, clo) <= min(hi, chi)
    t = (qp[0] * s[1] - qp[1] * s[0]) / denom
    u = (qp[0] * r[1] - qp[1] * r[0]) / denom
    return 0 <= t <= 1 and 0 <= u <= 1


def line_intersects_rect(ring, rect) -> bool:
    x0, y0, x1, y1 = rect
    if x1 < x0:
        x0, x1 = x1, x0
    if y1 < y0:
        y0, y1 = y1, y0
    if x0 == x1 or y0 == y1:
        return False
    n = len(ring) // 2
    pts = [(ring[2 * i], ring[2 * i + 1]) for i in range(n)]
    for px, py in pts:
        if x0 <= px <= x1 and y0 <= py <= y1:
            return True
    corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    for i in range(n - 1):
        for j in range(4):
            if _seg_seg(pts[i], pts[i + 1], corners[j], corners[j + 1]):
                return True
    return False


def polygon_intersects_rect(poly, rect) -> bool:
    x0, y0, x1, y1 = rect
    if x1 < x0:
        x0, x1 = x1, x0
    if y1 < y0:
        y0, y1 = y1, y0
    if x0 == x1 or y0 == y1:
        return False
    for ring in poly:
        if line_intersects_rect(ring, (x0, y0, x1, y1)):
            return True
    return point_in_polygon(x0, y0, poly)


def bbox_intersects(b1, b2) -> bool:
    return (
        b1[0] <= b2[2] and b1[2] >= b2[0] and b1[1] <= b2[3] and b1[3] >= b2[1]
    )


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)
