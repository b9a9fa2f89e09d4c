"""Seeded random geometry generators per FIXTURES.md (deterministic analogs
of the reference's hypothesis strategies, ref tests/geometry/strategies.py)."""

from __future__ import annotations

import math

import numpy as np


def gen_points(rng: np.random.Generator, n: int, null_frac: float = 0.01):
    """[(id, (x, y) | None)] cluster-centered like st_point_array."""
    out = []
    for i in range(n):
        if rng.random() < null_frac:
            out.append((i, None))
            continue
        cx, cy = rng.uniform(-50, 50, 2)
        out.append((i, (float(cx + rng.uniform(-2.5, 2.5)), float(cy + rng.uniform(-2.5, 2.5)))))
    return out


def gen_lines(rng: np.random.Generator, n: int):
    """Random-walk lines, 2-10 vertices (st_line_array)."""
    out = []
    for i in range(n):
        k = int(rng.integers(2, 11))
        pts = np.cumsum(rng.uniform(-5, 5, (k, 2)), axis=0)
        out.append((i, [float(v) for v in pts.ravel()]))
    return out


def gen_convex_polygon(rng: np.random.Generator, holes_max: int = 2):
    """Valid polygon: convex CCW shell from sorted random angles + 0..2
    shrunk CW hole copies."""
    k = int(rng.integers(4, 10))
    angles = np.sort(rng.uniform(0, 2 * math.pi, k))
    radius = rng.uniform(3, 10)
    cx, cy = rng.uniform(-50, 50, 2)
    xs = cx + radius * np.cos(angles)
    ys = cy + radius * np.sin(angles)
    shell = []
    for x, y in zip(xs, ys):
        shell += [float(x), float(y)]
    shell += shell[:2]  # close
    rings = [shell]
    for _ in range(int(rng.integers(0, holes_max + 1))):
        scale = rng.uniform(0.2, 0.5)
        hx = cx + scale * (xs - cx)
        hy = cy + scale * (ys - cy)
        hole = []
        # reversed order -> CW
        for x, y in zip(hx[::-1], hy[::-1]):
            hole += [float(x), float(y)]
        hole += hole[:2]
        rings.append(hole)
    return rings


def gen_polygons(rng: np.random.Generator, n: int):
    return [(i, gen_convex_polygon(rng)) for i in range(n)]


def _ring_min_center_dist(xs, ys, cx, cy) -> float:
    """Min distance from (cx, cy) to the ring's boundary segments."""
    best = math.inf
    k = len(xs)
    for i in range(k):
        ax, ay = xs[i] - cx, ys[i] - cy
        bx, by = xs[(i + 1) % k] - cx, ys[(i + 1) % k] - cy
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        t = 0.0 if L2 == 0 else max(0.0, min(1.0, -(ax * dx + ay * dy) / L2))
        px, py = ax + t * dx, ay + t * dy
        best = min(best, math.hypot(px, py))
    return best


def gen_star_polygon(rng: np.random.Generator, holes_max: int = 2):
    """CONCAVE shell: sorted angles with independently random radii — the
    varying radii create re-entrant vertices, exactly the geometry the
    reference's Voronoi-polygonization strategies produce (ref
    tests/geometry/strategies.py:142-193) and convex generators never
    exercise (ray-cast/winding paths through re-entrant corners). Holes
    are concave star rings strictly inside (bounded by the measured min
    center-to-boundary distance of the shell), CCW shell / CW holes."""
    k = int(rng.integers(6, 16))
    angles = np.sort(rng.uniform(0, 2 * math.pi, k))
    # distinct angles: re-draw collided ones deterministically
    while len(np.unique(angles)) < k:
        angles = np.sort(rng.uniform(0, 2 * math.pi, k))
    radii = rng.uniform(2.0, 10.0, k)
    cx, cy = rng.uniform(-50, 50, 2)
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    shell = []
    for x, y in zip(xs, ys):
        shell += [float(x), float(y)]
    shell += shell[:2]
    rings = [shell]
    clearance = _ring_min_center_dist(xs, ys, cx, cy)
    n_holes = int(rng.integers(0, holes_max + 1))
    if clearance > 0.8:
        for _ in range(n_holes):
            hk = int(rng.integers(5, 9))
            ha = np.sort(rng.uniform(0, 2 * math.pi, hk))
            hr = rng.uniform(0.2, 0.85, hk) * clearance
            hx = cx + hr * np.cos(ha)
            hy = cy + hr * np.sin(ha)
            hole = []
            for x, y in zip(hx[::-1], hy[::-1]):  # reversed -> CW
                hole += [float(x), float(y)]
            hole += hole[:2]
            rings.append(hole)
    return rings


def gen_ortho_polygon(rng: np.random.Generator):
    """CONCAVE rectilinear polygon: a skyline/staircase of 3-7 columns
    with independent heights (L / C / staircase shapes), optionally with
    one rectangular hole inside the tallest column. Axis-parallel edges
    produce the grazing / collinear-touch cases star polygons don't."""
    m = int(rng.integers(3, 8))
    heights = rng.uniform(2.0, 12.0, m)
    w = rng.uniform(1.0, 4.0)
    ox, oy = rng.uniform(-50, 50, 2)
    pts = [(0.0, 0.0), (m * w, 0.0), (m * w, float(heights[-1]))]
    for i in range(m - 1, 0, -1):  # right-to-left over column tops (CCW)
        pts.append((i * w, float(heights[i])))
        pts.append((i * w, float(heights[i - 1])))
    pts.append((0.0, float(heights[0])))
    shell = []
    for x, y in pts:
        shell += [float(ox + x), float(oy + y)]
    shell += shell[:2]
    rings = [shell]
    if rng.random() < 0.5:
        i = int(np.argmax(heights))
        x0, x1 = float(ox + i * w + 0.25 * w), float(ox + i * w + 0.75 * w)
        y0, y1 = float(oy + 0.3), float(oy + heights[i] - 0.3)
        if y1 > y0:
            rings.append(  # CW rectangle hole
                [x0, y0, x0, y1, x1, y1, x1, y0, x0, y0]
            )
    return rings


def gen_concave_polygons(rng: np.random.Generator, n: int):
    """Mixed concave battery: stars (re-entrant radial corners) and
    rectilinear skylines (axis-parallel grazing), ~50/50."""
    return [
        (
            i,
            gen_star_polygon(rng)
            if rng.random() < 0.5
            else gen_ortho_polygon(rng),
        )
        for i in range(n)
    ]


def gen_multilines(rng: np.random.Generator, n: int):
    out = []
    for i in range(n):
        parts = []
        for _ in range(int(rng.integers(1, 6))):
            k = int(rng.integers(2, 4))
            pts = np.cumsum(rng.uniform(-5, 5, (k, 2)), axis=0)
            parts.append([float(v) for v in pts.ravel()])
        out.append((i, parts))
    return out


def gen_rects(rng: np.random.Generator, n: int):
    """Query rects incl. ~10% inverted and ~5% degenerate (FIXTURES §7)."""
    out = []
    for i in range(n):
        x0, y0 = rng.uniform(-60, 60, 2)
        w, h = rng.uniform(0, 40, 2)
        r = rng.random()
        if r < 0.05:
            rect = (float(x0), float(y0), float(x0), float(y0 + h))
        elif r < 0.15:
            rect = (float(x0 + w), float(y0 + h), float(x0), float(y0))
        else:
            rect = (float(x0), float(y0), float(x0 + w), float(y0 + h))
        out.append((i, rect))
    return out
