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
