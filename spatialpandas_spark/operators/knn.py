"""Exact k-nearest-neighbor spatial join for point sets.

``sjoin_knn(left, right, k)`` pairs every left point with its ``k``
nearest right points by euclidean distance (ties broken by right id —
fully deterministic). The scale design is a *level-doubling grid join*:

- round j buckets both sides into cells of width ``cell_size * 2^j`` and
  joins each unresolved left point against the 3×3 cell neighborhood —
  constant fan-out (9 cells) per left per round, a plain hash equi-join
  on the cell key;
- a left row is RESOLVED at round j when its k-th candidate distance is
  <= the cell width: the 3×3 neighborhood provably contains every point
  within one cell width, so nothing closer can live outside it (the
  standard grid-ring guarantee);
- unresolved rows (sparse neighborhoods) escalate to the next level,
  where cells are twice as wide. Levels are logarithmic in
  (extent / cell_size); the final level covers the whole extent, so
  every row terminates — worst case it degrades to brute force exactly
  for the rows that need it, never for the bulk.

Each round shuffles only the still-unresolved lefts (typically a
vanishing fraction after round 0 when ``cell_size`` is near the k-th
neighbor distance) plus one re-bucketing pass over the right side. The
per-left candidate ranking uses a window keyed by left id over
neighborhood-bounded candidates — never the whole corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sjoin_knn(
    left: DataFrame,
    right: DataFrame,
    k: int,
    cell_size: float,
    left_id: str = "lid",
    right_id: str = "rid",
    left_geom: str = "geom",
    right_geom: str = "geom",
    extent: float | None = None,
) -> DataFrame:
    """Exact kNN join of two point frames (struct<x,y> geometry columns).

    Output: (left_id, right_id, dist2, rank) — squared distance (exact
    double arithmetic, no sqrt) and 1-based rank per left row; rows with
    rank <= min(k, |right|). ``cell_size`` tunes round-0 selectivity:
    pick ~ the expected k-th neighbor distance. ``extent`` (max of the
    data's x/y span) bounds the level count; computed from the right
    side when omitted (one tiny agg job)."""
    if k <= 0:
        raise ValueError("k must be positive")
    if cell_size <= 0:
        raise ValueError("cell_size must be positive")

    l0 = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_geom)["x"].alias("__lx"),
        F.col(left_geom)["y"].alias("__ly"),
    )
    r0 = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_geom)["x"].alias("__rx"),
        F.col(right_geom)["y"].alias("__ry"),
    )

    if extent is None:
        # the last level's 3x3 must cover the farthest possible (left,
        # right) pair, so the extent spans the UNION of both point sets
        pts = l0.select(
            F.col("__lx").alias("x"), F.col("__ly").alias("y")
        ).unionByName(r0.select(F.col("__rx").alias("x"), F.col("__ry").alias("y")))
        b = pts.agg(
            F.max("x").alias("x1"), F.min("x").alias("x0"),
            F.max("y").alias("y1"), F.min("y").alias("y0"),
        ).first()
        if r0.isEmpty():
            return l0.sparkSession.createDataFrame(
                [], f"{left_id} long, {right_id} long, dist2 double, rank int"
            )
        extent = max(b["x1"] - b["x0"], b["y1"] - b["y0"], cell_size)

    n_levels = max(1, math.ceil(math.log2(extent / cell_size)) + 2)

    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    unresolved = l0
    results = []
    for j in range(n_levels):
        w = float(cell_size * (2**j))
        last = j == n_levels - 1
        rj = r0.select(
            "__rid", "__rx", "__ry",
            F.struct(
                F.floor(F.col("__rx") / F.lit(w)).alias("cx"),
                F.floor(F.col("__ry") / F.lit(w)).alias("cy"),
            ).alias("__cell"),
        )
        lj = unresolved.select(
            "__lid", "__lx", "__ly",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.floor(F.col("__lx") / F.lit(w)) + dx).alias("cx"),
                            (F.floor(F.col("__ly") / F.lit(w)) + dy).alias("cy"),
                        )
                        for dx, dy in offsets
                    ]
                )
            ).alias("__cell"),
        )
        # explicit products, not pow(): bit-identical to `(a-b)*(a-b)` in
        # any engine, so SQL oracles reproduce dist2 exactly
        ddx = F.col("__lx") - F.col("__rx")
        ddy = F.col("__ly") - F.col("__ry")
        d2 = ddx * ddx + ddy * ddy
        cand = lj.join(rj, "__cell").select(
            "__lid", "__rid", d2.alias("__d2")
        )
        wnd = Window.partitionBy("__lid").orderBy(
            F.col("__d2").asc(), F.col("__rid").asc()
        )
        ranked = (
            cand.withColumn("__rk", F.row_number().over(wnd))
            .filter(F.col("__rk") <= k)
        )
        # resolved iff the k-th (or last available at the final level)
        # candidate lies within one cell width of the query point
        per_left = ranked.groupBy("__lid").agg(
            F.count("*").alias("__n"), F.max("__d2").alias("__maxd2")
        )
        if last:
            ok = per_left  # final level: 3x3 covers the whole extent
        else:
            ok = per_left.filter(
                (F.col("__n") >= k) & (F.col("__maxd2") <= F.lit(w * w))
            )
        results.append(
            ranked.join(ok.select("__lid"), "__lid", "left_semi")
            .localCheckpoint(eager=True)
        )
        if last:
            break
        # checkpoint the shrinking unresolved set: without it each round's
        # anti-join chain re-evaluates every previous round's window
        unresolved = unresolved.join(
            ok.select("__lid"), "__lid", "left_anti"
        ).localCheckpoint(eager=True)
        if unresolved.isEmpty():
            break

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        F.col("__lid").alias(left_id),
        F.col("__rid").alias(right_id),
        F.col("__d2").alias("dist2"),
        F.col("__rk").cast("int").alias("rank"),
    )
