"""Interval (range) join — point-in-interval matching at scale.

``interval_join(points, intervals)`` pairs every point row with every
interval row whose ``[start, end]`` contains the point's value. The naive
plan is a cross join with an inequality filter (BroadcastNestedLoopJoin —
fine only when one side broadcasts); the scale plan here is the 1-D
bucket equi-join, the same family as the 2-D grid spatial join
(``operators/sjoin.py``):

1. each interval explodes to the bucket range its span covers
   (``sequence(floor(start/w), floor(end/w))``);
2. each point maps to exactly ONE bucket — so unlike the 2-D grid join
   no post-join dedup is needed: a (point, interval) pair can only meet
   in the point's bucket;
3. shuffle hash equi-join on the bucket id, then the exact
   ``start <= v <= end`` refinement.

Bucket width trades interval fan-out (≈ span/width rows per interval)
against bucket collision volume; pick it near the median interval span.
AQE's skew-join splitting covers hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with ``start <= value <= end``.

    ``how``: 'inner' or 'left' (left keeps unmatched points with null
    interval columns). Column-name collisions between the two inputs are
    rejected (rename first). Intervals with ``start > end`` never match."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}; rename first")

    w = float(bucket_width)
    p = points.withColumn(
        "__b", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    )
    valid = intervals.filter(F.col(start_col) <= F.col(end_col))
    iv = valid.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(w)).cast("long"),
                F.floor(F.col(end_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    exact = (F.col(value_col) >= F.col(start_col)) & (
        F.col(value_col) <= F.col(end_col)
    )
    inner = p.join(iv, "__b").filter(exact).drop("__b")

    if how == "inner":
        return inner

    # left: recover unmatched points via anti-join (no second pass over
    # the matched pairs), then pad the interval columns with nulls
    matched_keys = inner.select(*points.columns)
    unmatched = p.drop("__b").join(
        matched_keys, on=list(points.columns), how="left_anti"
    )
    for c in intervals.columns:
        dt = dict(intervals.dtypes)[c]
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dt))
    return inner.unionByName(unmatched)
