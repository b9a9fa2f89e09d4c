"""``.cx``-style bounding-box selection (ref ``geometry/base.py:575-729``).

The reference probes a packed Hilbert R-tree, takes fully-covered rows
without an exact test, and refines the maybe-overlapping rows with the exact
``intersects_bounds`` kernel. The Spark-idiomatic equivalent of the whole
structure is a single filter whose conjuncts are ordered cheap-to-expensive:

    bbox-vs-bounds (pushable double comparisons)  AND  exact refinement

Catalyst pushes the bbox conjunct into the parquet scan (file/row-group
skipping via min/max stats over Hilbert-sorted data — this *is* the R-tree's
role at scale), and evaluates `And` left-to-right so the exact test only runs
on bbox survivors. The covers-shortcut (``rtree.py:222-239``) becomes a
``CASE WHEN fully-covered THEN true``, skipping the exact test per-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spatialpandas_spark.functions.measures import st_bounds
from spatialpandas_spark.functions.predicates import (
    Bounds,
    _orient,
    bbox_intersects_bounds,
    st_intersects_bounds,
)


def with_bounds(
    df: DataFrame, geom: str, geom_type: str, bounds_col: str = "bounds"
) -> DataFrame:
    """Materialize the per-row bounds struct for `geom`. Always call before
    writing spatial parquet — the stored doubles are what parquet stats
    skipping (and the manifest) index, replacing the reference's persistent
    R-tree (SURVEY.md §2.9)."""
    return df.withColumn(bounds_col, st_bounds(F.col(geom), geom_type))


def _covered(bounds: Column, rect: Bounds) -> Column:
    x0, y0, x1, y1 = _orient(rect)
    return (
        (bounds["x0"] >= F.lit(x0))
        & (bounds["x1"] <= F.lit(x1))
        & (bounds["y0"] >= F.lit(y0))
        & (bounds["y1"] <= F.lit(y1))
    )


def cx_expr(
    geom: Column,
    geom_type: str,
    rect: Bounds,
    bounds: Column | None = None,
) -> Column:
    """Filter expression: geometry intersects the query rect.

    With a materialized ``bounds`` column the bbox conjunct is pushable;
    otherwise bounds are computed on the fly (no pushdown, still cheap).
    """
    b = bounds if bounds is not None else st_bounds(geom, geom_type)
    bbox = bbox_intersects_bounds(b, rect)
    if geom_type in ("point",):
        # bbox test IS the exact test for points
        return bbox
    exact = F.when(_covered(b, rect), F.lit(True)).otherwise(
        st_intersects_bounds(geom, geom_type, rect)
    )
    return bbox & exact


def cx_filter(
    df: DataFrame,
    geom: str,
    geom_type: str,
    rect: Bounds,
    bounds_col: str | None = "bounds",
) -> DataFrame:
    """``df.cx[x0:x1, y0:y1]`` equivalent: rows whose geometry intersects the
    rectangle. Open-ended slices are expressed by passing ±inf in `rect`."""
    bounds = (
        F.col(bounds_col)
        if bounds_col is not None and bounds_col in df.columns
        else None
    )
    return df.filter(cx_expr(F.col(geom), geom_type, rect, bounds))
