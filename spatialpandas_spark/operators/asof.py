"""As-of (nearest-event) join — the temporal join Spark lacks natively.

``asof_join(left, right, on="ts", by="user_id")`` attaches to each left
row the right row with the greatest ``right.ts <= left.ts`` within the
same ``by`` group (direction="backward"; "forward" takes the smallest
``right.ts >= left.ts``). The pandas/DuckDB ``merge_asof``/``ASOF JOIN``
semantics, left-outer: unmatched left rows keep nulls.

Implementation is the union-window shape (no join explosion, no Python):

1. union left and right rows into one keyed stream, right rows carrying
   their payload as a struct, left rows null;
2. one window per ``by`` group ordered by (time, side, payload):
   ``last(payload, ignorenulls=True)`` over the preceding frame picks the
   nearest right row — right sorts before left at equal times, making the
   match inclusive;
3. keep left rows, unpack the matched struct.

Scale: the only shuffle is the window's hash partition on ``by`` — the
same movement any per-key operator needs; there is no single-task stage
(``by`` is required for exactly this reason) and no cross product. Ties
(two right rows with equal time in one group) resolve deterministically
to the largest payload struct in field order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_on: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left-outer as-of join. ``on``/``right_on`` are the time (or any
    orderable) columns; ``by`` the equality key(s) — required, because an
    un-keyed as-of is a global sort (single task) at scale.

    ``tolerance`` (optional) null-outs matches farther than the given gap:
    pass something subtractable from the time column (an interval literal
    for timestamps, a number for numeric times).

    Output: every left column, plus each non-``by`` right column renamed
    with ``suffix`` when it collides with a left column."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    r_on = right_on or on
    by_list = [by] if isinstance(by, str) else list(by)
    if not by_list:
        raise ValueError("asof_join requires a non-empty 'by' key")

    payload_cols = [c for c in right.columns if c not in by_list]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }

    lrow_type = left.select(F.struct(*left.columns).alias("s")).schema[0].dataType
    rrow_type = (
        right.select(F.struct(*payload_cols).alias("s")).schema[0].dataType
    )

    lu = left.select(
        *[F.col(c) for c in by_list],
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rv"),
    )
    ru = right.select(
        *[F.col(c) for c in by_list],
        F.col(r_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        F.struct(*payload_cols).alias("__rv"),
    )
    u = lu.unionByName(ru)

    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*by_list)
        .orderBy(t_order, F.col("__is_left").asc(), F.col("__rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w)).filter(
        F.col("__is_left") == 1
    )

    if tolerance is not None:
        mt = F.col("__m")[r_on]
        in_tol = (
            mt >= F.col("__t") - tolerance
            if direction == "backward"
            else mt <= F.col("__t") + tolerance
        )
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m")).otherwise(F.lit(None).cast(rrow_type))
        )

    return matched.select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__m")[c].alias(out_names[c]) for c in payload_cols],
    )
