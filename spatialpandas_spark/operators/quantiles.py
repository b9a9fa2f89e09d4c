"""Per-group quantile thresholds for corpus filtering.

The curation idiom "drop documents below the p-th percentile of X within
their language/source" is a two-stage plan: a tiny per-group aggregate
(one row per group) broadcast back against the corpus — never a global
sort.

Two aggregation modes:
- ``approx=True`` (default): ``percentile_approx`` (t-digest-style sketch,
  single pass, mergeable) — the 100 TB path.
- ``approx=False``: exact interpolated ``percentile`` — cross-engine
  deterministic (DuckDB ``quantile_cont`` computes the same definition),
  used by the gate oracle; per-group sort cost, fine up to ~10^8 rows per
  group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_percentile_thresholds(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | str,
    p: float,
    approx: bool = True,
    threshold_col: str = "threshold",
) -> DataFrame:
    """One row per group: the p-th percentile of ``value_col``."""
    if not 0.0 <= p <= 1.0:
        raise ValueError("p must be in [0, 1]")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    agg = (
        F.percentile_approx(F.col(value_col), p)
        if approx
        else F.percentile(F.col(value_col), p)
    )
    return df.groupBy(*groups).agg(agg.alias(threshold_col))


def filter_by_group_percentile(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | str,
    p: float,
    keep: str = "above",
    approx: bool = True,
) -> DataFrame:
    """Keep rows whose ``value_col`` is >= (``keep="above"``) or <=
    (``keep="below"``) their group's p-th percentile. The thresholds table
    is one row per group — broadcast-joined, so the corpus never
    shuffles."""
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    thr = group_percentile_thresholds(df, value_col, groups, p, approx)
    joined = df.join(F.broadcast(thr), groups, "left")
    cond = (
        F.col(value_col) >= F.col("threshold")
        if keep == "above"
        else F.col(value_col) <= F.col("threshold")
    )
    return joined.filter(cond).select(*df.columns)
