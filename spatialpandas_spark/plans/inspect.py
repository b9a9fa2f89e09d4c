"""Physical-plan inspection helpers.

The engine has no custom Catalyst rules (SURVEY.md §4: none are required —
the reference's hand-built optimizations all map to built-in Catalyst
behavior once expressed declaratively). What it does need is *verification*
that the intended physical properties hold: filters pushed to the scan,
columns pruned, small sides broadcast. These helpers make those properties
assertable in tests and inspectable in notebooks, so a plan regression
(e.g. a UDF accidentally blocking pushdown) fails loudly instead of
becoming a 100 TB surprise.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_info(df: DataFrame) -> list[dict]:
    """Parquet scan nodes from the formatted plan: pushed filters and the
    read schema (column pruning evidence)."""
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    scans = []
    for block in re.split(r"\n\(\d+\) ", plan):
        if not block.startswith("Scan parquet"):
            continue
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: (.*)", block)
        location = re.search(r"Location: \S+ \[(.*?)\]", block)
        scans.append(
            {
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_schema": schema.group(1).strip() if schema else "",
                "location": location.group(1) if location else "",
            }
        )
    return scans


def assert_filter_pushdown(df: DataFrame, column: str) -> None:
    """Assert some predicate on `column` reached a parquet scan."""
    scans = scan_info(df)
    if not any(column in s["pushed_filters"] for s in scans):
        raise AssertionError(
            f"no pushed filter mentions {column!r}; scans: {scans}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    """Assert the plan contains a broadcast join (small side broadcast,
    big side never shuffled)."""
    plan = physical_plan(df)
    if "Broadcast" not in plan:
        raise AssertionError("expected a broadcast join in plan:\n" + plan[:2000])
