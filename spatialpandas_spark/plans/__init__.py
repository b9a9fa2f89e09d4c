from spatialpandas_spark.plans.inspect import (
    physical_plan,
    scan_info,
    assert_filter_pushdown,
    assert_broadcast_join,
)

__all__ = [
    "physical_plan",
    "scan_info",
    "assert_filter_pushdown",
    "assert_broadcast_join",
]
