"""Per-group percentile thresholds vs numpy, and the broadcast-join plan."""

import numpy as np

from pyspark.sql import functions as F

from spatialpandas_spark.operators.quantiles import (
    filter_by_group_percentile,
    group_percentile_thresholds,
)


def _fixture(spark, seed=11):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), ["a", "b", "c"][i % 3], int(rng.integers(0, 1000)))
        for i in range(600)
    ]
    return spark.createDataFrame(rows, "id long, g string, v long"), rows


def test_exact_thresholds_match_numpy(spark):
    df, rows = _fixture(spark)
    got = {
        r["g"]: r["threshold"]
        for r in group_percentile_thresholds(
            df, "v", "g", 0.25, approx=False
        ).collect()
    }
    for g in ("a", "b", "c"):
        vs = np.array([v for _, gg, v in rows if gg == g], dtype=float)
        assert abs(got[g] - np.quantile(vs, 0.25)) < 1e-9


def test_filter_above_keeps_upper_tail(spark):
    df, rows = _fixture(spark)
    out = filter_by_group_percentile(df, "v", "g", 0.25, approx=False)
    got = sorted(r["id"] for r in out.collect())
    expect = []
    for g in ("a", "b", "c"):
        vs = np.array([v for _, gg, v in rows if gg == g], dtype=float)
        thr = np.quantile(vs, 0.25)
        expect.extend(i for i, gg, v in rows if gg == g and v >= thr)
    assert got == sorted(expect)
    assert out.columns == df.columns


def test_approx_close_to_exact(spark):
    df, rows = _fixture(spark)
    exact = {
        r["g"]: r["threshold"]
        for r in group_percentile_thresholds(df, "v", "g", 0.5, approx=False).collect()
    }
    approx = {
        r["g"]: r["threshold"]
        for r in group_percentile_thresholds(df, "v", "g", 0.5, approx=True).collect()
    }
    for g in exact:
        assert abs(exact[g] - approx[g]) <= 60  # within a few % of the 0..1000 range


def test_filter_uses_broadcast_join(spark):
    from spatialpandas_spark.plans.inspect import physical_plan

    df, _ = _fixture(spark)
    plan = physical_plan(filter_by_group_percentile(df, "v", "g", 0.5))
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan
