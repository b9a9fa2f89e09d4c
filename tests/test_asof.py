"""as-of join vs pandas merge_asof and hand oracles."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 25), (3, "B", 15), (4, "B", 5), (5, "C", 30)],
        "trade_id long, sym string, t long",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 1.0), ("A", 10, 2.0), ("A", 20, 3.0),
         ("B", 6, 4.0), ("B", 15, 5.0)],
        "sym string, t long, px double",
    )
    return trades, quotes


def test_backward_inclusive(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="t", by="sym")
    got = {r["trade_id"]: (r["t_r"], r["px"]) for r in out.collect()}
    assert got == {
        1: (10, 2.0),   # inclusive: quote at t=10 matches trade at t=10
        2: (20, 3.0),
        3: (15, 5.0),
        4: (None, None),  # no quote at or before t=5 for B
        5: (None, None),  # no quotes for C at all
    }
    assert out.count() == trades.count()  # left-outer


def test_forward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="t", by="sym", direction="forward")
    got = {r["trade_id"]: r["t_r"] for r in out.collect()}
    assert got == {1: 10, 2: None, 3: 15, 4: 6, 5: None}


def test_tolerance(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="t", by="sym", tolerance=F.lit(5))
    got = {r["trade_id"]: r["t_r"] for r in out.collect()}
    # trade 2 at t=25: nearest quote t=20, gap 5 -> kept; others as before
    assert got == {1: 10, 2: 20, 3: 15, 4: None, 5: None}
    out2 = asof_join(trades, quotes, on="t", by="sym", tolerance=F.lit(4))
    got2 = {r["trade_id"]: r["t_r"] for r in out2.collect()}
    assert got2[2] is None


def test_matches_pandas_merge_asof_random(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    lt = pd.DataFrame({
        "lid": np.arange(300),
        "k": rng.integers(0, 7, 300),
        "t": rng.integers(0, 1000, 300),
    })
    rt = pd.DataFrame({
        "k": rng.integers(0, 7, 200),
        "t": rng.integers(0, 1000, 200),
        "v": rng.standard_normal(200).round(6),
    })
    # merge_asof requires unique right (k, t) for a deterministic pick
    rt = rt.drop_duplicates(["k", "t"])
    got = (
        asof_join(
            spark.createDataFrame(lt, "lid long, k long, t long"),
            spark.createDataFrame(rt, "k long, t long, v double"),
            on="t", by="k",
        )
        .orderBy("lid")
        .toPandas()
    )
    expect = pd.merge_asof(
        lt.sort_values("t", kind="stable"),
        rt.sort_values("t", kind="stable"),
        on="t", by="k", suffixes=("", "_r"),
    ).sort_values("lid")
    assert (got["v"].to_numpy() == expect["v"].to_numpy()) [
        ~(pd.isna(got["v"].to_numpy()) & pd.isna(expect["v"].to_numpy()))
    ].all()


def test_no_single_partition_exchange(spark, quotes_trades):
    from spatialpandas_spark.plans.inspect import physical_plan

    trades, quotes = quotes_trades
    plan = physical_plan(asof_join(trades, quotes, on="t", by="sym"))
    assert "Exchange SinglePartition" not in plan
