"""Two-phase running sum + token-budget shard packing vs pandas oracles."""

import random

import pandas as pd
from pyspark.sql import functions as F

from spatialpandas_spark.operators.rank import with_running_sum
from spatialpandas_spark.operators.shards import pack_shards, shard_summary


def _fixture(spark, seed=7, n=500):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(0, 400)) for i in range(n)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "id long, w long"), rows


def test_running_sum_matches_pandas_cumsum(spark):
    df, rows = _fixture(spark)
    got = (
        with_running_sum(df, ["id"], "w", "rs")
        .orderBy("id")
        .toPandas()
    )
    pdf = pd.DataFrame(sorted(rows), columns=["id", "w"])
    assert (got["rs"].to_numpy() == pdf["w"].cumsum().to_numpy()).all()


def test_running_sum_no_single_partition_exchange(spark):
    from spatialpandas_spark.plans.inspect import physical_plan

    df, _ = _fixture(spark)
    plan = physical_plan(with_running_sum(df, ["id"], "w", "rs"))
    assert "Exchange SinglePartition" not in plan


def test_pack_shards_matches_start_offset_rule(spark):
    df, rows = _fixture(spark)
    budget = 1000
    got = pack_shards(df, "w", ["id"], budget).orderBy("id").toPandas()
    pdf = pd.DataFrame(sorted(rows), columns=["id", "w"])
    excl = pdf["w"].cumsum() - pdf["w"]
    expect = (excl // budget).to_numpy()
    assert (got["shard"].to_numpy() == expect).all()


def test_pack_shards_budget_invariants(spark):
    df, _ = _fixture(spark)
    budget = 1000
    s = shard_summary(df, "w", ["id"], budget).orderBy("shard").collect()
    shards = [r["shard"] for r in s]
    # contiguous shard ids from 0
    assert shards == list(range(len(shards)))
    # every shard but the last reaches the budget including its straddler;
    # and exceeds it by less than one max-weight doc (w < 400)
    for r in s[:-1]:
        assert r["total_weight"] >= budget - 400 + 1
    # total conserved
    assert sum(r["total_weight"] for r in s) == df.agg(F.sum("w")).first()[0]


def test_pack_shards_zero_weights_and_ties(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 5), (4, 0), (5, 7)], "id long, w long"
    )
    got = {r["id"]: r["shard"] for r in pack_shards(df, "w", ["id"], 6).collect()}
    # excl sums: 0,0,0,5,5 -> shards 0,0,0,0,0
    assert got == {1: 0, 2: 0, 3: 0, 4: 0, 5: 0}
