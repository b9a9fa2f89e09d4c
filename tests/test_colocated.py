"""Bucketed co-located join (zero-Exchange plan) and salted skew join —
the shuffle-elimination playbook asserted at the plan level."""

import pytest

from pyspark.sql import functions as F

from spatialpandas_spark.operators.colocated import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from spatialpandas_spark.plans.inspect import physical_plan


@pytest.fixture()
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    left = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("lval")
    )
    right = spark.range(2_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("rval")
    )
    write_bucketed(left, "t_left_b", "k", n_buckets=8, path=f"{wh}/l")
    write_bucketed(right, "t_right_b", "k", n_buckets=8, path=f"{wh}/r")
    yield "t_left_b", "t_right_b"
    for t in ("t_left_b", "t_right_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join must satisfy distribution from layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, "k")
        plan = physical_plan(j)
        assert "Exchange" not in plan, plan[:2000]
        # and it is correct
        assert j.count() == 10_000 * (2_000 // 500)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("rval").alias("s"))
    )
    exp = (
        spark.table(lt)
        .join(spark.table(rt), "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("rval").alias("s"))
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_row_identical(spark, how):
    # extreme skew: one key holds 90% of rows
    left = spark.range(5_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(120).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rval")
    )
    got = salted_join(left, right, "k", salt=8, how=how)
    exp = left.join(right, "k", how)
    gsum = got.agg(
        F.count("*"), F.sum("lval"), F.sum("rval")
    ).first()
    esum = exp.agg(
        F.count("*"), F.sum("lval"), F.sum("rval")
    ).first()
    assert tuple(gsum) == tuple(esum)


def test_salted_join_splits_hot_key(spark):
    left = spark.range(1_000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    right = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("r"))
    out = salted_join(left, right, "k", salt=8)
    # every left row matched key 7 exactly once
    assert out.count() == 1_000
    # pre-drop salt keys spread the hot key over multiple sub-keys: verify
    # via the same construction the operator uses (content-derived salt)
    n_subkeys = (
        left.withColumn(
            "__sk",
            F.concat_ws(
                "#",
                F.col("k").cast("string"),
                F.pmod(
                    F.xxhash64(F.col("k"), F.col("v")), F.lit(8)
                ).cast("string"),
            ),
        )
        .select("__sk")
        .distinct()
        .count()
    )
    assert n_subkeys > 1


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_null_keys_never_match(spark, how):
    # Null join keys never match in a plain equi-join; the salted variant
    # must preserve that (regression: concat_ws silently skipped nulls,
    # collapsing a null-key left __sk to its bare salt digit).
    left = spark.range(200).select(
        F.when(F.col("id") % 4 == 0, F.lit(None)).otherwise(F.col("id") % 10)
        .cast("long").alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(20).select(
        F.when(F.col("id") % 5 == 0, F.lit(None)).otherwise(F.col("id"))
        .cast("long").alias("k"),
        (F.col("id") * 3).alias("rval"),
    )
    got = salted_join(left, right, "k", salt=8, how=how)
    exp = left.join(right, "k", how)
    gsum = got.agg(F.count("*"), F.sum("lval"), F.sum("rval")).first()
    esum = exp.agg(F.count("*"), F.sum("lval"), F.sum("rval")).first()
    assert tuple(gsum) == tuple(esum)
    # no null-key left row acquired right-side values
    assert (
        got.where(F.col("k").isNull() & F.col("rval").isNotNull()).count() == 0
    )


def test_salted_join_salt_is_deterministic(spark):
    # Same input twice → identical salted keys (content-derived, not
    # monotonically_increasing_id): re-execution under partial stage
    # recompute cannot reassign salts.
    left = spark.range(500).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("lval")
    )
    right = spark.range(7).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rval")
    )
    a = salted_join(left, right, "k", salt=8).orderBy("lval").collect()
    b = (
        salted_join(left.repartition(13), right, "k", salt=8)
        .orderBy("lval")
        .collect()
    )
    assert a == b
