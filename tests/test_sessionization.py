"""Nanosecond→microsecond conversion exactness and the 1800 s session
boundary (VERDICT round 1, "What's wrong" #2)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bad_ns_value() -> int:
    # find a 2026-epoch nanosecond value where double division ns/1000
    # differs from exact integer division
    base = 1_767_225_600_000_000_000  # 2026-01-01T00:00:00Z in ns
    for off in range(0, 2_000_000, 7):
        n = base + off * 1_000 + 999
        if int(n / 1000) != n // 1000:
            return n
    raise AssertionError("no divergent value found")


def test_integer_div_matches_python_floor_div(spark):
    n = _bad_ns_value()
    assert int(n / 1000) != n // 1000  # double division is actually wrong here
    df = spark.createDataFrame([(n,)], "ts long")
    got = df.select(F.expr("ts div 1000").alias("us")).first()["us"]
    assert got == n // 1000


def test_session_boundary_exact_1800s_gap(spark):
    # two events exactly 1800 s apart -> ONE session (break requires > 1800 s);
    # a third event 1800.000001 s later -> a second session
    t0 = _bad_ns_value()
    t1 = t0 + 1800 * 1_000_000_000
    t2 = t1 + 1800 * 1_000_000_000 + 1_000
    df = spark.createDataFrame(
        [(1, 10, t0), (2, 10, t1), (3, 10, t2)], "event_id long, user_id long, ts long"
    )
    e = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    n_sessions = (
        df.sparkSession.createDataFrame(e.collect(), e.schema)
        .withColumn("new_s", is_new)
        .agg(F.sum("new_s").alias("s"))
        .first()["s"]
    )
    assert n_sessions == 2
