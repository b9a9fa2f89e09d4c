"""Shuffle-elimination tools for repeated large-scale joins.

Two techniques the 100 TB playbook calls for that plain `df.join` never
gives you by itself:

**Bucketed co-location** (`write_bucketed` / `bucketed_join`): persist
both sides bucketed AND sorted by the join key; Spark's bucketing
contract then satisfies the join's distribution requirement from the
table layout, so the sort-merge join runs with ZERO Exchange on either
side — the shuffle is paid once at write time and amortized over every
subsequent join, the standard shape for fact tables joined every run
(events x users, lineitem x orders). Uses ``saveAsTable`` because
bucket metadata lives in the catalog, not the parquet files.

**Key salting** (`salted_join`): for skew too extreme for AQE's
skew-join splitting (one key = 30% of rows), explode the hot side's key
into ``salt`` sub-keys and replicate the small side per sub-key. The
classic trade: ``salt``x duplication of the right side buys a ``salt``-way
split of the hottest reducer. AQE handles moderate skew on its own —
reach for this only when a single key exceeds what one executor can hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` as a catalog table.
    ``n_buckets`` should be sized so one bucket of the LARGER table fits
    an executor core's working set (e.g. 100 TB / 64k buckets ~ 1.6 GB).
    ``path`` makes it an external table (data at an explicit location
    instead of the session warehouse)."""
    w = (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key. With
    matching bucket counts the plan contains no Exchange (verified in
    tests/test_colocated.py); mismatched layouts degrade to a normal
    shuffle join rather than erroring."""
    return spark.table(left_table).join(
        spark.table(right_table), key, how
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an exploded salt on the (large, skewed) left side
    and a replicated right side — splits each hot key across ``salt``
    reducers. Result is row-identical to ``left.join(right, key, how)``
    for inner/left joins (each left row carries exactly one salt value,
    each right row exists once per salt value)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # Salt is a pure function of row content (not monotonically_increasing_id):
    # a non-deterministic salt re-evaluated during partial stage recompute can
    # assign a different sub-key to the same row than the copy already consumed
    # downstream, duplicating or dropping rows (SPARK-23207 class).
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    )
    # Null join keys must stay non-matching, exactly as in a plain equi-join.
    # concat_ws skips nulls, which would collapse a null-key left row's __sk to
    # its bare salt digit and collide with right-side digits — so route null
    # keys to a null __sk (null never equals null in a join condition).
    lk = F.when(
        F.col(key).isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat_ws("#", F.col(key).cast("string"), salt_col.cast("string"))
    )
    salted_l = left.withColumn("__sk", lk)
    rk = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    salted_r = (
        right.withColumn("__salt", rk)
        .withColumn(
            "__sk",
            F.when(
                F.col(key).isNull(), F.lit(None).cast("string")
            ).otherwise(
                F.concat_ws(
                    "#",
                    F.col(key).cast("string"),
                    F.col("__salt").cast("string"),
                )
            ),
        )
        .drop("__salt", key)
    )
    return salted_l.join(salted_r, "__sk", how).drop("__sk")
