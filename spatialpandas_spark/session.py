"""SparkSession builder with scale-appropriate defaults.

Tests run on ``local[N]``; production targets a 1000-executor cluster against
~100 TB. The settings below are the ones that matter at both scales: AQE for
runtime re-planning (skew joins, coalescing post-shuffle partitions), Arrow for
the pandas-UDF boundary, and a shuffle-partition count that callers override
per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spatialpandas_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # production default (Spark's own 128m). The local test/bench
        # harnesses override DOWN via SPARK_GRAFT_MAX_PARTITION_BYTES=4m so
        # MB-scale fixture files still split across cores — never the
        # reverse (a 4m default at 100 TB would mean ~25M splits).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        # AQE coalescing targets BYTES, but Arrow kernel stages cost
        # per-row compute orders of magnitude above their byte size; at
        # the bench's MB-scale inputs the 1m default packs a whole
        # heavy stage into 1-2 tasks (round-14 b25 profile: one 16 s
        # task). Production keeps Spark's default (partitions there are
        # GB-scale, the floor never binds); the local bench overrides
        # DOWN via SPARK_GRAFT_MIN_PARTITION_SIZE, mirroring the
        # SPARK_GRAFT_MAX_PARTITION_BYTES pattern above.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "1m"),
        )
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Events-pipeline session contract (see sources/events.py): the
        # engine's timestamp semantics are defined against a UTC session
        # zone, and legacy TIMESTAMP(NANOS) parquet is surfaced as bigint.
        # Owned HERE, at session setup — the readers verify rather than
        # silently re-own these mid-session.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # off by default (driver/test runs need no UI); profiling tools
        # (tools/profile_query.py) flip it on to read per-job REST metrics
        .config(
            "spark.ui.enabled",
            os.environ.get("SPARK_GRAFT_UI", "false"),
        )
    )
    return builder.getOrCreate()
