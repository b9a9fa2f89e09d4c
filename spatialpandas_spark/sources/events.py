"""Schema-adaptive events reader.

The driver-generated ``events.parquet`` fixture has shipped with two
different physical types for the ``ts`` column across generations:

- ``TIMESTAMP(NANOS)``, which Spark's parquet reader only exposes as a
  nanosecond ``bigint`` via ``spark.sql.legacy.parquet.nanosAsLong``;
- ``timestamp[us]`` (no UTC adjustment), which Spark reads natively as
  ``TIMESTAMP_NTZ``.

Every consumer routes through :func:`read_events` /
:func:`normalize_event_ts` so the rest of the engine sees exactly one
canonical shape: ``ts`` as a microsecond-precision ``TIMESTAMP`` whose
wall-clock equals the stored UTC instant. Keeping the adaptation in one
place is also the 100 TB posture — a production lake accretes files with
both encodings, and per-file branching belongs in the source, not in
every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as a microsecond TIMESTAMP regardless of
    whether it arrived as legacy nanosecond ``bigint``, ``timestamp_ntz``,
    or an already-zoned ``timestamp``."""
    dt = dict(df.dtypes).get(col)
    if dt is None or dt == "timestamp":
        return df
    if dt == "bigint":
        # legacy TIMESTAMP(NANOS) surfaced via nanosAsLong: epoch nanos
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    if dt.startswith("timestamp"):
        # TIMESTAMP_NTZ: the fixture's wall-clock IS the UTC instant; the
        # cast is lossless because read_events pins the session zone to UTC
        return df.withColumn(col, F.col(col).cast("timestamp"))
    raise TypeError(f"unsupported events.{col} dtype: {dt}")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read ``{sf_dir}/events.parquet`` with ``ts`` normalized to a
    microsecond TIMESTAMP (UTC instant)."""
    # harmless when ts is already timestamp[us]; required for nanos files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # make the NTZ->TIMESTAMP cast (and epoch extraction downstream) agree
    # with the oracle engines, which treat the naive value as UTC
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    return normalize_event_ts(df)
