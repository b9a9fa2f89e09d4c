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

SESSION CONTRACT (load-bearing, session-wide): the events pipeline is
defined against ``spark.sql.session.timeZone=UTC`` — both the
NTZ->TIMESTAMP cast at read time and every downstream wall-clock
extraction (``hour(ts)``, ``unix_*``, window boundaries) are
session-zone-dependent and lazily evaluated, so the zone cannot be set
and restored around the read; it must hold for the life of the queries.
``spatialpandas_spark.session.get_spark`` sets it (plus
``nanosAsLong``) at session construction. For sessions built elsewhere,
:func:`ensure_events_session_confs` applies the contract and WARNS when
it overrides a different pre-existing zone instead of changing it
silently.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENTS_SESSION_CONFS = (
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ("spark.sql.session.timeZone", "UTC"),
)


def ensure_events_session_confs(spark: SparkSession) -> None:
    """Apply the events session contract (UTC zone + nanosAsLong),
    warning — not silent — when a conflicting session zone is replaced.
    Idempotent; a session built by ``session.get_spark`` already
    complies and is untouched."""
    for key, want in _EVENTS_SESSION_CONFS:
        try:
            cur = spark.conf.get(key)
        except Exception:
            cur = None
        if cur == want:
            continue
        if key == "spark.sql.session.timeZone" and cur not in (
            None,
            "UTC",
            "Etc/UTC",
            "Z",
        ):
            warnings.warn(
                f"spatialpandas_spark events reader requires "
                f"{key}={want} for the whole session and is overriding "
                f"the current value {cur!r}; timestamp rendering of other "
                f"queries in this SparkSession changes accordingly. Build "
                f"the session with spatialpandas_spark.session.get_spark "
                f"to own this at setup.",
                stacklevel=3,
            )
        spark.conf.set(key, want)


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
    microsecond TIMESTAMP (UTC instant). Requires the session contract
    documented in this module's docstring (applied with a warning on
    conflict, owned at setup by ``session.get_spark``)."""
    ensure_events_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    return normalize_event_ts(df)


EVENT_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_events_json(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """Read newline-delimited-JSON events (the other common event-feed
    encoding besides parquet) with the SAME output contract as
    ``read_events``: explicit schema (never inferSchema — a schema
    inference pass reads the data twice and locks in whatever the first
    day's files happened to contain), ISO-8601 or epoch-micros ``ts``
    accepted, normalized to a microsecond UTC TIMESTAMP. ``streaming``
    returns a file-source stream of the same shape, so every downstream
    operator (sessionize, rollup, as-of) is encoding-agnostic.

    Scale note: JSON decode is ~10x the CPU of parquet scan per byte —
    fine for ingest-once feeds that immediately land as parquet
    (``df.write.parquet``), wrong as the steady-state storage format;
    the docstring is the nudge."""
    ensure_events_session_confs(spark)
    # ts arrives as string so both ISO-8601 and epoch-micros parse under
    # one explicit schema, then normalize
    raw_ddl = EVENT_DDL.replace("ts TIMESTAMP", "ts STRING")
    reader = (
        spark.readStream if streaming else spark.read
    ).schema(raw_ddl).option("mode", "PERMISSIVE")
    df = reader.json(path)
    ts = F.when(
        F.col("ts").rlike("^[0-9]+$"),
        F.timestamp_micros(F.col("ts").cast("bigint")),
    ).otherwise(F.to_timestamp(F.col("ts")))
    return df.withColumn("ts", ts)
