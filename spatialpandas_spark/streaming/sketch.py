"""Streaming KMV sketch maintenance: per-source corpus synopses that
stay current as documents stream in.

The batch operator (operators/sketch.py) sketches a corpus in one scan;
incrementally, each micro-batch's sketch MERGES into the running one by
the KMV rule (bottom-k of the union — sketches are mergeable by
construction), so after any number of batches the maintained state
equals ``shingle_sketch`` over the concatenation of all batches EXACTLY
— not approximately: the sketch is a pure function of the accumulated
shingle SET, and merge-of-bottom-k == bottom-k-of-union. That identity
is the twin test.

State layout mirrors streaming/sequences.py's exactly-once discipline:
the FULL merged sketch (tiny: ≤ k rows per group) is written under a
``batch=N`` partition via dynamic partition overwrite; a replayed batch
re-reads the batch-(N-1) state it read the first time and overwrites
its own partition — idempotent end to end, no at-least-once caveat.
Rewriting the whole synopsis per batch is the right trade precisely
because a synopsis is small by definition; the corpora it summarizes
never re-scan.

Scale: per batch, one scan of the BATCH (not the accumulated corpus),
one k-rows-per-group state read, one bounded window over ≤ 2k rows per
group. Driver-side data: one max-batch probe row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialpandas_spark.operators.sketch import kmv_merge, shingle_sketch
from spatialpandas_spark.streaming._state import read_state_frame


def _read_state(
    spark: SparkSession,
    state_path: str,
    before_batch: int,
    group_cols: list[str],
) -> DataFrame | None:
    """Merged sketch as of the latest batch STRICTLY BEFORE
    ``before_batch`` (so a replayed batch N reconsumes the batch-(N-1)
    state, never its own half-written one); None when no prior batch
    exists. Only a MISSING state path reads as "no prior batch" — any
    other read failure propagates so the micro-batch retries instead of
    silently resetting the sketch (streaming/_state.py)."""
    st = read_state_frame(spark, state_path)
    if st is None:
        return None
    prev = (
        st.filter(F.col("batch") < before_batch)
        .agg(F.max("batch"))
        .first()[0]
    )
    if prev is None:
        return None
    return st.filter(F.col("batch") == prev).select(
        *group_cols, "rank", "h"
    )


def sketch_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    k: int = 256,
    text_col: str = "text",
    n: int = 5,
    seed: int = 42,
    group_cols: list[str] | None = None,
    batch_id: int = 0,
) -> DataFrame:
    """One incremental step (also the foreachBatch body): sketch the
    micro-batch, KMV-merge with the carried state, overwrite this
    batch's state partition. Returns the merged sketch
    (``*group_cols, rank, h``) — identical to ``shingle_sketch`` over
    everything ingested so far."""
    groups = list(group_cols or [])
    cur = shingle_sketch(
        batch, text_col, n=n, k=k, seed=seed, group_cols=groups
    )
    prev = _read_state(spark, state_path, batch_id, groups)
    merged = cur if prev is None else kmv_merge(prev, cur, k, groups)
    (
        merged.withColumn("batch", F.lit(int(batch_id)))
        .repartition(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(state_path)
    )
    return spark.read.parquet(state_path).filter(
        F.col("batch") == int(batch_id)
    ).select(*groups, "rank", "h")


def load_sketch(
    spark: SparkSession, state_path: str, group_cols: list[str] | None = None
) -> DataFrame:
    """The current maintained sketch (latest batch partition) — feed it
    to ``kmv_overlap`` / ``kmv_overlap_matrix`` / ``kmv_summary``."""
    groups = list(group_cols or [])
    sk = _read_state(spark, state_path, 1 << 62, groups)
    if sk is None:
        raise FileNotFoundError(f"no sketch state at {state_path}")
    return sk


def stream_sketch_ingest(
    stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    k: int = 256,
    text_col: str = "text",
    n: int = 5,
    seed: int = 42,
    group_cols: list[str] | None = None,
):
    """Attach sketch maintenance to a streaming document frame. Returns
    the started ``StreamingQuery``."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sketch_batch(
            batch.sparkSession,
            batch,
            state_path,
            k=k,
            text_col=text_col,
            n=n,
            seed=seed,
            group_cols=group_cols,
            batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
