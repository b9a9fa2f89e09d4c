"""Streaming PPS systematic sampling: the weight-proportional sampler
(operators/sampling.py systematic_sample) under the foreachBatch
ingestion loop.

The lattice construction makes the incremental form exact with ONE
NUMBER of state: the batch's rows occupy global positions
``[carry, carry + batch_weight)`` on the weight line, and the global
lattice ``offset + k*step`` restricted to that span is exactly the
LOCAL lattice with offset ``(offset - carry) mod step`` — so each
micro-batch runs the unchanged batch operator with a shifted offset and
the streamed selection (ids AND multiplicities) equals one batch
``systematic_sample`` over the concatenation of all batches in
(micro-batch order, ``order_cols`` order). That identity is the twin
test.

Exactly-once mirrors streaming/sequences.py: the carried total is
written under a ``batch=N`` state partition (dynamic overwrite), a
replayed batch re-reads the batch-(N-1) state; selected rows land in a
``sample_batch=N`` output partition. Driver-side data per batch: one
carry row in, one summed weight out — two bounded one-row exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialpandas_spark.operators.sampling import systematic_sample
from spatialpandas_spark.streaming._state import read_state_frame

_STATE_SCHEMA = "batch long, carry long"


def _read_carry(
    spark: SparkSession, state_path: str, before_batch: int
) -> int:
    """Total ingested weight as of the latest batch STRICTLY BEFORE
    ``before_batch`` (replay safety, as in streaming/sequences.py).
    Only a MISSING state path reads as "first batch" — any other read
    failure propagates so the micro-batch retries instead of silently
    resetting the lattice (streaming/_state.py)."""
    st = read_state_frame(spark, state_path, _STATE_SCHEMA)
    if st is None:
        return 0
    row = (
        st.filter(F.col("batch") < before_batch)
        .orderBy(F.col("batch").desc())
        .limit(1)
        .collect()
    )
    return int(row[0]["carry"]) if row else 0


def sample_pps_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    weight_col: str,
    step: int,
    order_cols: list | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    offset: int | None = None,
    output_path: str | None = None,
    batch_id: int = 0,
) -> DataFrame:
    """One incremental step (also the foreachBatch body): shift the
    lattice by the carried total, run the batch sampler, advance the
    carry. Returns the batch's selected rows (+ ``n_hits``)."""
    import hashlib

    st = int(step)
    if st <= 0:
        raise ValueError("step must be positive")
    if offset is None:
        offset = (
            int(hashlib.md5(f"{seed}:pps".encode()).hexdigest()[:15], 16)
            % st
        )
    carry = _read_carry(spark, state_path, batch_id)
    local_off = (int(offset) - carry) % st
    out = systematic_sample(
        batch,
        weight_col,
        order_cols or [id_col],
        step=st,
        offset=local_off,
    )
    # bounded: ONE summed weight row
    w = batch.agg(F.sum(F.col(weight_col)).alias("w")).first()["w"]
    new_carry = carry + int(w or 0)
    if output_path is not None:
        (
            out.withColumn("sample_batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("sample_batch")
            .parquet(output_path)
        )
    (
        spark.createDataFrame(
            [(int(batch_id), new_carry)], _STATE_SCHEMA
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(state_path)
    )
    return out


def stream_pps_sample(
    stream: DataFrame,
    state_path: str,
    output_path: str,
    checkpoint_path: str,
    weight_col: str,
    step: int,
    id_col: str = "doc_id",
    seed: int = 42,
):
    """Attach the incremental sampler to a streaming frame. Returns the
    started ``StreamingQuery``."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sample_pps_batch(
            batch.sparkSession,
            batch,
            state_path,
            weight_col,
            step,
            id_col=id_col,
            seed=seed,
            output_path=output_path,
            batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
