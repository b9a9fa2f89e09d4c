"""Streaming deduplication (beyond-reference, SURVEY.md §2.8 surface):
the batch dedup operators re-expressed incrementally for ingest pipelines.

Scale design: both operators keep state bounded by the event-time
watermark — the property that makes them runnable forever on a 100 TB/day
firehose. Exact dedup uses Spark's own
``dropDuplicatesWithinWatermark`` (state = one row per distinct key
inside the watermark horizon); the near-dup filter keeps one winner id
per MinHash band bucket via ``applyInPandasWithState`` with event-time
timeout eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from spatialpandas_spark.operators.dedup import (
    content_hash,
    minhash_signature,
    word_shingles,
)


def dedup_stream_exact(
    docs: DataFrame,
    content_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: emit the first document seen per content
    hash; duplicates arriving within the watermark horizon are dropped.
    (Duplicates farther apart than the watermark pass — that is the
    bounded-state contract, identical to any watermarked streaming dedup.)
    """
    hashed = docs.withColumn("__h", content_hash(*[F.col(c) for c in content_cols]))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )


_NEARDUP_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", LongType()),
        StructField("key", StringType()),
        StructField("winner_id", LongType()),
    ]
)

_NEARDUP_STATE = StructType(
    [
        StructField("winner_id", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def near_dup_suspects_stream(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    watermark: str = "1 hour",
    state_ttl_seconds: int = 3600,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup detector: documents are exploded to
    their LSH band buckets; the first document into a bucket becomes its
    winner, every later arrival is emitted as a suspect row
    ``(doc_id, band, key, winner_id)``. A document colliding in several
    bands yields several rows — aggregate per doc downstream (batch or
    ``foreachBatch``), exactly like the batch ``minhash_lsh_pairs``
    verify stage.

    State is one (winner_id, last_ts) per active bucket, evicted by
    event-time timeout once the watermark passes — bounded, not
    corpus-sized.
    """
    rows_per_band = n_hashes // bands
    shingles = word_shingles(F.col(text_col), shingle_n)
    sig = minhash_signature(shingles, num_hashes=n_hashes)
    # docs too short to shingle have the degenerate all-MAX signature and
    # would all collide in one bucket — exclude them, as the batch
    # ``minhash_lsh_pairs`` does
    docs = docs.filter(F.size(shingles) > 0)
    banded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("__ts"),
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[
                            F.element_at(sig, b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )

    def fn(key, pdfs, state):
        import pandas as pd

        band, bucket = key
        winner, last_ts = state.get if state.exists else (None, None)
        out_ids, out_winners = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("__ts", kind="stable")
            for doc_id, ts in zip(pdf["doc_id"], pdf["__ts"]):
                if winner is None:
                    winner = int(doc_id)
                elif int(doc_id) != winner:
                    out_ids.append(int(doc_id))
                    out_winners.append(winner)
                last_ts = ts
        if state.hasTimedOut:
            state.remove()
        elif winner is not None:
            state.update((winner, last_ts))
            # evict once the watermark passes the bucket's ttl horizon
            last_ms = (
                int(pd.Timestamp(last_ts).value // 1_000_000)
                if last_ts is not None
                else state.getCurrentWatermarkMs()
            )
            state.setTimeoutTimestamp(
                max(
                    last_ms + state_ttl_seconds * 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        if out_ids:
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "band": [band] * len(out_ids),
                    "key": [bucket] * len(out_ids),
                    "winner_id": out_winners,
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        banded.withWatermark("__ts", watermark)
        .groupBy("band", "key")
        .applyInPandasWithState(
            fn,
            outputStructType=_NEARDUP_OUT,
            stateStructType=_NEARDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_near_dup_filter(
    docs: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    query_name: str = "near_dup_filter",
    **suspect_kwargs,
):
    """Doc-level composition over ``near_dup_suspects_stream``: each
    micro-batch's suspect rows are reduced to one row per document
    (min winner over its colliding bands) inside ``foreachBatch`` —
    the per-batch batch-mode aggregation that a second stateful stage
    can't express in the same streaming query — and appended to a
    parquet suspect list. Downstream ingest anti-joins this list.

    Returns the started StreamingQuery."""

    suspects = near_dup_suspects_stream(docs, **suspect_kwargs)

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("doc_id")
            .agg(
                F.min("winner_id").alias("winner_id"),
                F.count("*").alias("n_band_hits"),
            )
            .write.mode("append")
            .parquet(sink_path)
        )

    return (
        suspects.writeStream.foreachBatch(per_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
