"""Streaming KMV sketch maintenance vs its batch twin.

The twin identity is EXACT, not statistical: the sketch is a pure
function of the accumulated shingle set and merge-of-bottom-k ==
bottom-k-of-union, so after any number of micro-batches the maintained
state must equal ``shingle_sketch`` over the concatenation of all
batches bit-for-bit. Also pins exactly-once under failure injection
(replayed middle and last batches leave the state byte-identical) and
the real readStream wiring.
"""

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.sketch import shingle_sketch
from spatialpandas_spark.streaming.sketch import (
    load_sketch,
    sketch_batch,
    stream_sketch_ingest,
)

K = 32


def _batches():
    out = []
    for nb in range(3):
        rows = [
            (
                nb * 100 + i,
                f"src{(nb * 100 + i) % 2}",
                " ".join(f"w{nb}_{i}_{j}" for j in range(9))
                + " shared common phrase tail here",
            )
            for i in range(25)
        ]
        out.append(rows)
    return out


SCHEMA = "doc_id long, source string, text string"


def _rows(df, groups):
    return sorted(
        tuple(r[c] for c in (*groups, "rank", "h")) for r in df.collect()
    )


@pytest.mark.parametrize("groups", [[], ["source"]])
def test_sequential_batches_equal_batch_twin(
    spark, groups, tmp_path_factory
):
    td = str(tmp_path_factory.mktemp("sksketch"))
    batches = _batches()
    last = None
    for nb, b in enumerate(batches):
        bdf = spark.createDataFrame(b, SCHEMA)
        last = sketch_batch(
            spark, bdf, f"{td}/state", k=K, n=3,
            group_cols=groups, batch_id=nb,
        )
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], SCHEMA
    )
    want = _rows(
        shingle_sketch(all_docs, n=3, k=K, group_cols=groups), groups
    )
    assert _rows(last, groups) == want
    assert _rows(load_sketch(spark, f"{td}/state", groups), groups) == want


def test_replay_is_exactly_once(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("skreplay"))
    batches = _batches()
    for nb, b in enumerate(batches):
        sketch_batch(
            spark, spark.createDataFrame(b, SCHEMA), f"{td}/state",
            k=K, n=3, group_cols=["source"], batch_id=nb,
        )

    def state():
        return sorted(
            map(tuple, spark.read.parquet(f"{td}/state").collect())
        )

    before = state()
    for replay in (1, 2):  # middle then last
        sketch_batch(
            spark, spark.createDataFrame(batches[replay], SCHEMA),
            f"{td}/state", k=K, n=3, group_cols=["source"],
            batch_id=replay,
        )
        assert state() == before, f"state drift after replaying {replay}"


def test_stream_wiring_matches_twin(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("skstream"))
    src = f"{td}/src"
    batches = _batches()
    for b in batches:
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_sketch_ingest(
        stream, f"{td}/state", f"{td}/ckpt", k=K, n=3,
        group_cols=["source"],
    )
    q.processAllAvailable()
    q.stop()
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], SCHEMA
    )
    assert _rows(load_sketch(spark, f"{td}/state", ["source"]), ["source"]) == _rows(
        shingle_sketch(all_docs, n=3, k=K, group_cols=["source"]),
        ["source"],
    )
