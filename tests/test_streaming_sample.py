"""Streaming PPS sampling vs its batch twin.

The lattice-shift identity is EXACT: after any number of micro-batches
the union of selected rows (ids AND multiplicities) must equal one
batch ``systematic_sample`` over the concatenation of all batches in
(batch, id) order. Plus exactly-once replay injection and readStream
wiring.
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.sampling import systematic_sample
from spatialpandas_spark.streaming.sample import (
    sample_pps_batch,
    stream_pps_sample,
)

STEP, SEED = 120, 42
SCHEMA = "doc_id long, w long"


def _batches():
    rng = np.random.default_rng(13)
    out = []
    for nb in range(3):
        out.append(
            [
                (nb * 1000 + i, int(w))
                for i, w in enumerate(rng.integers(0, 90, 40))
            ]
        )
    out[1][5] = (out[1][5][0], 400)  # heavy row mid-stream
    return out


def _twin(spark, batches):
    rows = [
        (nb, d, w) for nb, b in enumerate(batches) for d, w in b
    ]
    df = spark.createDataFrame(rows, "b long, doc_id long, w long")
    return {
        r["doc_id"]: r["n_hits"]
        for r in systematic_sample(
            df, "w", ["b", "doc_id"], step=STEP, seed=SEED
        ).collect()
    }


def test_sequential_batches_match_twin(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("ppsstream"))
    batches = _batches()
    got = {}
    for nb, b in enumerate(batches):
        out = sample_pps_batch(
            spark, spark.createDataFrame(b, SCHEMA), f"{td}/state",
            "w", STEP, batch_id=nb,
        )
        for r in out.collect():
            got[r["doc_id"]] = r["n_hits"]
    want = _twin(spark, batches)
    assert got == want
    # the heavy row is in with multiplicity >= 3
    assert got[1005] >= 3


def test_replay_is_exactly_once(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("ppsreplay"))
    batches = _batches()
    for nb, b in enumerate(batches):
        sample_pps_batch(
            spark, spark.createDataFrame(b, SCHEMA), f"{td}/state",
            "w", STEP, output_path=f"{td}/out", batch_id=nb,
        )

    def snap():
        state = sorted(
            map(tuple, spark.read.parquet(f"{td}/state").collect())
        )
        out = sorted(
            map(tuple, spark.read.parquet(f"{td}/out").collect())
        )
        return state, out

    before = snap()
    for replay in (1, 2):
        sample_pps_batch(
            spark, spark.createDataFrame(batches[replay], SCHEMA),
            f"{td}/state", "w", STEP, output_path=f"{td}/out",
            batch_id=replay,
        )
        assert snap() == before, f"drift after replaying batch {replay}"


def test_stream_wiring_matches_twin(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("ppswire"))
    src = f"{td}/src"
    batches = _batches()
    for b in batches:
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_pps_sample(
        stream, f"{td}/state", f"{td}/out", f"{td}/ckpt", "w", STEP
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: r["n_hits"]
        for r in spark.read.parquet(f"{td}/out").collect()
    }
    assert got == _twin(spark, batches)


def test_step_validation(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("ppsval"))
    df = spark.createDataFrame([(1, 5)], SCHEMA)
    with pytest.raises(ValueError):
        sample_pps_batch(spark, df, f"{td}/state", "w", 0)
