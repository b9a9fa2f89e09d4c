"""Streaming training-row formation vs its sequential-batch twin.

The contract (same discipline as every streaming family here): a
tokenized-document stream driven through ``stream_token_sequences`` +
``flush_carry`` must produce EXACTLY the rows of one batch
``materialize_token_sequences`` call over the concatenation of all
batches in (batch, doc_id) order — same global seq_ids, same token ids
(asserted with the mseq md5 discipline), same lengths. Also pins the
carry/state mechanics: partial sequences span micro-batch boundaries,
and a replayed batch is idempotent for both output and state.
"""

import hashlib
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.shards import materialize_token_sequences
from spatialpandas_spark.streaming.sequences import (
    flush_carry,
    sequence_batch,
    stream_token_sequences,
)

RNG = np.random.default_rng(41)
L = 32


def _batches():
    out = []
    base = 0
    for nb, ndocs in enumerate([7, 5, 6]):
        rows = []
        for i in range(ndocs):
            n = int(RNG.integers(0, 60))  # includes zero-token docs
            rows.append(
                (base + i, [int(t) for t in RNG.integers(0, 1000, n)])
            )
        base += 100
        out.append(rows)
    return out


def _twin_rows(spark, batches):
    """The batch operator over the full concatenation in stream order."""
    rows = [
        (f"{nb:04d}#{doc_id:020d}", toks, len(toks))
        for nb, b in enumerate(batches)
        for doc_id, toks in b
    ]
    df = spark.createDataFrame(
        rows, "k string, token_ids array<int>, n_tokens long"
    )
    return {
        int(r["seq_id"]): [int(t) for t in r["token_ids"]]
        for r in materialize_token_sequences(df, L, id_col="k").collect()
    }


def _md5(ids):
    return hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest()


@pytest.fixture(scope="module")
def batches():
    return _batches()


def test_sequential_batches_match_twin(spark, batches, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("seqbatch"))
    got = {}
    for nb, b in enumerate(batches):
        bdf = spark.createDataFrame(b, "doc_id long, token_ids array<int>")
        out = sequence_batch(
            spark, bdf, L, f"{td}/state", batch_id=nb
        )
        for r in out.collect():
            got[int(r["seq_id"])] = [int(t) for t in r["token_ids"]]
        # complete rows are always exactly L
        assert all(len(v) == L for v in got.values())
    for r in flush_carry(spark, f"{td}/state").collect():
        got[int(r["seq_id"])] = [int(t) for t in r["token_ids"]]
    want = _twin_rows(spark, batches)
    assert {k: _md5(v) for k, v in got.items()} == {
        k: _md5(v) for k, v in want.items()
    }
    # the carry genuinely crossed batch boundaries: total tokens is not
    # a multiple of per-batch emissions (some sequence spans batches)
    toks_b0 = sum(len(t) for _, t in batches[0])
    assert toks_b0 % L != 0  # fixture guards the interesting case


def test_stream_matches_twin_and_is_idempotent(spark, batches, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("seqstream"))
    src = f"{td}/src"
    for b in batches:
        spark.createDataFrame(
            b, "doc_id long, token_ids array<int>"
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_token_sequences(
        stream, L, f"{td}/state", f"{td}/out", f"{td}/ckpt"
    )
    q.processAllAvailable()
    q.stop()
    flush_carry(spark, f"{td}/state", f"{td}/out")

    def read_out():
        return {
            int(r["seq_id"]): [int(t) for t in r["token_ids"]]
            for r in spark.read.parquet(f"{td}/out").collect()
        }

    got = read_out()
    want = _twin_rows(spark, batches)
    assert {k: _md5(v) for k, v in got.items()} == {
        k: _md5(v) for k, v in want.items()
    }

    # retry-idempotency under failure injection: replay micro-batches
    # (the foreachBatch at-least-once retry mode) — same batch_id, same
    # input — and re-flush; OUTPUT AND STATE must be byte-identical,
    # not double-appended. Replays a MIDDLE batch too: its rewrite must
    # reconsume the batch-(N-1) state, never its own.
    def read_state():
        return sorted(
            (int(r["batch"]), int(r["next_seq"]), list(r["carry"] or []))
            for r in spark.read.parquet(f"{td}/state").collect()
        )

    state_before = read_state()
    for replay_nb in (len(batches) - 1, 1):
        bdf = spark.createDataFrame(
            batches[replay_nb], "doc_id long, token_ids array<int>"
        )
        sequence_batch(
            spark, bdf, L, f"{td}/state", f"{td}/out", batch_id=replay_nb
        )
        assert read_state() == state_before, f"state drift, batch {replay_nb}"
    flush_carry(spark, f"{td}/state", f"{td}/out")
    assert read_out() == got
    assert read_state() == state_before


def test_long_string_ids_no_truncation_collision(spark, tmp_path_factory):
    """Regression (round-7 VERDICT hazard): ids longer than the old
    20-char lpad width sharing a 20-char prefix collided ordering AND
    join keys — the layout-to-tokens join fanned out and silently
    duplicated token data. The length-prefixed key must keep them
    distinct and ordered, and the streamed rows must equal the python
    replay of the documented (length, lex) stream order."""
    td = str(tmp_path_factory.mktemp("longids"))
    shared = "doc-" + "x" * 20  # 24-char shared prefix
    b = [(shared + "aa", [1] * 10), (shared + "ab", [2] * 10)]
    df = spark.createDataFrame(b, "doc_id string, token_ids array<int>")
    out = sequence_batch(spark, df, 8, f"{td}/state", batch_id=0)
    rows = {
        int(r["seq_id"]): [int(t) for t in r["token_ids"]]
        for r in out.collect()
    }
    # equal lengths -> lex order: ...aa before ...ab; stream =
    # [1]*10 + [2]*10 cut at 8: two complete rows + a 4-token carry
    assert rows == {0: [1] * 8, 1: [1, 1] + [2] * 6}
    tail = flush_carry(spark, f"{td}/state").collect()
    assert [[int(t) for t in r["token_ids"]] for r in tail] == [[2] * 4]


def test_id_order_is_length_then_lex(spark, tmp_path_factory):
    """Digit ids of different magnitudes order numerically under the
    length-then-lex key ('9' before '10' — the fixed-width pad got this
    right and the new key must too)."""
    td = str(tmp_path_factory.mktemp("lenlex"))
    b = [("10", [2] * 4), ("9", [1] * 4)]
    df = spark.createDataFrame(b, "doc_id string, token_ids array<int>")
    out = sequence_batch(spark, df, 4, f"{td}/state", batch_id=0)
    rows = {
        int(r["seq_id"]): [int(t) for t in r["token_ids"]]
        for r in out.collect()
    }
    assert rows == {0: [1] * 4, 1: [2] * 4}
