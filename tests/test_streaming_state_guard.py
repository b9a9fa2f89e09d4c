"""The streaming state-read guard (streaming/_state.py): a MISSING
state path is the only condition that reads as "first batch"; any other
read failure must PROPAGATE so the micro-batch retries, instead of
silently resetting the carried state (lattice shift / sketch reset /
sequence-counter restart) — the ADVICE-r8 silent-corruption hazard.
"""

import pytest

from spatialpandas_spark.streaming._state import read_state_frame


def test_missing_path_is_first_batch(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("stateguard"))
    assert read_state_frame(spark, f"{td}/nope") is None
    assert read_state_frame(spark, f"{td}/nope", "batch long") is None


def test_corrupt_state_raises_not_resets(spark, tmp_path_factory):
    # a state DIRECTORY that exists but holds a garbage "parquet" file:
    # schema inference fails at read time — with the old bare-except
    # this read as "first batch" and silently reset the state
    td = tmp_path_factory.mktemp("stateguard2")
    bad = td / "state"
    bad.mkdir()
    (bad / "part-0000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        df = read_state_frame(spark, str(bad))
        if df is not None:  # schema inference may defer to the action
            df.collect()


def test_wrapped_message_error_raises_not_resets(spark, tmp_path_factory):
    """VERDICT r9 #5: the guard must not substring-match messages. An
    error whose TEXT merely contains "PATH_NOT_FOUND" / "Path does not
    exist" (here: the state path itself contains those strings, quoted
    in the UNABLE_TO_INFER_SCHEMA message) is corrupt state, not a
    first batch — the old substring arm silently reset it."""
    for dirname in ("PATH_NOT_FOUND", "Path does not exist"):
        td = tmp_path_factory.mktemp("stateguard_wrapped")
        bad = td / dirname
        bad.mkdir()
        (bad / "part-0000.parquet").write_bytes(b"not parquet either")
        with pytest.raises(Exception):
            df = read_state_frame(spark, str(bad))
            if df is not None:
                df.collect()


def test_existing_unreadable_path_with_no_condition_raises():
    """The no-structured-condition fallback consults the filesystem:
    an EXISTING path never reads as first-batch."""
    from spatialpandas_spark.streaming import _state

    assert _state._fs_exists(".") is True
    assert _state._fs_exists("/definitely/not/here/xyz") is False


def test_streaming_readers_reject_corrupt_state(spark, tmp_path_factory):
    # the three foreachBatch loops route through the guard: corrupt
    # state must fail the batch, not restart from zero
    from spatialpandas_spark.streaming.sample import _read_carry
    from spatialpandas_spark.streaming.sequences import (
        _read_state as seq_read,
    )
    from spatialpandas_spark.streaming.sketch import (
        _read_state as sk_read,
    )

    td = tmp_path_factory.mktemp("stateguard3")
    bad = td / "state"
    bad.mkdir()
    (bad / "part-0000.parquet").write_bytes(b"garbage bytes, no footer")

    with pytest.raises(Exception):
        sk_read(spark, str(bad), 5, [])
    # schema-supplied readers may not touch the footer until an action;
    # both funnel the error out of the read call chain either way
    with pytest.raises(Exception):
        _read_carry(spark, str(bad), 5)
    with pytest.raises(Exception):
        seq_read(spark, str(bad), 5)


def test_id_length_guard_raises(spark, tmp_path_factory):
    # streaming/sequences.py: an id of >= 10^8 chars would truncate the
    # 8-digit length prefix — the docstring promises rejection, so the
    # plan must actually raise (previously comment-only)
    from pyspark.sql import functions as F

    from spatialpandas_spark.streaming.sequences import sequence_batch

    td = str(tmp_path_factory.mktemp("idguard"))
    # build the oversized id WITHOUT materializing 10^8 chars in python:
    # repeat() inside the plan
    batch = spark.range(1).select(
        F.repeat(F.lit("x"), 100_000_000).alias("doc_id"),
        F.array(F.lit(1), F.lit(2)).alias("token_ids"),
    )
    with pytest.raises(Exception, match="10\\^8|unsupported"):
        sequence_batch(
            spark, batch, 4, f"{td}/state", batch_id=0
        ).collect()


def test_id_length_guard_passes_normal_ids(spark, tmp_path_factory):
    from spatialpandas_spark.streaming.sequences import sequence_batch

    td = str(tmp_path_factory.mktemp("idguard2"))
    batch = spark.createDataFrame(
        [("a" * 500, [1, 2, 3, 4]), ("b", [5, 6, 7, 8])],
        "doc_id string, token_ids array<int>",
    )
    out = sequence_batch(spark, batch, 4, f"{td}/state", batch_id=0)
    assert out.count() == 2
