"""Per-CI streaming-twin contract battery (VERDICT r8 ask #4).

Every incremental foreachBatch operator in spatialpandas_spark/streaming
whose semantics are "streaming == the batch operator over everything
ingested" gets its EXACT batch-equivalence identity re-run here on the
REAL sf0.001 documents fixture — the retired-gate discipline applied to
the non-SQL-expressible streaming surface: the evidence no longer lives
only inside each twin's own test file, and a completeness assertion
forces any NEW ``*_batch`` incremental operator to either register a
contract here or be explicitly waived with a reason.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

#: *_batch functions whose twin identity is asserted by some OTHER
#: always-run battery (or that are not twin-shaped), with the reason —
#: the completeness check below fails on any unlisted newcomer.
WAIVED = {
    "ingest_batch": "dedup-index loop; twin in tests/test_streaming_text_dedup.py (append path documented at-least-once)",
    "embedding_ingest_batch": "embedding loop; twin in tests/test_embedding_ingest.py",
    "crawl_ingest_batch": "crawl loop; twin in tests/test_streaming_crawl.py",
    "extract_crawl_batch": "stateless per-batch extraction (no carried state to contract-check)",
    "attribute_clicks_batch": "watermarked stream-stream join; twin in tests/test_streaming_events.py",
    "sessionize_batch": "applyInPandasWithState session op; twin in tests/test_streaming_events.py",
}

CONTRACTED = {
    "sketch_batch",
    "sample_pps_batch",
    "sequence_batch",
    "screen_batch",
}


def test_every_incremental_operator_is_enumerated():
    """A new *_batch operator must land in CONTRACTED (with a contract
    test below) or WAIVED (with a pointer to its own twin battery)."""
    import importlib
    import pkgutil

    import spatialpandas_spark.streaming as pkg

    found = set()
    for m in pkgutil.iter_modules(pkg.__path__):
        mod = importlib.import_module(f"{pkg.__name__}.{m.name}")
        for name in dir(mod):
            fn = getattr(mod, name)
            if (
                callable(fn)
                and name.endswith("_batch")
                and getattr(fn, "__module__", "") == mod.__name__
            ):
                found.add(name)
    unaccounted = found - CONTRACTED - set(WAIVED)
    assert not unaccounted, (
        f"streaming incremental operators without a per-CI contract: "
        f"{sorted(unaccounted)} — add a contract test here or waive "
        f"with a reason"
    )


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    df.cache().count()
    return df


def _micro_batches(docs, n=3):
    return [docs.filter(F.col("doc_id") % n == i) for i in range(n)]


def test_sketch_stream_equals_batch_on_real_docs(spark, docs, tmp_path):
    """Maintained KMV sketch after N real micro-batches == one-shot
    shingle_sketch over the full table, EXACTLY; replaying a middle
    batch leaves state byte-identical."""
    from spatialpandas_spark.operators.sketch import shingle_sketch
    from spatialpandas_spark.streaming.sketch import sketch_batch

    st = str(tmp_path / "sk")
    out = None
    for i, b in enumerate(_micro_batches(docs)):
        out = sketch_batch(spark, b, st, k=96, batch_id=i)
    got = sorted((r["rank"], r["h"]) for r in out.collect())
    want = sorted(
        (r["rank"], r["h"]) for r in shingle_sketch(docs, k=96).collect()
    )
    assert got == want
    snap = sorted(map(tuple, spark.read.parquet(st).collect()))
    sketch_batch(
        spark, _micro_batches(docs)[1], st, k=96, batch_id=1
    )  # replay
    assert sorted(map(tuple, spark.read.parquet(st).collect())) == snap


def test_pps_stream_equals_batch_on_real_docs(spark, docs, tmp_path):
    """Streamed PPS selection (ids AND multiplicities) over N real
    micro-batches == one systematic_sample over the concatenation in
    (batch, doc_id) order; middle-batch replay is byte-identical."""
    from spatialpandas_spark.operators.sampling import systematic_sample
    from spatialpandas_spark.streaming.sample import sample_pps_batch

    st, outp = str(tmp_path / "pps"), str(tmp_path / "ppsout")
    w = F.length("text").cast("long")
    batches = [
        b.select("doc_id", w.alias("w")) for b in _micro_batches(docs)
    ]
    step = 40_000
    got = {}
    for i, b in enumerate(batches):
        for r in sample_pps_batch(
            spark, b, st, "w", step, output_path=outp, batch_id=i
        ).collect():
            got[r["doc_id"]] = r["n_hits"]
    concat = None
    for i, b in enumerate(batches):
        t = b.withColumn("b", F.lit(i))
        concat = t if concat is None else concat.unionByName(t)
    want = {
        r["doc_id"]: r["n_hits"]
        for r in systematic_sample(
            concat, "w", ["b", "doc_id"], step=step
        ).collect()
    }
    assert got == want and len(want) > 0
    snap = (
        sorted(map(tuple, spark.read.parquet(st).collect())),
        sorted(map(tuple, spark.read.parquet(outp).collect())),
    )
    sample_pps_batch(
        spark, batches[1], st, "w", step, output_path=outp, batch_id=1
    )
    assert (
        sorted(map(tuple, spark.read.parquet(st).collect())),
        sorted(map(tuple, spark.read.parquet(outp).collect())),
    ) == snap


def test_sequences_stream_equals_batch_on_real_docs(spark, docs, tmp_path):
    """Streamed training rows over N real micro-batches == one
    materialize_token_sequences over the concatenated stream in
    (batch, length-lex id) order; middle-batch replay byte-identical."""
    from spatialpandas_spark.operators.shards import (
        materialize_token_sequences,
    )
    from spatialpandas_spark.streaming.sequences import sequence_batch

    st, outp = str(tmp_path / "seq"), str(tmp_path / "seqout")
    L = 64
    # cheap deterministic token ids from the real text
    tok = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.slice(
            F.transform(
                F.split(F.lower(F.trim("text")), r"\s+"),
                lambda t: F.abs(F.hash(t)) % 1000,
            ),
            1,
            200,
        ).alias("token_ids"),
    ).filter(F.size("token_ids") > 0)
    tok.cache().count()
    batches = [
        tok.filter(F.col("doc_id").cast("long") % 3 == i) for i in range(3)
    ]
    got = []
    for i, b in enumerate(batches):
        got.extend(
            (r["seq_id"], r["n_tokens"], tuple(r["token_ids"]))
            for r in sequence_batch(
                spark, b, L, st, output_path=outp, batch_id=i
            ).collect()
        )
    # twin: concat in (batch, length-then-lex id) order
    concat = None
    for i, b in enumerate(batches):
        key = F.concat(
            F.lit(f"{i}#"),
            F.lpad(F.length("doc_id").cast("string"), 8, "0"),
            F.col("doc_id"),
        )
        t = b.select(key.alias("k"), "token_ids").withColumn(
            "n_tokens", F.size("token_ids").cast("long")
        )
        concat = t if concat is None else concat.unionByName(t)
    want = [
        (r["seq_id"], r["n_tokens"], tuple(r["token_ids"]))
        for r in materialize_token_sequences(
            concat, L, id_col="k"
        ).collect()
        if r["n_tokens"] == L  # the stream holds back the trailing partial
    ]
    assert sorted(got) == sorted(want) and len(want) > 10
    snap = (
        sorted(map(tuple, spark.read.parquet(st).collect())),
        sorted(map(tuple, spark.read.parquet(outp).collect())),
    )
    sequence_batch(
        spark, batches[1], L, st, output_path=outp, batch_id=1
    )
    assert (
        sorted(map(tuple, spark.read.parquet(st).collect())),
        sorted(map(tuple, spark.read.parquet(outp).collect())),
    ) == snap


def test_screen_stream_equals_batch_on_real_docs(spark, docs, tmp_path):
    """Cumulative benchmark screen over N real micro-batches == one
    screen_against_index over the full table, EXACTLY; middle-batch
    replay leaves the maintained summary identical."""
    from spatialpandas_spark.operators.contamination_index import (
        build_decon_index,
        screen_against_index,
    )
    from spatialpandas_spark.streaming.screen import (
        load_screen,
        screen_batch,
    )

    ix, st = str(tmp_path / "ix"), str(tmp_path / "state")
    bench = docs.filter(F.col("doc_id") % 17 == 0).withColumn(
        "benchmark",
        F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"),
    )
    build_decon_index(bench, ix, n=5, k=64, group_cols=["benchmark"])

    out = None
    for i, b in enumerate(_micro_batches(docs)):
        out = screen_batch(spark, b, ix, st, batch_id=i)
    want = sorted(map(tuple, screen_against_index(docs, ix).collect()))
    assert sorted(map(tuple, out.collect())) == want
    assert any(r[2] > 0 for r in want)  # real hits flowed through

    screen_batch(spark, _micro_batches(docs)[1], ix, st, batch_id=1)
    assert (
        sorted(map(tuple, load_screen(spark, ix, st).collect())) == want
    )


def test_screen_loop_retries_through_concurrent_rebuild(
    spark, docs, tmp_path
):
    """Round-14 VERDICT ask #7 — the retry contract of
    docs/INDEX_CONSISTENCY.md driven END TO END: a micro-batch step
    whose bloom read lands in a torn rebuild window (new-epoch sidecar
    visible, old bloom still on disk — the dangerous undersize
    direction) raises ``ConcurrentRebuildError``, writes NOTHING
    (exactly-once state untouched), and the SAME batch retried with
    the SAME batch id after the swap completes converges to the
    sequential twin exactly."""
    import json as _json

    from spatialpandas_spark.operators.contamination_index import (
        _SIDECAR,
        ConcurrentRebuildError,
        build_decon_index,
        decontaminate_against_index,
        load_decon_params,
        rebuild_decon_index,
        screen_against_index,
    )
    from spatialpandas_spark.sources import fs as _fs
    from spatialpandas_spark.streaming.screen import screen_batch

    ix, st = str(tmp_path / "ix"), str(tmp_path / "state")
    sink = str(tmp_path / "clean")
    bench = docs.filter(F.col("doc_id") % 17 == 0).withColumn(
        "benchmark",
        F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"),
    )
    build_decon_index(bench, ix, n=5, k=64, group_cols=["benchmark"])

    def step(batch, batch_id):
        # realistic curation body: bloom-decontaminate the batch for
        # the training sink (the bloom read is the reader that can
        # observe a torn snapshot — it runs FIRST, before any write),
        # then screen the raw batch for the contamination summary
        clean = decontaminate_against_index(
            batch, ix, threshold=0.5, method="bloom"
        )
        (
            clean.select("doc_id")
            .withColumn("batch", F.lit(int(batch_id)))
            .repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(sink)
        )
        return screen_batch(spark, batch, ix, st, batch_id=batch_id)

    batches = _micro_batches(docs)
    step(batches[0], 0)

    # inject the mid-swap tear: sidecar from the NEW epoch (m doubled)
    # while the OLD bloom chunks are still what's on disk
    p = load_decon_params(ix)
    torn = dict(p)
    torn["bloom"] = dict(p["bloom"], m=p["bloom"]["m"] * 2)
    _fs.write_text(f"{ix}/{_SIDECAR}", _json.dumps(torn))

    with pytest.raises(ConcurrentRebuildError, match="retry"):
        step(batches[1], 1)
    # the failed attempt wrote nothing: no batch-1 partition in either
    # the sink or the screen state (the tear raised before any write)
    assert (
        spark.read.parquet(sink).select(F.max("batch")).first()[0] == 0
    )
    assert (
        spark.read.parquet(st).select(F.max("batch")).first()[0] == 0
    )

    # the swap completes (a real rebuild restores a consistent epoch,
    # re-deriving m from the target fpp); retry the SAME batch id
    rebuild_decon_index(spark, ix)
    step(batches[1], 1)
    out = step(batches[2], 2)

    # sequential twins: the maintained summary equals one
    # screen_against_index over everything ingested, and the sink
    # equals one decontamination pass over the full table — the
    # failed attempt and the retry left no trace in either
    want = sorted(map(tuple, screen_against_index(docs, ix).collect()))
    assert sorted(map(tuple, out.collect())) == want
    assert any(r[2] > 0 for r in want)  # hits flowed through the retry
    got_ids = sorted(
        r[0] for r in spark.read.parquet(sink).select("doc_id").collect()
    )
    want_ids = sorted(
        r[0]
        for r in decontaminate_against_index(
            docs, ix, threshold=0.5, method="bloom"
        )
        .select("doc_id")
        .collect()
    )
    assert got_ids == want_ids and 0 < len(got_ids) < docs.count()
