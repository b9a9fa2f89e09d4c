"""Persistent decontamination artifact (VERDICT r9 ask #2): build /
probe / append identity against the one-shot operators, plus the
streaming screen twin's exactly-once contract."""

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.contamination import (
    decontaminate,
    ngram_overlap,
    ngram_overlap_bloom,
)
from spatialpandas_spark.operators.contamination_index import (
    append_to_decon_index,
    build_decon_index,
    decontaminate_against_index,
    load_decon_params,
    ngram_overlap_against_index,
    probe_set,
    screen_against_index,
)
from spatialpandas_spark.operators.sketch import containment_probe, shingle_sketch

DOCS = [
    (i, " ".join(f"w{i}x{j}" for j in range(9))) for i in range(40)
] + [(100 + i, " ".join(f"b0y{j}" for j in range(9))) for i in range(3)]

BENCH_A = [("evalA", 0, " ".join(f"b0y{j}" for j in range(9))),
           ("evalA", 1, " ".join(f"w3x{j}" for j in range(9)))]
BENCH_B = [("evalB", 0, " ".join(f"w7x{j}" for j in range(9))),
           ("tiny", 0, "a b")]  # < n=3 words -> zero shingles


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture()
def bench_a(spark):
    return spark.createDataFrame(
        BENCH_A, "benchmark string, doc_id long, text string"
    )


@pytest.fixture()
def bench_b(spark):
    return spark.createDataFrame(
        BENCH_B, "benchmark string, doc_id long, text string"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_probe_set_equals_shingle_sketch(spark, bench_a, tmp_path):
    """The store-derived probe set == shingle_sketch over the original
    benchmark docs (kmv is a pure function of the shingle set)."""
    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, k=16, group_cols=["benchmark"])
    want = _rows(
        shingle_sketch(bench_a, "text", n=3, k=16, group_cols=["benchmark"])
    )
    assert _rows(probe_set(spark, path)) == want


def test_screen_matches_one_shot_probe(spark, docs, bench_a, bench_b, tmp_path):
    """screen_against_index == containment_probe on the original
    benchmark frame, including the zero-shingle group's n_probed=0 row."""
    path = str(tmp_path / "ix")
    bench = bench_a.union(bench_b)
    build_decon_index(bench, path, n=3, k=16, group_cols=["benchmark"])
    want = _rows(
        containment_probe(
            docs, bench, n=3, k=16, bench_group_cols=["benchmark"]
        )
    )
    got = _rows(screen_against_index(docs, path))
    assert got == want
    assert any(r[0] == "tiny" and r[1] == 0 for r in got)


def test_overlap_matches_one_shot_both_methods(spark, docs, bench_a, tmp_path):
    """ngram_overlap_against_index == ngram_overlap (broadcast) ==
    ngram_overlap_bloom (bloom probes the STORED bitmap)."""
    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, group_cols=["benchmark"])
    want = _rows(ngram_overlap(docs, bench_a, n=3))
    assert _rows(ngram_overlap_against_index(docs, path)) == want
    assert _rows(
        ngram_overlap_against_index(docs, path, method="bloom")
    ) == want
    assert want == _rows(ngram_overlap_bloom(docs, bench_a, n=3))


def test_append_equals_rebuild(spark, docs, bench_a, bench_b, tmp_path):
    """build(A) + append(B) is value-identical to build(A ∪ B) for
    screen AND overlap (both methods) — and the sidecar tracks the
    grown shingle count and realized fpp."""
    union = bench_a.union(bench_b)
    pa_, pb = str(tmp_path / "appended"), str(tmp_path / "rebuilt")
    build_decon_index(bench_a, pa_, n=3, k=16, group_cols=["benchmark"])
    n_before = load_decon_params(pa_)["n_shingles"]
    append_to_decon_index(bench_b, pa_)
    build_decon_index(union, pb, n=3, k=16, group_cols=["benchmark"])

    assert _rows(screen_against_index(docs, pa_)) == _rows(
        screen_against_index(docs, pb)
    )
    for method in ("broadcast", "bloom"):
        assert _rows(
            ngram_overlap_against_index(docs, pa_, method=method)
        ) == _rows(ngram_overlap(docs, union, n=3))
    p = load_decon_params(pa_)
    assert p["n_shingles"] > n_before
    assert 0 < p["bloom"]["fpp_realized"] < 1


def test_append_is_idempotent_for_duplicates(spark, docs, bench_a, tmp_path):
    """Re-appending already-indexed benchmarks adds nothing (the
    anti-join keeps the store distinct — no double counting)."""
    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, group_cols=["benchmark"])
    before = _rows(ngram_overlap_against_index(docs, path))
    n0 = load_decon_params(path)["n_shingles"]
    append_to_decon_index(bench_a, path)
    assert load_decon_params(path)["n_shingles"] == n0
    assert _rows(ngram_overlap_against_index(docs, path)) == before


def test_decontaminate_against_index(spark, docs, bench_a, tmp_path):
    """Filtered corpus == the one-shot decontaminate on the original
    benchmark frame, both methods."""
    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, group_cols=["benchmark"])
    want = _rows(decontaminate(docs, bench_a, threshold=0.5, n=3))
    for method in ("broadcast", "bloom"):
        got = _rows(
            decontaminate_against_index(
                docs, path, threshold=0.5, method=method
            )
        )
        assert got == want
    assert len(want) < len(DOCS)  # something was actually dropped


def test_unknown_method_raises(spark, docs, bench_a, tmp_path):
    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3)
    with pytest.raises(ValueError, match="unknown"):
        ngram_overlap_against_index(docs, path, method="nope")


# ---------------------------------------------------------- streaming


def test_stream_screen_equals_batch(spark, docs, bench_a, bench_b, tmp_path):
    """Cumulative screen after N micro-batches == screen_against_index
    over the union; replaying a middle batch leaves the summary
    identical (exactly-once); load_screen returns the current rows."""
    from spatialpandas_spark.streaming.screen import (
        load_screen,
        screen_batch,
    )

    ix = str(tmp_path / "ix")
    st = str(tmp_path / "state")
    bench = bench_a.union(bench_b)
    build_decon_index(bench, ix, n=3, k=16, group_cols=["benchmark"])

    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    out = None
    for i, b in enumerate(batches):
        out = screen_batch(spark, b, ix, st, batch_id=i)
    want = _rows(screen_against_index(docs, ix))
    assert _rows(out) == want
    assert _rows(load_screen(spark, ix, st)) == want

    # replay batch 1: re-reads batch-0 state, overwrites its own
    # partition; the latest summary is unchanged
    screen_batch(spark, batches[1], ix, st, batch_id=1)
    assert _rows(load_screen(spark, ix, st)) == want


def test_stream_screen_zero_hit_first_batch(spark, bench_a, tmp_path):
    """A first batch with no probe hits must not corrupt state: the
    summary reads all-zero and later batches still accumulate."""
    from spatialpandas_spark.streaming.screen import screen_batch

    ix = str(tmp_path / "ix")
    st = str(tmp_path / "state")
    build_decon_index(bench_a, ix, n=3, k=16, group_cols=["benchmark"])
    foreign = bench_a.sparkSession.createDataFrame(
        [(1, "zz yy xx ww vv uu tt")], "doc_id long, text string"
    )
    out = screen_batch(spark, foreign, ix, st, batch_id=0)
    assert all(r["n_found"] == 0 for r in out.collect())
    hit = bench_a.sparkSession.createDataFrame(
        [(2, " ".join(f"b0y{j}" for j in range(9)))],
        "doc_id long, text string",
    )
    out = screen_batch(spark, hit, ix, st, batch_id=1)
    rows = {r["benchmark"]: r["n_found"] for r in out.collect()}
    assert rows["evalA"] > 0


def test_append_write_order_bloom_groups_shingles(
    spark, bench_a, bench_b, tmp_path, monkeypatch
):
    """ADVICE r10: append writes bloom, then GROUPS, then shingles (then
    sidecar) — every torn-append state is a superset artifact (extra
    bloom candidates the verify join removes, or an n_probed=0 group
    row), never a silently dropped group summary or a false negative."""
    from pyspark.sql.readwriter import DataFrameWriter

    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, k=16, group_cols=["benchmark"])
    order = []
    orig = DataFrameWriter.parquet

    def spy(self, p, *a, **k):
        order.append(p.rsplit("/", 1)[-1])
        return orig(self, p, *a, **k)

    monkeypatch.setattr(DataFrameWriter, "parquet", spy)
    append_to_decon_index(bench_b, path)
    assert order == ["bloom", "groups", "shingles"]


def test_torn_append_group_screens_as_zero_probed(spark, docs, bench_a, tmp_path):
    """A crash after the groups append but before the shingles append
    leaves a group with no probes; it must still appear in the screen
    summary as the honest (n_probed=0, n_found=0) row, not vanish."""
    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, k=16, group_cols=["benchmark"])
    spark.createDataFrame([("evalB",)], "benchmark string").write.mode(
        "append"
    ).parquet(f"{path}/groups")
    got = {
        r["benchmark"]: (r["n_probed"], r["n_found"])
        for r in screen_against_index(docs, path).collect()
    }
    assert got["evalB"] == (0, 0)
    assert got["evalA"][0] > 0


def test_stale_sidecar_zero_shingles_confirmed_against_store(
    spark, docs, bench_a, tmp_path
):
    """ADVICE r10: a stale sidecar claiming n_shingles=0 (torn append
    before the sidecar rewrite) must not short-circuit overlap to zero
    matches — the short-circuit is confirmed against the STORE."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, group_cols=["benchmark"])
    want = _rows(ngram_overlap_against_index(docs, path))
    p = load_decon_params(path)
    p["n_shingles"] = 0
    _fs.write_text(f"{path}/_decon_index.json", json.dumps(p))
    assert _rows(ngram_overlap_against_index(docs, path)) == want


def test_rebuild_restores_fpp_and_compacts(spark, docs, bench_a, bench_b, tmp_path):
    """VERDICT r10 ask #3: append until fpp_realized drifts well above
    the build-time target, rebuild, and assert (a) the drift is
    restored to ~fpp with a larger bloom, (b) the fragmented shingle
    store compacts to fewer files, (c) screen AND overlap outputs are
    row-identical across the rebuild (both probe methods), (d) a fresh
    append onto the rebuilt index still works."""
    from spatialpandas_spark.operators.contamination_index import (
        rebuild_decon_index,
    )
    from spatialpandas_spark.sources import fs as _fs

    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, k=16, group_cols=["benchmark"])
    p0 = load_decon_params(path)
    # several appends: new benchmarks with disjoint shingles
    for g in range(4):
        extra = spark.createDataFrame(
            [(f"ev{g}", i, " ".join(f"g{g}z{i}w{j}" for j in range(12)))
             for i in range(6)],
            "benchmark string, doc_id long, text string",
        )
        append_to_decon_index(extra, path)
    p1 = load_decon_params(path)
    assert p1["n_shingles"] > 4 * p0["n_shingles"]
    assert p1["bloom"]["m"] == p0["bloom"]["m"]  # appends never resize
    assert p1["bloom"]["fpp_realized"] > 2 * p1["bloom"]["fpp"]
    files_before = len(
        _fs.list_files(f"{path}/shingles", ".parquet", recursive=True)
    )

    before_screen = _rows(screen_against_index(docs, path))
    before_overlap = {
        meth: _rows(ngram_overlap_against_index(docs, path, method=meth))
        for meth in ("broadcast", "bloom")
    }

    p2 = rebuild_decon_index(spark, path)
    assert p2 == load_decon_params(path)
    assert p2["n_shingles"] == p1["n_shingles"]
    assert p2["bloom"]["m"] > p1["bloom"]["m"]  # re-sized for growth
    assert p2["bloom"]["fpp_realized"] <= 1.5 * p2["bloom"]["fpp"]
    files_after = len(
        _fs.list_files(f"{path}/shingles", ".parquet", recursive=True)
    )
    assert files_after < files_before

    assert _rows(screen_against_index(docs, path)) == before_screen
    for meth in ("broadcast", "bloom"):
        assert (
            _rows(ngram_overlap_against_index(docs, path, method=meth))
            == before_overlap[meth]
        )

    append_to_decon_index(bench_b, path)
    got = {r["benchmark"] for r in screen_against_index(docs, path).collect()}
    assert {"evalA", "evalB", "tiny", "ev0"} <= got


def test_rebuild_without_groups(spark, docs, bench_a, tmp_path):
    """Group-less index rebuild: same overlap rows, sidecar updated."""
    from spatialpandas_spark.operators.contamination_index import (
        rebuild_decon_index,
    )

    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3)
    want = _rows(ngram_overlap_against_index(docs, path))
    rebuild_decon_index(spark, path)
    assert _rows(ngram_overlap_against_index(docs, path)) == want


def test_rebuild_if_drifted_policy(spark, docs, bench_a, tmp_path):
    """The drift-triggered wrapper: no-op below the tolerance, rebuilds
    above it, then immediately no-ops again (rebuild restores fpp), and
    screens are row-identical either way. Sidecar-only check when not
    drifted — no store scan."""
    from spatialpandas_spark.operators.contamination_index import (
        rebuild_if_drifted,
    )

    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, k=16, group_cols=["benchmark"])

    # fresh index: fpp_realized ~ fpp -> no-op
    rebuilt, p = rebuild_if_drifted(spark, path)
    assert not rebuilt and p == load_decon_params(path)

    # append until realized fpp drifts past 2x target
    for g in range(4):
        extra = spark.createDataFrame(
            [(f"ev{g}", i, " ".join(f"g{g}z{i}w{j}" for j in range(12)))
             for i in range(6)],
            "benchmark string, doc_id long, text string",
        )
        append_to_decon_index(extra, path)
    drifted = load_decon_params(path)
    assert drifted["bloom"]["fpp_realized"] > 2 * drifted["bloom"]["fpp"]
    before = _rows(screen_against_index(docs, path))

    rebuilt, p2 = rebuild_if_drifted(spark, path)
    assert rebuilt
    assert p2["bloom"]["fpp_realized"] <= 1.5 * p2["bloom"]["fpp"]
    assert p2["bloom"]["m"] > drifted["bloom"]["m"]
    assert _rows(screen_against_index(docs, path)) == before

    # post-rebuild: immediately healthy again
    rebuilt2, p3 = rebuild_if_drifted(spark, path)
    assert not rebuilt2 and p3 == load_decon_params(path)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rebuild_if_drifted(spark, path, drift_factor=1.0)


# --- concurrent-reader contract (r12, docs/INDEX_CONSISTENCY.md) ------

def test_torn_bloom_sidecar_raises(spark, docs, bench_a, tmp_path):
    """The one silent-wrong-answer race: a reader that loads the NEW
    sidecar (rebuild re-sized m) with the OLD bitmap would zero-fill
    missing bloom words = false negatives in every screen. _read_bloom
    must detect the mismatch and raise the retryable
    ConcurrentRebuildError — in BOTH tear directions."""
    import json

    from spatialpandas_spark.operators.contamination_index import (
        ConcurrentRebuildError,
        ngram_overlap_against_index,
    )
    from spatialpandas_spark.sources import fs as _fs

    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, k=16, group_cols=["benchmark"])

    # simulate the swap window: sidecar advanced to a larger m (the
    # rebuild direction after appends grew the set), bitmap still old
    p = json.loads(_fs.read_text(f"{path}/_decon_index.json"))
    old_m = p["bloom"]["m"]
    p["bloom"]["m"] = old_m + 64 * 8
    _fs.write_text(f"{path}/_decon_index.json", json.dumps(p))
    with pytest.raises(ConcurrentRebuildError, match="retry"):
        ngram_overlap_against_index(docs, path, method="bloom").collect()

    # opposite tear: sidecar says SMALLER m than the bitmap holds
    p["bloom"]["m"] = 64  # one word; the real bitmap is larger
    _fs.write_text(f"{path}/_decon_index.json", json.dumps(p))
    with pytest.raises(ConcurrentRebuildError, match="retry"):
        ngram_overlap_against_index(docs, path, method="bloom").collect()

    # restore: consistent snapshot reads fine again
    p["bloom"]["m"] = old_m
    _fs.write_text(f"{path}/_decon_index.json", json.dumps(p))
    assert ngram_overlap_against_index(docs, path, method="bloom").count() > 0


def test_duplicated_bloom_chunk_tear_raises(spark, docs, bench_a, tmp_path):
    """ADVICE r12: overlapping/duplicate chunk rows must not launder a
    missing range. Rewrite the bloom as two rows that BOTH start at
    cid=0 and whose lengths sum to exactly len(words) — a raw
    length-sum coverage check passes this (the exact silent-false-
    negative tear), the per-word mask must raise."""
    import numpy as np

    from spatialpandas_spark.operators.contamination_index import (
        ConcurrentRebuildError,
        _read_bloom,
    )

    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, k=16, group_cols=["benchmark"])
    p = load_decon_params(path)
    m = p["bloom"]["m"]
    words = _read_bloom(spark, f"{path}/bloom", m)
    w = len(words)
    assert w >= 2, "fixture bloom too small to split"
    h = w // 2
    rows = [
        (0, bytes(words[:h].tobytes())),
        (0, bytes(words[: w - h].tobytes())),  # overlaps at cid 0; sum == w
    ]
    spark.createDataFrame(rows, "cid long, bm binary").repartition(
        1
    ).write.mode("overwrite").parquet(f"{path}/bloom")
    with pytest.raises(ConcurrentRebuildError, match="overlapping"):
        _read_bloom(spark, f"{path}/bloom", m)
    with pytest.raises(ConcurrentRebuildError, match="retry"):
        ngram_overlap_against_index(docs, path, method="bloom").collect()


def test_reader_during_rebuild_consistent_or_fails_fast(
    spark, docs, bench_a, bench_b, tmp_path
):
    """Probe the swap itself: interleave screen_against_index reads
    with a rebuild at every observable stage. Each read must either
    return the exact pre/post-rebuild rows (they are row-identical by
    the rebuild contract) or raise a retryable error — never a third
    result set. The staged .rebuild.tmp directory must never be read
    implicitly."""
    from spatialpandas_spark.operators.contamination_index import (
        append_to_decon_index,
        rebuild_decon_index,
    )

    path = str(tmp_path / "ix")
    build_decon_index(bench_a, path, n=3, k=16, group_cols=["benchmark"])
    append_to_decon_index(bench_b, path)
    want = _rows(screen_against_index(docs, path))

    # stage 1: while a stale .rebuild.tmp exists (crash before swap),
    # the live index must read normally and identically
    import shutil

    shutil.copytree(path, path + ".rebuild.tmp")
    assert _rows(screen_against_index(spark.createDataFrame(
        DOCS, "doc_id long, text string"), path)) == want
    shutil.rmtree(path + ".rebuild.tmp")

    # stage 2: across the real rebuild, screens are row-identical
    rebuild_decon_index(spark, path)
    assert _rows(screen_against_index(docs, path)) == want

    # stage 3: the between-renames window (live dir briefly absent) is
    # a fail-fast path error, not a silent empty result
    import os

    os.rename(path, path + ".old")
    with pytest.raises(Exception):
        screen_against_index(docs, path).collect()
    os.rename(path + ".old", path)
    assert _rows(screen_against_index(docs, path)) == want
