"""Persistent MinHash-LSH dedup index vs the one-shot formulation.

The load-bearing equivalence: probing a batch against an index built
from a corpus must find exactly the (batch doc, corpus doc) pairs that
``minhash_lsh_pairs`` finds over the union, restricted to cross pairs —
same signatures, same band collisions, same estimated-Jaccard filter.
"""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.dedup import minhash_lsh_pairs
from spatialpandas_spark.operators.dedup_index import (
    append_to_minhash_index,
    build_minhash_index,
    dedup_against_index,
    filter_against_index,
    load_minhash_params,
)

RNG = np.random.default_rng(11)
WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _mk_docs(n, start=0, dup_pool=None, dup_frac=0.4):
    docs = []
    for i in range(start, start + n):
        pool = dup_pool if dup_pool else docs
        if pool and RNG.random() < dup_frac:
            base = pool[int(RNG.integers(0, len(pool)))][1].split()
            k = max(1, len(base) // 25)
            for _ in range(k):
                base[int(RNG.integers(0, len(base)))] = WORDS[
                    int(RNG.integers(0, 10))
                ]
            docs.append((i, " ".join(base)))
        else:
            docs.append(
                (i, " ".join(WORDS[int(RNG.integers(0, 10))] for _ in range(50)))
            )
    return docs


@pytest.fixture(scope="module")
def corpus_batch(spark):
    corpus = _mk_docs(80)
    batch = _mk_docs(40, start=1000, dup_pool=corpus, dup_frac=0.5)
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    return cdf, bdf, corpus, batch


@pytest.fixture(scope="module")
def index_path(spark, corpus_batch):
    cdf, _, _, _ = corpus_batch
    td = tempfile.mkdtemp(prefix="mh_idx_")
    path = f"{td}/index"
    build_minhash_index(cdf, path)
    yield path
    shutil.rmtree(td, ignore_errors=True)


def _cross_pairs_oracle(spark, cdf, bdf, threshold=0.5):
    """minhash_lsh_pairs over the union, keeping only (corpus, batch)
    cross pairs — the ground truth the index probe must reproduce."""
    union = cdf.unionByName(bdf)
    pairs = minhash_lsh_pairs(union, threshold=threshold)
    # batch ids start at 1000; pairs come out id_a < id_b
    return {
        (r["id_b"], r["id_a"], round(r["est_jaccard"], 9))
        for r in pairs.filter(
            (F.col("id_a") < 1000) & (F.col("id_b") >= 1000)
        ).collect()
    }


def test_probe_matches_one_shot_formulation(spark, corpus_batch, index_path):
    cdf, bdf, _, _ = corpus_batch
    got = {
        (r["new_id"], r["dup_of"], round(r["est_jaccard"], 9))
        for r in dedup_against_index(spark, index_path, bdf).collect()
    }
    want = _cross_pairs_oracle(spark, cdf, bdf)
    assert got == want
    assert len(got) > 0  # fixture guarantees real near-dups


def test_probe_excludes_identity(spark, corpus_batch, index_path):
    cdf, _, _, _ = corpus_batch
    # probing the corpus against its own index: identity pairs excluded,
    # every est >= threshold, and within-corpus near-dups still surface
    got = dedup_against_index(spark, index_path, cdf)
    assert got.filter(F.col("new_id") == F.col("dup_of")).count() == 0
    assert got.filter(F.col("est_jaccard") < 0.5).count() == 0


def test_filter_against_index(spark, corpus_batch, index_path):
    _, bdf, _, batch = corpus_batch
    matched = {
        r["new_id"]
        for r in dedup_against_index(spark, index_path, bdf).collect()
    }
    kept = filter_against_index(spark, index_path, bdf)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        i for i, _ in batch if i not in matched
    )
    assert kept.columns == bdf.columns


def test_append_then_probe_sees_appended_docs(spark, corpus_batch):
    cdf, bdf, _, _ = corpus_batch
    td = tempfile.mkdtemp(prefix="mh_idx_app_")
    path = f"{td}/index"
    try:
        build_minhash_index(cdf, path)
        append_to_minhash_index(bdf, path)
        # an exact copy of an appended batch doc must now match it
        probe = bdf.limit(1).select(
            (F.col("doc_id") + 5000).alias("doc_id"), "text"
        )
        target = probe.first()["doc_id"] - 5000
        got = dedup_against_index(spark, path, probe)
        assert got.filter(F.col("dup_of") == target).count() == 1
        assert (
            got.filter(F.col("dup_of") == target).first()["est_jaccard"] == 1.0
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)


def test_sidecar_roundtrip(index_path):
    p = load_minhash_params(index_path)
    assert p["num_hashes"] == 64 and p["bands"] == 16
    assert p["id_col"] == "doc_id" and p["text_col"] == "text"


def test_empty_batch(spark, corpus_batch, index_path):
    _, bdf, _, _ = corpus_batch
    empty = bdf.filter(F.lit(False))
    assert dedup_against_index(spark, index_path, empty).count() == 0


def test_probe_plan_prunes_band_partitions(spark, corpus_batch, index_path):
    """The band-store scan must carry STATIC partition filters on the
    (band, bucket) partition columns — the probe reads the batch's own
    bucket directories, not the whole store."""
    _, bdf, _, _ = corpus_batch
    plan = dedup_against_index(
        spark, index_path, bdf.limit(2)
    )._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines()
        if "FileScan" in line and "/bands" in line
    )
    pf = scan.split("PartitionFilters: [", 1)[1]
    # real pruning predicates, not just isnotnull guards
    assert ("bucket" in pf and " IN " in pf) or "= " in pf


def test_probe_shuffle_path_matches_broadcast(spark, corpus_batch, index_path):
    _, bdf, _, _ = corpus_batch
    a = {
        (r["new_id"], r["dup_of"], round(r["est_jaccard"], 9))
        for r in dedup_against_index(spark, index_path, bdf).collect()
    }
    b = {
        (r["new_id"], r["dup_of"], round(r["est_jaccard"], 9))
        for r in dedup_against_index(
            spark, index_path, bdf, broadcast=False
        ).collect()
    }
    assert a == b
