"""Deterministic ordering/mixing vs Python-computed oracles."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.ordering import (
    deterministic_shuffle,
    mix_sources,
    with_shuffle_rank,
)

DENOM = 1_000_000


def _h(seed, key):
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )


def test_shuffle_order_matches_oracle(spark, docs):
    got = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id").collect()]
    want = sorted(range(200), key=lambda i: (_h(42, i), i))
    assert got == want
    # pseudo-random: differs from natural order, same multiset
    assert got != sorted(got) and sorted(got) == list(range(200))


def test_shuffle_layout_invariant(spark, docs):
    a = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id").collect()]
    b = [
        r["doc_id"]
        for r in deterministic_shuffle(docs.repartition(7), "doc_id").collect()
    ]
    assert a == b


def test_shuffle_seed_changes_order(spark, docs):
    a = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id", seed=1).collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id", seed=2).collect()]
    assert a != b and sorted(a) == sorted(b)


def test_shuffle_rank_is_dense_and_consistent(spark, docs):
    rows = with_shuffle_rank(docs, "doc_id").collect()
    by_rank = sorted(rows, key=lambda r: r["shuffle_rank"])
    assert [r["shuffle_rank"] for r in by_rank] == list(range(200))
    assert [r["doc_id"] for r in by_rank] == [
        r["doc_id"] for r in deterministic_shuffle(docs, "doc_id").collect()
    ]


def test_mix_sources_weights(spark, docs):
    a = docs.filter(F.col("doc_id") < 100)
    b = docs.filter(F.col("doc_id") >= 100)
    out = mix_sources(
        {"a": a, "b": b}, {"a": 2.5, "b": 0.4}, key_col="doc_id"
    ).collect()
    na = sum(1 for r in out if r["source"] == "a")
    nb = sum(1 for r in out if r["source"] == "b")
    # a: 2 full epochs + ~50% sample; b: ~40% sample (hash-sampled, so
    # the fraction is approximate but deterministic)
    assert 200 + 25 <= na <= 200 + 75
    assert 20 <= nb <= 60
    # every full-epoch copy present exactly once per epoch
    ep0 = [r["doc_id"] for r in out if r["source"] == "a" and r["epoch"] == 0]
    ep1 = [r["doc_id"] for r in out if r["source"] == "a" and r["epoch"] == 1]
    assert sorted(ep0) == list(range(100)) and sorted(ep1) == list(range(100))


def test_mix_sources_deterministic_and_interleaved(spark, docs):
    a = docs.filter(F.col("doc_id") < 100)
    b = docs.filter(F.col("doc_id") >= 100)
    r1 = [
        (r["source"], r["epoch"], r["doc_id"])
        for r in mix_sources(
            {"a": a, "b": b}, {"a": 1.0, "b": 1.0}, key_col="doc_id"
        ).collect()
    ]
    r2 = [
        (r["source"], r["epoch"], r["doc_id"])
        for r in mix_sources(
            {"a": a.repartition(5), "b": b}, {"a": 1.0, "b": 1.0}, key_col="doc_id"
        ).collect()
    ]
    assert r1 == r2
    # sources interleave rather than concatenate
    first_half_sources = {s for s, _, _ in r1[:100]}
    assert first_half_sources == {"a", "b"}


def test_mix_sources_validation(spark, docs):
    with pytest.raises(ValueError):
        mix_sources({"a": docs}, {"b": 1.0}, key_col="doc_id")
    with pytest.raises(ValueError):
        mix_sources({"a": docs}, {"a": -1.0}, key_col="doc_id")


# ---------------------------------------------------- temperature mixing
def test_temperature_weights_t1_is_natural():
    from spatialpandas_spark.operators.ordering import temperature_weights

    w = temperature_weights({"a": 1000, "b": 50, "c": 10})
    assert all(abs(v - 1.0) < 1e-12 for v in w.values())


def test_temperature_weights_flattens_and_budgets():
    from spatialpandas_spark.operators.ordering import temperature_weights

    sizes = {"big": 10000, "small": 100}
    w = temperature_weights(sizes, temperature=2.0)
    # expected output size preserved at the natural total
    assert abs(sum(w[s] * sizes[s] for s in sizes) - 10100) < 1e-6
    # T>1 upsamples the small source, downsamples the big one
    assert w["small"] > 1.0 > w["big"]
    # closed form: q ∝ p^(1/2)
    import math

    p_big, p_small = 10000 / 10100, 100 / 10100
    z = math.sqrt(p_big) + math.sqrt(p_small)
    assert abs(w["small"] - 10100 * math.sqrt(p_small) / z / 100) < 1e-9
    # very high T approaches uniform shares: each source gets ~budget/2
    w_inf = temperature_weights(sizes, temperature=1e9, budget=2000)
    assert abs(w_inf["small"] * 100 - 1000) < 1.0
    assert abs(w_inf["big"] * 10000 - 1000) < 1.0


def test_temperature_weights_validates():
    import pytest as _pytest

    from spatialpandas_spark.operators.ordering import temperature_weights

    with _pytest.raises(ValueError):
        temperature_weights({"a": 10}, temperature=0.0)
    with _pytest.raises(ValueError):
        temperature_weights({})
    with _pytest.raises(ValueError):
        temperature_weights({"a": 0})


def test_temperature_weights_feed_mix_sources(spark):
    """End-to-end: T-weighted mixture through mix_sources — the small
    source appears with epoch replication, expected counts within the
    hash-sampling tolerance."""
    from spatialpandas_spark.operators.ordering import (
        mix_sources,
        temperature_weights,
    )

    big = spark.range(0, 2000).withColumnRenamed("id", "k")
    small = spark.range(0, 100).withColumnRenamed("id", "k")
    w = temperature_weights({"big": 2000, "small": 100}, temperature=3.0)
    out = mix_sources(
        {"big": big, "small": small}, w, key_col="k"
    ).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    for name, n in (("big", 2000), ("small", 100)):
        exp = w[name] * n
        assert abs(got[name] - exp) < 0.15 * exp + 20, (name, got[name], exp)
