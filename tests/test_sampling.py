"""Deterministic hash sampling: reproducibility, rate accuracy, and an
exact Python twin of the md5-prefix threshold rule."""

import hashlib

from pyspark.sql import functions as F

from spatialpandas_spark.operators.sampling import (
    cap_per_group,
    _DENOM,
    hash_sample,
    sample_hash,
    stratified_sample,
)


def _py_hash(key, seed=42):
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_hash_matches_python_md5_prefix(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    got = df.select("id", sample_hash(F.col("id"), 7).alias("h")).collect()
    for r in got:
        assert r["h"] == _py_hash(r["id"], 7)


def test_hash_sample_reproducible_and_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    a = _ids(hash_sample(df, "id", 0.3))
    b = _ids(hash_sample(df.repartition(13), "id", 0.3))
    assert a == b
    expect = [i for i in range(2000) if _py_hash(i) % _DENOM < 300_000]
    assert a == expect
    # rate is approximately honored
    assert 0.25 < len(a) / 2000 < 0.35


def test_stratified_rates_per_group(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = stratified_sample(
        df, "lang", {"de": 1.0, "en": 0.25}, key_col="id", default_rate=0.0
    )
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    assert counts["de"] == 1000  # rate 1.0 keeps every row
    assert 0.18 < counts["en"] / 2000 < 0.32


def test_stratified_default_rate_zero_drops_unlisted(spark):
    rows = [(1, "en"), (2, "fr"), (3, "fr")]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = stratified_sample(df, "lang", {"en": 1.0}, key_col="id")
    assert _ids(out) == [1]


def test_cap_per_group_limits_and_determinism(spark):
    import hashlib

    rows = [(i, f"d{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = cap_per_group(df, "domain", 10, key_col="id")
    got = out.groupBy("domain").count().collect()
    assert all(r["count"] == 10 for r in got)
    # winner set = first 10 ids per domain in (md5 hash, id) order
    def h(i):
        return int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:15], 16)

    for d in range(3):
        ids = [i for i in range(300) if i % 3 == d]
        want = set(sorted(ids, key=lambda i: (h(i), i))[:10])
        assert {r["id"] for r in out.filter(F.col("domain") == f"d{d}").collect()} == want
    # layout-invariant
    out2 = cap_per_group(df.repartition(7), "domain", 10, key_col="id")
    assert sorted(r["id"] for r in out2.collect()) == sorted(
        r["id"] for r in out.collect()
    )


def test_cap_per_group_rank_and_small_groups(spark):
    rows = [(1, "a"), (2, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = cap_per_group(df, "domain", 5, key_col="id", rank_col="r")
    got = {(r["id"], r["r"]) for r in out.collect()}
    assert len(got) == 3 and {r for _, r in got} <= {1, 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cap_per_group(df, "domain", 0, key_col="id")


def test_systematic_sample_matches_python_twin(spark):
    """PPS systematic sampling == the literal lattice scan over the
    python cumsum, including multiplicities; partition-invariant."""
    import hashlib

    import numpy as np

    from spatialpandas_spark.operators.sampling import systematic_sample

    rng = np.random.default_rng(31)
    rows = [(i, int(w)) for i, w in enumerate(rng.integers(0, 80, 600))]
    rows[37] = (37, 500)  # heavy row: always selected, multiplicity >= 1
    df = spark.createDataFrame(rows, "doc_id long, w long")
    step, seed = 120, 42
    off = int(hashlib.md5(f"{seed}:pps".encode()).hexdigest()[:15], 16) % step

    def cnt(x):
        return 0 if x <= off else (x - off - 1) // step + 1

    want, s = {}, 0
    for d, w in rows:
        m = cnt(s + w) - cnt(s)
        if m > 0:
            want[d] = m
        s += w

    for frame in (df, df.repartition(13)):
        got = {
            r["doc_id"]: r["n_hits"]
            for r in systematic_sample(
                frame, "w", ["doc_id"], step=step, seed=seed
            ).collect()
        }
        assert got == want
    # invariants: heavy row in, multiplicity ~ w/step; total hits =
    # lattice points under the total weight; zero-weight rows out
    assert want[37] in (4, 5)
    assert sum(want.values()) == cnt(s)
    assert all(dict(rows)[d] > 0 for d in want)


def test_systematic_sample_rate_and_validation(spark):
    import pytest

    from spatialpandas_spark.operators.sampling import systematic_sample

    df = spark.createDataFrame(
        [(i, 10) for i in range(2000)], "doc_id long, w long"
    )
    out = systematic_sample(df, "w", ["doc_id"], step=100)
    n = out.count()
    # uniform weights: exactly every 10th row (20000/100 = 200 hits)
    assert n == 200
    with pytest.raises(ValueError):
        systematic_sample(df, "w", ["doc_id"], step=0)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 200), min_size=1, max_size=80),
    st.integers(1, 300),
    st.integers(0, 10_000),
)
def test_property_systematic_sample_twin(spark, weights, step, seed):
    """Random weights/steps/seeds: engine == lattice twin, and the total
    hit count equals the lattice points under the total weight."""
    from spatialpandas_spark.operators.sampling import systematic_sample
    import hashlib

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    off = int(hashlib.md5(f"{seed}:pps".encode()).hexdigest()[:15], 16) % step

    def cnt(x):
        return 0 if x <= off else (x - off - 1) // step + 1

    want, s = {}, 0
    for d, w in rows:
        m = cnt(s + w) - cnt(s)
        if m > 0:
            want[d] = m
        s += w
    got = {
        r["doc_id"]: r["n_hits"]
        for r in systematic_sample(
            df, "w", ["doc_id"], step=step, seed=seed
        ).collect()
    }
    assert got == want
    assert sum(got.values()) == cnt(s)


def test_assign_splits_disjoint_exhaustive_deterministic(spark):
    """Every row gets EXACTLY one label; the partition is a pure
    function of the key (invariant under repartitioning and under
    corpus growth); fractions land within the hash-mod envelope; and
    the labels match the python hash twin exactly."""
    import hashlib

    from spatialpandas_spark.operators.sampling import assign_splits

    n = 4000
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r["doc_id"]: r["split"]
        for r in assign_splits(df, "doc_id", splits).collect()
    }
    assert len(got) == n and set(got.values()) == {"train", "val", "test"}

    def twin(i):
        hv = int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        return "train" if hv < 800_000 else ("val" if hv < 900_000 else "test")

    assert all(got[i] == twin(i) for i in range(n))
    from collections import Counter

    c = Counter(got.values())
    assert abs(c["train"] / n - 0.8) < 0.03
    assert abs(c["val"] / n - 0.1) < 0.02

    # partition-invariance + growth-stability: a differently-partitioned
    # superset assigns the SAME labels to the original keys
    df2 = spark.createDataFrame(
        [(i,) for i in range(2 * n)], "doc_id long"
    ).repartition(13)
    got2 = {
        r["doc_id"]: r["split"]
        for r in assign_splits(df2, "doc_id", splits).collect()
    }
    assert all(got2[i] == got[i] for i in range(n))


def test_assign_splits_validation(spark):
    import pytest

    from spatialpandas_spark.operators.sampling import assign_splits

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "doc_id", {"a": 0.6, "b": 0.6})
    with pytest.raises(ValueError, match="non-empty"):
        assign_splits(df, "doc_id", {})
    with pytest.raises(ValueError, match="fraction"):
        assign_splits(df, "doc_id", {"a": 1.2, "b": -0.2})


def test_assign_splits_null_key_raises(spark):
    """A NULL key has no hash -> no deterministic split; the otherwise
    branch raises instead of silently emitting a null label (ADVICE
    r9: the leak would violate the DISJOINT-EXHAUSTIVE contract)."""
    import pytest

    from spatialpandas_spark.operators.sampling import assign_splits

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    out = assign_splits(df, "doc_id", {"train": 0.8, "val": 0.2})
    with pytest.raises(Exception, match="assign_splits: NULL"):
        out.collect()
    # non-null rows are unaffected
    ok = spark.createDataFrame([(1,), (2,)], "doc_id long")
    rows = assign_splits(ok, "doc_id", {"train": 0.8, "val": 0.2}).collect()
    assert all(r["split"] in ("train", "val") for r in rows)
