"""Bit-exactness contract: every Arrow fast-path kernel must produce
values IDENTICAL (not just close) to its Catalyst defining expression —
that equality is what lets the gates keep exact DuckDB oracles while the
bulk path runs vectorized. Random vectors with adversarial values
(denormal-ish magnitudes, zeros, exact ties) are compared bit-for-bit."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from spatialpandas_spark.operators.similarity import (
    _centroid_sims,
    _hyperplanes,
    _with_centroids,
    bucket_assign_arrow,
    cosine,
    pair_cosine_arrow,
    rp_signature,
    rp_signatures_arrow,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(123)
    vecs = rng.standard_normal((300, 16)) * np.logspace(-3, 3, 16)
    vecs[0] = 0.0  # zero vector -> cosine guard path
    vecs[1] = vecs[2]  # exact duplicates -> ties
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_pair_cosine_bitexact(spark, vectors):
    pairs = (
        vectors.alias("a")
        .join(vectors.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(F.col("b.vec_id") - F.col("a.vec_id") <= 3)
        .select(
            F.col("a.vec_id").alias("qid"),
            F.col("b.vec_id").alias("vec_id"),
            F.col("a.v").alias("__qv"),
            F.col("b.v").alias("__cv"),
        )
    )
    hof = {
        (r["qid"], r["vec_id"]): r["sim"]
        for r in pairs.select(
            "qid", "vec_id", cosine(F.col("__qv"), F.col("__cv")).alias("sim")
        ).collect()
    }
    arrow = {
        (r["qid"], r["vec_id"]): r["sim"]
        for r in pair_cosine_arrow(pairs).collect()
    }
    assert hof.keys() == arrow.keys()
    for key in hof:
        # bit-for-bit, not isclose
        assert hof[key] == arrow[key], key


def test_bucket_assign_bitexact(spark, vectors):
    cents = [[float(x) for x in row] for row in
             np.random.default_rng(7).standard_normal((6, 16))]
    catalyst = _with_centroids(
        vectors.select("vec_id", F.col("v").alias("__cv")), cents
    )
    sims = _centroid_sims(F.col("__cv"))
    expected = {
        r["vec_id"]: r["b"]
        for r in catalyst.select(
            "vec_id",
            (F.array_position(sims, F.array_max(sims)) - 1)
            .cast("int")
            .alias("b"),
        ).collect()
    }
    got = {
        r["vec_id"]: r["__bucket"]
        for r in bucket_assign_arrow(
            vectors.select("vec_id", F.col("v").alias("__cv")), cents
        ).collect()
    }
    assert got == expected


def test_rp_signature_bitexact(spark, vectors):
    planes = _hyperplanes(16, 12, seed=5)
    expected = {
        r["vec_id"]: r["sig"]
        for r in vectors.select(
            "vec_id", rp_signature(F.col("v"), planes).alias("sig")
        ).collect()
    }
    got = {
        r["vec_id"]: r["__sig"]
        for r in rp_signatures_arrow(
            vectors.select("vec_id", F.col("v").alias("__v")), planes
        ).collect()
    }
    assert got == expected
