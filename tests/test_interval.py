"""interval_join vs a brute-force pandas oracle."""

import numpy as np
import pytest

from spatialpandas_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(5)
    pts = [(int(i), float(rng.uniform(0, 100))) for i in range(400)]
    ivs = []
    for j in range(60):
        s = float(rng.uniform(-5, 95))
        ivs.append((int(j), s, s + float(rng.uniform(0, 15))))
    # a degenerate and an inverted interval
    ivs.append((60, 50.0, 50.0))
    ivs.append((61, 80.0, 70.0))
    pdf = spark.createDataFrame(pts, "pid long, v double")
    idf = spark.createDataFrame(ivs, "iid long, s double, e double")
    return pdf, idf, pts, ivs


def _oracle_pairs(pts, ivs):
    return {
        (pid, iid)
        for pid, v in pts
        for iid, s, e in ivs
        if s <= v <= e
    }


@pytest.mark.parametrize("width", [1.0, 7.5, 40.0])
def test_inner_matches_brute_force(spark, data, width):
    pdf, idf, pts, ivs = data
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pdf, idf, "v", "s", "e", width).collect()
    }
    assert got == _oracle_pairs(pts, ivs)


def test_left_keeps_unmatched_points(spark, data):
    pdf, idf, pts, ivs = data
    out = interval_join(pdf, idf, "v", "s", "e", 10.0, how="left").collect()
    oracle = _oracle_pairs(pts, ivs)
    matched_pids = {p for p, _ in oracle}
    got_pairs = {(r["pid"], r["iid"]) for r in out if r["iid"] is not None}
    got_null_pids = {r["pid"] for r in out if r["iid"] is None}
    assert got_pairs == oracle
    assert got_null_pids == {p for p, _ in pts} - matched_pids


def test_column_collision_rejected(spark, data):
    pdf, idf, _, _ = data
    with pytest.raises(ValueError, match="collision"):
        interval_join(pdf, pdf.withColumnRenamed("pid", "s"), "v", "s", "v", 1.0)


def test_negative_values_bucket_correctly(spark):
    pdf = spark.createDataFrame([(0, -3.5), (1, -0.1), (2, 0.1)], "pid long, v double")
    idf = spark.createDataFrame([(0, -4.0, 0.0)], "iid long, s double, e double")
    got = sorted(
        r["pid"] for r in interval_join(pdf, idf, "v", "s", "e", 2.0).collect()
    )
    assert got == [0, 1]
