"""sjoin vs brute-force oracle: both physical strategies, all join types,
suffix handling (reference compares against geopandas.sjoin for all hows,
SURVEY.md §5.1 / ref tests/tools/test_sjoin.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import sjoin, st_point
from tests import geomgen, oracles

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def fixtures(spark):
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(RNG.uniform(-60, 60, (250, 2)))]
    polys = geomgen.gen_polygons(RNG, 30)
    left = spark.createDataFrame(pts, "pid long, x double, y double").select(
        "pid", "x", "y", st_point(F.col("x"), F.col("y")).alias("geom")
    )
    right = spark.createDataFrame(polys, "gid long, geom array<array<double>>")
    expect = set()
    for pid, x, y in pts:
        for gid, poly in polys:
            if oracles.point_in_polygon(x, y, poly):
                expect.add((pid, gid))
    return left, right, pts, polys, expect


def test_inner_broadcast(spark, fixtures):
    left, right, pts, polys, expect = fixtures
    j = sjoin(left, right, left_geom="geom", right_geom="geom",
              left_type="point", right_type="polygon")
    # same-name geometry columns must be suffixed independently
    assert j.columns.count("geom_left") == 1
    assert j.columns.count("geom_right") == 1
    got = {(r["pid"], r["gid"]) for r in j.collect()}
    assert got == expect


def test_inner_grid(spark, fixtures):
    left, right, pts, polys, expect = fixtures
    j = sjoin(left, right, left_geom="geom", right_geom="geom",
              left_type="point", right_type="polygon",
              strategy="grid", cell_size=20.0)
    got = {(r["pid"], r["gid"]) for r in j.collect()}
    assert got == expect


def test_left_join_keeps_unmatched(spark, fixtures):
    left, right, pts, polys, expect = fixtures
    j = sjoin(left, right, left_geom="geom", right_geom="geom",
              left_type="point", right_type="polygon", how="left")
    rows = j.collect()
    matched_pids = {p for p, _ in expect}
    got_pairs = {(r["pid"], r["gid"]) for r in rows if r["gid"] is not None}
    got_null_pids = {r["pid"] for r in rows if r["gid"] is None}
    assert got_pairs == expect
    assert got_null_pids == {p for p, _, _ in pts} - matched_pids


def test_right_join_keeps_unmatched_polys(spark, fixtures):
    left, right, pts, polys, expect = fixtures
    j = sjoin(left, right, left_geom="geom", right_geom="geom",
              left_type="point", right_type="polygon", how="right")
    rows = j.collect()
    matched_gids = {g for _, g in expect}
    got_pairs = {(r["pid"], r["gid"]) for r in rows if r["pid"] is not None}
    got_null_gids = {r["gid"] for r in rows if r["pid"] is None}
    assert got_pairs == expect
    assert got_null_gids == {g for g, _ in polys} - matched_gids


def test_colliding_payload_columns_suffixed(spark):
    left = spark.createDataFrame(
        [(1, 0.5, 0.5, 100)], "id long, x double, y double, v long"
    ).select("id", "v", st_point(F.col("x"), F.col("y")).alias("geom"))
    right = spark.createDataFrame(
        [(7, [[0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0]], 200)],
        "id long, poly array<array<double>>, v long",
    )
    j = sjoin(left, right, left_geom="geom", right_geom="poly",
              left_type="point", right_type="polygon")
    row = j.first()
    assert row["v_left"] == 100 and row["v_right"] == 200
    assert row["id_left"] == 1 and row["id_right"] == 7


def test_invalid_args_raise(spark, fixtures):
    left, right, *_ = fixtures
    with pytest.raises(ValueError):
        sjoin(left, right, how="full")
    with pytest.raises(ValueError):
        sjoin(left, right, op="within")
    with pytest.raises(ValueError):
        sjoin(left, right, strategy="grid")  # missing cell_size


def test_point_point_equality_join(spark):
    a = spark.createDataFrame([(1, 1.0, 2.0), (2, 3.0, 4.0)], "aid long, x double, y double")
    a = a.select("aid", st_point(F.col("x"), F.col("y")).alias("geom"))
    b = spark.createDataFrame([(9, 1.0, 2.0)], "bid long, x double, y double")
    b = b.select("bid", st_point(F.col("x"), F.col("y")).alias("geom"))
    j = sjoin(a, b, left_geom="geom", right_geom="geom",
              left_type="point", right_type="point")
    rows = j.collect()
    assert [(r["aid"], r["bid"]) for r in rows] == [(1, 9)]


def test_grid_outer_joins_match_broadcast(spark):
    """Grid-strategy left/right joins (inner + anti-join recovery) produce
    exactly the broadcast strategy's result."""
    import numpy as np

    from spatialpandas_spark import sjoin, st_make_diamond, st_point

    rng = np.random.default_rng(7)
    pts_rows = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(rng.uniform(0, 100, (800, 2)))
    ]
    pts = spark.createDataFrame(pts_rows, "pid long, x double, y double").select(
        "pid", st_point(F.col("x"), F.col("y")).alias("geom")
    )
    dias = spark.range(6).select(
        F.col("id").alias("did"),
        st_make_diamond(
            (F.col("id") * 18 + 8).cast("double"),
            (F.col("id") * 13 + 11).cast("double"),
            F.lit(7.5),
        ).alias("poly"),
    )

    def norm(df):
        return {
            (r["pid"], r["did"])
            for r in df.select("pid", "did").collect()
        }

    for how in ("left", "right"):
        b = sjoin(
            pts, dias, left_geom="geom", right_geom="poly",
            left_type="point", right_type="polygon", how=how,
        )
        g = sjoin(
            pts, dias, left_geom="geom", right_geom="poly",
            left_type="point", right_type="polygon", how=how,
            strategy="grid", cell_size=20.0,
        )
        assert norm(g) == norm(b), how
        assert g.count() == b.count(), how


def test_sjoin_arrow_refine_matches_expr(spark):
    """refine='arrow' (bbox-only join + vectorized pair ray cast) equals
    the expression path for point×polygon and point×multipolygon."""
    import numpy as np

    from spatialpandas_spark import sjoin, st_make_diamond, st_point

    rng = np.random.default_rng(13)
    pts = spark.createDataFrame(
        [
            (i, float(x), float(y))
            for i, (x, y) in enumerate(rng.uniform(0, 100, (1500, 2)))
        ],
        "pid long, x double, y double",
    ).select("pid", st_point(F.col("x"), F.col("y")).alias("geom"))
    dias = spark.range(8).select(
        F.col("id").alias("did"),
        st_make_diamond(
            (F.col("id") * 14 + 6).cast("double"),
            (F.col("id") * 11 + 9).cast("double"),
            F.lit(8.5),
        ).alias("poly"),
    )
    mp = dias.select(
        "did", F.array(F.col("poly"), F.col("poly")).alias("poly")
    )

    def pairs(df):
        return {(r["pid"], r["did"]) for r in df.select("pid", "did").collect()}

    for right, rt in ((dias, "polygon"), (mp, "multipolygon")):
        for strat, cs in (("broadcast", None), ("grid", 25.0)):
            a = pairs(
                sjoin(
                    pts, right, left_geom="geom", right_geom="poly",
                    left_type="point", right_type=rt,
                    strategy=strat, cell_size=cs,
                )
            )
            b = pairs(
                sjoin(
                    pts, right, left_geom="geom", right_geom="poly",
                    left_type="point", right_type=rt,
                    strategy=strat, cell_size=cs, refine="arrow",
                )
            )
            assert a == b and a, (rt, strat)


def test_sjoin_arrow_refine_rejects_unsupported(spark):
    from spatialpandas_spark import sjoin, st_point

    df = spark.range(2).select(
        "id", st_point(F.col("id").cast("double"), F.lit(0.0)).alias("geom")
    )
    with pytest.raises(ValueError, match="refine='arrow'"):
        sjoin(
            df, df, left_geom="geom", right_geom="geom",
            left_type="point", right_type="point", refine="arrow",
        )


def test_auto_strategy_small_side_broadcasts(spark, fixtures, tmp_path):
    """auto needs a REAL size estimate to choose broadcast, so the right
    side comes from parquet (file-size stats); in-memory frames have a
    worthless huge default estimate and conservatively grid instead —
    the safe choice, covered by the next test."""
    from spatialpandas_spark.plans.inspect import physical_plan

    left, right, pts, polys, expect = fixtures
    p = str(tmp_path / "right.parquet")
    right.write.parquet(p)
    right_pq = spark.read.parquet(p)
    j = sjoin(left, right_pq, left_geom="geom", right_geom="geom",
              left_type="point", right_type="polygon", strategy="auto")
    assert "BroadcastNestedLoopJoin" in physical_plan(j)
    got = {(r["pid"], r["gid"]) for r in j.collect()}
    assert got == expect


def test_auto_strategy_big_side_grids(spark, fixtures):
    from spatialpandas_spark.plans.inspect import physical_plan

    left, right, pts, polys, expect = fixtures
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        j = sjoin(left, right, left_geom="geom", right_geom="geom",
                  left_type="point", right_type="polygon", strategy="auto")
        plan = physical_plan(j)
        # the grid plan is a hash equi-join on cells, never a BNLJ
        assert "BroadcastNestedLoopJoin" not in plan, plan
        got = {(r["pid"], r["gid"]) for r in j.collect()}
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_auto_grid_estimates_cell_size_for_points(spark, fixtures):
    """Degenerate right-side bounds (points) fall back to the sampled
    extent — the estimator never returns a zero/NaN cell."""
    left, right, pts, polys, expect = fixtures
    ptsr = spark.createDataFrame(
        pts, "gid long, x double, y double"
    ).select("gid", st_point(F.col("x"), F.col("y")).alias("geom"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        j = sjoin(left, ptsr, left_geom="geom", right_geom="geom",
                  left_type="point", right_type="point", strategy="auto")
        got = {(r["pid"], r["gid"]) for r in j.collect()}
        want = {(pid, pid) for pid, _, _ in pts}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_grid_cell_refinement_gated_and_invariant(spark, fixtures, monkeypatch):
    """r15: an oversized caller cell is refined from the bounds sample —
    but only past the size gate (constant sampling cost must not tax
    MB-scale known-size inputs; unknown estimates engage, the safe
    direction) — and the result set is cell-size-invariant."""
    import importlib

    sjmod = importlib.import_module("spatialpandas_spark.operators.sjoin")

    left, right, pts, polys, expect = fixtures

    def run():
        j = sjoin(left, right, left_geom="geom", right_geom="geom",
                  left_type="point", right_type="polygon",
                  strategy="grid", cell_size=1000.0)
        return {(r["pid"], r["gid"]) for r in j.collect()}

    seen = []
    orig = sjmod._sampled_geom_side
    monkeypatch.setattr(
        sjmod, "_sampled_geom_side",
        lambda df, b, sample_n=2048: seen.append(1) or orig(df, b, sample_n),
    )
    # below the gate (known-small estimate): caller's cell stands, no jobs
    monkeypatch.setattr(sjmod, "_plan_size_bytes", lambda df: 1 << 20)
    assert run() == expect
    assert not seen, "sampler must not run below the size gate"
    # past the gate: the sampler runs, the cell shrinks, results identical
    monkeypatch.setattr(sjmod, "_plan_size_bytes", lambda df: 1 << 40)
    assert run() == expect
    assert seen, "sampler must engage past the gate"
