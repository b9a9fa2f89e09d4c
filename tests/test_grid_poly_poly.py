"""Polygon-polygon intersects at GRID-JOIN scale (round-7 battery).

``sjoin_poly_poly``'s gate and the broadcast-strategy test exercise the
exact polygon-polygon predicate, but through round 6 the grid strategy's
poly-poly path (multi-cell bbox fan-out + report-once dedup + the exact
winding/edge refinement INSIDE the cell join, ref semantics anchor
``intersection.py:398-569``) had no concave/holes adversarial coverage.
This battery runs star (re-entrant radial) and rectilinear-skyline
(axis-parallel grazing) concave fixtures with holes through
``strategy='grid'`` at cell sizes both larger and much smaller than the
typical bbox — the small size forces every bbox across many cells, so a
report-once bug would duplicate or drop pairs — and asserts the pair
set equals BOTH the broadcast strategy and the independent brute-force
oracle, for inner and outer joins.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark import sjoin
from tests import geomgen
from tests.test_general_intersects import _poly_poly_oracle


def _fixtures(seed):
    rng = np.random.default_rng(seed)
    left = geomgen.gen_concave_polygons(rng, 50)
    right = [(100 + i, g) for i, g in geomgen.gen_concave_polygons(rng, 50)]
    expect = {
        (ia, ib)
        for ia, a in left
        for ib, b in right
        if _poly_poly_oracle(a, b)
    }
    return left, right, expect


@pytest.mark.parametrize("seed", [5, 23])
@pytest.mark.parametrize("cell_size", [3.0, 25.0])
def test_grid_poly_poly_matches_broadcast_and_oracle(spark, seed, cell_size):
    left, right, expect = _fixtures(seed)
    ldf = spark.createDataFrame(left, "lid long, geom array<array<double>>")
    rdf = spark.createDataFrame(right, "rid long, geom array<array<double>>")
    b = sjoin(
        ldf, rdf, left_geom="geom", right_geom="geom",
        left_type="polygon", right_type="polygon",
    )
    g = sjoin(
        ldf, rdf, left_geom="geom", right_geom="geom",
        left_type="polygon", right_type="polygon",
        strategy="grid", cell_size=cell_size,
    )
    got_b = {(r["lid"], r["rid"]) for r in b.select("lid", "rid").collect()}
    got_g = {(r["lid"], r["rid"]) for r in g.select("lid", "rid").collect()}
    assert got_b == expect
    assert got_g == expect
    # the battery is only adversarial if fixtures really overlap AND
    # really miss: both sides of the decision must be populated
    assert 0 < len(expect) < len(left) * len(right)


@pytest.mark.parametrize("how", ["left", "right"])
def test_grid_poly_poly_outer_matches_broadcast(spark, how):
    """Outer grid joins through the round-7-pinned rowid recovery must
    agree with broadcast on poly-poly too: same matched pairs, same
    unmatched-null set, every preserved row exactly once."""
    left, right, expect = _fixtures(7)
    ldf = spark.createDataFrame(left, "lid long, geom array<array<double>>")
    rdf = spark.createDataFrame(right, "rid long, geom array<array<double>>")

    def norm(j):
        rows = j.select("lid", "rid").collect()
        pairs = {
            (r["lid"], r["rid"])
            for r in rows
            if r["lid"] is not None and r["rid"] is not None
        }
        nulls = {
            (r["lid"], r["rid"])
            for r in rows
            if r["lid"] is None or r["rid"] is None
        }
        return pairs, nulls, len(rows)

    kw = dict(
        left_geom="geom", right_geom="geom",
        left_type="polygon", right_type="polygon", how=how,
    )
    bp, bn, bc = norm(sjoin(ldf, rdf, **kw))
    gp, gn, gc = norm(sjoin(ldf, rdf, strategy="grid", cell_size=6.0, **kw))
    assert bp == gp == expect
    assert bn == gn
    assert bc == gc
    preserved_ids = (
        {i for i, _ in left} if how == "left" else {i for i, _ in right}
    )
    matched = {p if how == "left" else r for p, r in expect}
    null_ids = {
        (l if how == "left" else r) for l, r in gn
        if (l if how == "left" else r) is not None
    }
    # recovery accounting: nulls are exactly the unmatched preserved rows
    assert null_ids == preserved_ids - matched
