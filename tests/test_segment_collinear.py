"""Segment-intersection degenerate contract (VERDICT r2 item 9).

``_segments_intersect`` deliberately diverges from the reference's
collinear shortcut (ref _algorithms/intersection.py:102-104 returns True
for ANY fully-collinear pair, even disjoint ones); the chosen semantics
here are the exact CLRS formulation. No shapely exists in this
container, so the independent oracle is exact Python integer arithmetic
— on integer coordinates every orientation sign is exact in both
engines, making the comparison bit-perfect.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spatialpandas_spark.functions.predicates import _segments_intersect


# ---------------------------------------------------------- exact oracle
def _orient(ax, ay, bx, by, cx, cy) -> int:
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return (v > 0) - (v < 0)


def _on_seg(px, py, ax, ay, bx, by) -> bool:
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(
        ay, by
    )


def seg_intersect_exact(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> bool:
    d1 = _orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = _orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = _orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = _orient(bx0, by0, bx1, by1, ax1, ay1)
    if d1 * d2 < 0 and d3 * d4 < 0:
        return True
    if d1 == 0 and _on_seg(bx0, by0, ax0, ay0, ax1, ay1):
        return True
    if d2 == 0 and _on_seg(bx1, by1, ax0, ay0, ax1, ay1):
        return True
    if d3 == 0 and _on_seg(ax0, ay0, bx0, by0, bx1, by1):
        return True
    if d4 == 0 and _on_seg(ax1, ay1, bx0, by0, bx1, by1):
        return True
    return False


def _check_batch(spark, cases):
    """Evaluate the Column expression over all cases in ONE Spark job and
    compare row-by-row against the exact oracle."""
    df = spark.createDataFrame(
        [(i, *[float(v) for v in c]) for i, c in enumerate(cases)],
        "i long, ax0 double, ay0 double, ax1 double, ay1 double, "
        "bx0 double, by0 double, bx1 double, by1 double",
    )
    got = {
        r["i"]: r["hit"]
        for r in df.select(
            "i",
            _segments_intersect(
                *[F.col(c) for c in
                  ("ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1")]
            ).alias("hit"),
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == seg_intersect_exact(*c), f"case {c}"


def test_collinear_families_exhaustive(spark):
    """Every 1-D interval relation on a shared line (disjoint, touch,
    overlap, containment, equality, zero-length), on three line
    orientations — the reference's shortcut gets the disjoint ones wrong;
    this implementation must not."""
    cases = []
    R = range(0, 5)
    for a0 in R:
        for a1 in R:
            for b0 in R:
                for b1 in R:
                    # horizontal, vertical, and diagonal carriers
                    cases.append((a0, 0, a1, 0, b0, 0, b1, 0))
                    cases.append((0, a0, 0, a1, 0, b0, 0, b1))
                    cases.append((a0, a0, a1, a1, b0, b0, b1, b1))
    _check_batch(spark, cases)


def test_disjoint_collinear_is_false(spark):
    """The exact case where the reference reports a false positive."""
    cases = [(0, 0, 1, 1, 3, 3, 5, 5), (0, 0, 2, 0, 3, 0, 9, 0)]
    df = spark.createDataFrame(
        [tuple(float(v) for v in c) for c in cases],
        "ax0 double, ay0 double, ax1 double, ay1 double, "
        "bx0 double, by0 double, bx1 double, by1 double",
    )
    hits = [
        r["hit"]
        for r in df.select(
            _segments_intersect(
                *[F.col(c) for c in
                  ("ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1")]
            ).alias("hit")
        ).collect()
    ]
    assert hits == [False, False]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(*[st.integers(min_value=-6, max_value=6)] * 8),
        min_size=150,
        max_size=150,
    )
)
def test_random_segments_match_exact_oracle(spark, cases):
    _check_batch(spark, cases)
