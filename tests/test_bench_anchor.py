"""Bench phase-anchor drift normalization (VERDICT r10 ask #5): the
flag list must be computed on anchor-normalized ratios when both runs
carry an anchor, and fall back to raw ratios against a legacy
baseline. Pure-python — no Spark session."""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench


@pytest.fixture()
def baseline(tmp_path, monkeypatch):
    path = tmp_path / "iso.json"

    def write(anchor):
        doc = {
            "sha": "t", "date": "2026-08-15",
            "queries": {
                "b1_cx": {"median": 1.0, "band": [1, 1]},
                "b2_area_sum": {"median": 2.0, "band": [2, 2]},
            },
        }
        if anchor is not None:
            doc["anchor_sec"] = anchor
        path.write_text(json.dumps(doc))

    monkeypatch.setattr(bench, "BASELINE_ISOLATED", str(path))
    return write


def test_lockstep_drift_self_cancels(baseline):
    """2x uniform machine drift (anchor 0.2 -> 0.4, every query 2x):
    normalized ratios ~1.0, nothing flagged — the r10 +23% adjudication,
    made mechanical."""
    baseline(0.2)
    out = bench._isolated_deltas(
        {"b1_cx": 2.0, "b2_area_sum": 4.0}, anchor_sec=0.4
    )
    assert out["anchor_phase_ratio"] == 2.0
    assert out["ratio_vs_isolated_normalized"] == {
        "b1_cx": 1.0, "b2_area_sum": 1.0,
    }
    assert out["flagged_over_1p2x"] == []


def test_real_regression_still_flags(baseline):
    """A query 3x over canonical in a 2x phase is a genuine 1.5x mover."""
    baseline(0.2)
    out = bench._isolated_deltas({"b1_cx": 3.0}, anchor_sec=0.4)
    assert out["ratio_vs_isolated_normalized"]["b1_cx"] == 1.5
    assert out["flagged_over_1p2x"] == ["b1_cx"]


def test_legacy_baseline_falls_back_to_raw(baseline):
    baseline(None)
    out = bench._isolated_deltas({"b1_cx": 1.5}, anchor_sec=0.4)
    assert "anchor_phase_ratio" not in out
    assert out["flagged_over_1p2x"] == ["b1_cx"]


def test_missing_anchor_now_falls_back_to_raw(baseline):
    baseline(0.2)
    out = bench._isolated_deltas({"b1_cx": 1.5}, anchor_sec=None)
    assert "anchor_phase_ratio" not in out
    assert out["flagged_over_1p2x"] == ["b1_cx"]


def test_per_query_drift_stable_suite_is_unity():
    """Flat warm anchors: every factor 1.0 — matches the old scheme."""
    drift = bench._per_query_drift(
        {"a": 0, "b": 12, "c": 34},
        anchors=[0.4, 0.3, 0.3, 0.3, 0.3],
        anchor_pos=[0, 11, 22, 33, 35],
    )
    assert drift == {"a": 1.0, "b": 1.0, "c": 1.0}


def test_per_query_drift_midsuite_storm_corrects_tail():
    """r14 failure mode: a storm arrives mid-suite (warm anchors
    0.3 → 0.3 → 0.9 → 1.2); tail queries get the larger divisor."""
    drift = bench._per_query_drift(
        {"early": 2, "mid": 22, "late": 34},
        anchors=[0.4, 0.3, 0.3, 0.9, 1.2],
        anchor_pos=[0, 11, 22, 33, 35],
    )
    assert drift["early"] == 1.0       # before first warm anchor
    assert drift["mid"] == 1.0         # exactly at the 0.3 anchor
    assert drift["late"] == 3.5        # interp(34 in [33,35]) = 1.05/0.3


def test_isolated_deltas_applies_drift(baseline):
    """A tail query 3x raw in a 1x cold phase but with a 3x local storm
    drift is NOT flagged; the same raw ratio with unity drift IS."""
    baseline(0.4)
    out = bench._isolated_deltas(
        {"b1_cx": 3.0, "b2_area_sum": 6.0},
        anchor_sec=0.4,
        drift={"b1_cx": 3.0, "b2_area_sum": 1.0},
    )
    assert out["ratio_vs_isolated_normalized"] == {
        "b1_cx": 1.0, "b2_area_sum": 3.0,
    }
    assert out["flagged_over_1p2x"] == ["b2_area_sum"]
    assert out["per_query_drift"]["b1_cx"] == 3.0


def test_per_query_drift_single_warm_anchor_degenerates_to_unity():
    drift = bench._per_query_drift(
        {"a": 0}, anchors=[0.4, 0.3], anchor_pos=[0, 35]
    )
    assert drift == {"a": 1.0}
