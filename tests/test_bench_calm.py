"""Calm-window detector (round-10 verdict item 4): bench runs must
self-classify calm/noisy from their own probe-query timings so README
deltas are computed over calm-window minima only."""

from __future__ import annotations

import bench


def _probe_times(factor: float) -> dict[str, float]:
    return {
        k: v * factor for k, v in bench.CALM_PROBE_COMMITTED_MIN_SEC.items()
    }


def test_probe_members_are_headline_queries():
    # zero added bench cost: the probe reuses HEADLINE timings
    missing = [
        k for k in bench.CALM_PROBE_COMMITTED_MIN_SEC if k not in bench.HEADLINE
    ]
    assert not missing, missing


def test_calm_within_band():
    out = bench.classify_calm(_probe_times(1.10), 0.1)
    assert out["calm"] is True
    assert out["ratio"] == 1.1


def test_noisy_outside_band():
    out = bench.classify_calm(_probe_times(1.30), 0.1)
    assert out["calm"] is False


def test_boundary_is_inclusive():
    out = bench.classify_calm(_probe_times(bench.CALM_BAND), 0.1)
    assert out["calm"] is True


def test_non_default_sf_is_unclassified():
    assert bench.classify_calm(_probe_times(1.0), 0.01)["calm"] is None


def test_missing_probe_member_is_unclassified():
    t = _probe_times(1.0)
    t.pop(next(iter(t)))
    assert bench.classify_calm(t, 0.1)["calm"] is None
