"""Calm-window detector (round-10 verdict item 4): bench runs must
self-classify calm/noisy from their own probe-query timings so README
deltas are computed over calm-window minima only."""

from __future__ import annotations

import hashlib
import inspect
import textwrap

import bench


#: Pinned source digests of each calm-probe member's registered builder
#: (round-11 verdict item 3). The committed per-query minima in
#: ``bench.CALM_PROBE_COMMITTED_MIN_SEC`` are only meaningful while the
#: probe members' CODE is unchanged — a rewrite invalidates the
#: committed minimum (the `ef_markov_attribution` case in round 11,
#: handled then by convention only). This pin makes the invariant
#: mechanical: changing a probe query's builder fails CI until the
#: minimum is deliberately re-measured and BOTH tables updated.
#: Round-12 re-pin: sim_dbscan_lsh / dedup_prefix_filter_join changed
#: execution (minima re-measured as best-in-round noisy-window upper
#: bounds — see bench.py note); ts_bigram_lm_perplexity's diff is
#: comment-only after the measured revert (minimum kept).
#: Round-13 re-pin: dedup_prefix_filter_join gained the PPJoin length
#: filter (result-identical candidate prune; paired probes ~10%
#: faster). Its committed minimum 4.753 — an r12 lucky-window sample
#: BELOW the first calm window's 6.752 — is kept: pins only tighten,
#: and the new code is strictly faster than the code that produced
#: both samples.
PROBE_BUILDER_DIGESTS = {
    "dedup_prefix_filter_join": "ee4efad26dfea168",
    "p1_news_keywords_distributed": "d4427587597072ff",
    "rel_q9_product_profit": "60a6cc804cb44b74",
    "sim_dbscan_lsh": "4177ac4c5759e236",
    "ts_bigram_lm_perplexity": "91f492e9112d835e",
}


def _builder_digest(name: str) -> str:
    from recommedation_system_under_flink_spark import registry

    registry._load_all()
    fn = registry._REGISTRY[name].fn
    src = textwrap.dedent(inspect.getsource(fn))
    return hashlib.sha256(src.encode()).hexdigest()[:16]


def test_probe_member_source_is_pinned():
    """A probe member's builder source drifting from its pinned digest
    means its committed calm-probe minimum is stale: re-measure the
    minimum on a calm window, update CALM_PROBE_COMMITTED_MIN_SEC, and
    re-pin the digest here — in that order, deliberately."""
    assert set(PROBE_BUILDER_DIGESTS) == set(
        bench.CALM_PROBE_COMMITTED_MIN_SEC
    ), "probe membership changed: re-measure minima and re-pin digests"
    drifted = {
        name: got
        for name, want in PROBE_BUILDER_DIGESTS.items()
        if (got := _builder_digest(name)) != want
    }
    assert not drifted, (
        f"probe builder source changed ({drifted}); the committed calm "
        "minima are stale — re-measure on a calm window before re-pinning"
    )


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
