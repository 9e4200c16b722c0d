"""Plan-shape regression budgets for flagship queries.

`scripts/audit_plans.py` sweeps every query each round; this module
PINS the flagship plan shapes in CI so a regression (an extra corpus
scan from a broken reuse, a new unintended cartesian, a row-at-a-time
Python node, a filter that stops pushing down) fails a test instead of
waiting for the round-end audit. Budgets are ceilings with headroom —
minor AQE/statistics drift must not flap them, a doubled shuffle count
must.
"""

from __future__ import annotations

import re

import pytest

from conftest import SF_DIR

from recommedation_system_under_flink_spark import registry


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


#: name -> (max scans, max exchanges, cartesian allowed?, pushdown must be ok?)
#: measured round 7 at sf0.001: scans/exchanges were
#: hot_topics 1/1, tfidf 8/23, j3 8/22, minhash 6/13, ivf_pinned 2/3,
#: logreg 1/1, curation_fused 1/1, mix_fused 2/7, rfm 2/2, q1 1/1,
#: decontamination 2/4 (p1 memoizes to a checkpoint: 0/0).
BUDGETS = {
    "hot_topics_pipeline": (2, 3, False, True),
    "tfidf_pipeline": (10, 28, True, True),
    "j3_scored_join": (10, 27, True, True),
    "dedup_minhash_lsh": (8, 17, False, False),
    "sim_ivf_topk_pinned": (3, 5, False, False),
    "ml_logreg_gd": (2, 3, False, False),
    "llm_curation_fused": (2, 3, False, False),
    "llm_curation_mix_fused": (3, 10, True, False),
    "ev_user_rfm_scalable": (3, 4, False, False),
    "rel_q1_pricing_summary": (2, 3, False, False),
    "ts_decontamination": (3, 7, False, False),
    # round 8: CDC chunking measured 2/3 (boundary scan is shuffle-free;
    # the 3 exchanges are hash-freq groupBy + join-back + per-doc agg)
    "dedup_cdc_chunks": (3, 5, False, False),
    # round 8 widening, measured at sf0.001: a5 3/7 (cartesian = the
    # 1-row corpus-size scalar broadcast), sessionize 1/1, bruteforce
    # 2/2 (cartesian = the by-design broadcast query fan-out), q9 5/5,
    # props_rollup 1/1
    "a5_news_tfidf": (4, 10, True, False),
    # sessionize reads the FULL events table (no predicate exists to
    # push), so pushdown is not required of it
    "ef_sessionize": (2, 3, False, False),
    "sim_bruteforce_topk": (3, 4, True, False),
    "rel_q9_product_profit": (6, 8, False, False),
    "ev_props_rollup": (2, 3, False, True),
    # round-8 session additions, measured at sf0.001: cv_ridge 3/8
    # (cartesian = the 1-row global-moment + 3-row lambda-spine
    # broadcasts), line_level 2/4, multiprobe 2/4 (post distinct
    # removal — a third distinct would push this back to 5+),
    # scene_cuts 1/1, dp_release 1/2
    "ml_cv_ridge_path": (4, 10, True, False),
    "dedup_line_level": (3, 6, False, False),
    "sim_multiprobe_lsh_topk": (3, 5, False, False),
    "mm_scene_cuts": (2, 2, False, False),
    "prof_dp_release": (2, 3, False, False),
    # round 9: the remaining top-6 cost centers (r8 verdict ask #6),
    # measured at sf0.001: prefix-filter 10/27; markov 0/12 with the
    # 1-row total-journeys scalar broadcast as its only cartesian;
    # p1-distributed and HITS memoize through a checkpoint, so their
    # executed plans must STAY trivial — a regression that drops the
    # checkpoint shows up as reappearing scans/exchanges
    "dedup_prefix_filter_join": (12, 32, False, False),
    # round 11: the matrix powers moved to exact bounded driver
    # arithmetic (the ≤(M+3)²-cell relation is collected once; the
    # r10-verdict watch item on this query's micro-job floor), so the
    # RETURNED plan must stay a local-relation projection — any
    # scan/exchange means the bounded-state contract broke
    "ef_markov_attribution": (0, 0, False, False),
    "p1_news_keywords_distributed": (2, 4, False, False),
    "graph_hits_clicks": (2, 4, False, False),
    # round 9: the bucketed co-located join MUST stay shuffle-free —
    # any Exchange at all means the bucketing contract broke (the two
    # "scans" here are the bucketed-table reads; the writes happen
    # before the returned plan)
    "s28_bucketed_join_colocated": (2, 0, False, False),
    # round-10 session additions, measured at sf0.001: als 10/26 with
    # the items-bounded factor broadcast as its only cartesian (4
    # half-sweep joins + the scoring fan-out); pc1 1/0 — the whole
    # eigenvector derivation is bounded driver state, so the RETURNED
    # plan must stay a single-scan shuffle-free map projection; kmv
    # 2/22 after the sketch localCheckpoint (the 2 scans are the
    # corpus-exact audit's two du legs — the sketch itself must NOT
    # rescan the click log); holt 0/0 — a calendar-bounded local
    # relation, any scan/exchange means the bounded-state contract
    # broke
    "als_rank1_topk": (11, 30, True, False),
    "sim_pca_pc1_project": (2, 1, False, False),
    "sk_kmv_day_overlap": (3, 26, False, False),
    "ev_holt_linear_daily": (0, 0, False, False),
    # diag whitening measured 2/2 at sf0.001 (scan + moment aggregate
    # + the broadcast join back); must stay cartesian-free and near
    # this shape — a third scan means the moment reuse broke
    "sim_whiten_diag_project": (3, 4, False, False),
    # kmv monthly rollup measured 1/8 at sf0.001 (the 1 scan is the
    # exact-audit leg; the sketch merge reads the localCheckpointed
    # daily sketch — a second scan means the checkpoint broke)
    "sk_kmv_monthly_rollup": (2, 12, False, False),
    # round 12: the three two-phase prefix-sum rewrites, measured at
    # sf0.01: mannwhitney 3/11, ks 4/11, trimmed 4/11; the cartesian
    # is the intended broadcast triangular bucket-offset join over the
    # O(range/width) bucket grid (operators/prefix.py)
    "ef_mannwhitney_u": (4, 14, True, False),
    "ev_ks_drift": (5, 14, True, False),
    "ev_trimmed_mean": (5, 14, True, False),
}

#: Queries whose plans must contain ZERO single-partition Window nodes
#: (the round-11 verdict item-6 rewrites; a reappearing global window
#: means the two-phase prefix sum broke).
NO_GLOBAL_WINDOW = ("ef_mannwhitney_u", "ev_ks_drift", "ev_trimmed_mean")


@pytest.mark.parametrize("name", NO_GLOBAL_WINDOW)
def test_no_global_window(name, spark, queries):
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from audit_plans import _count_global_windows

    executed = (
        queries[name](spark, SF_DIR)._jdf.queryExecution().executedPlan()
    )
    assert _count_global_windows(executed) == 0, (
        f"{name}: single-partition Window reappeared — the two-phase "
        "prefix sum (operators/prefix.py) is no longer in the plan"
    )


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_plan_budget(name, spark, queries):
    max_scans, max_exch, cartesian_ok, needs_pushdown = BUDGETS[name]
    plan = (
        queries[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = len(re.findall(r"Scan parquet", plan))
    exchanges = len(re.findall(r"Exchange", plan))
    cartesian = bool(
        re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan)
    )
    assert scans <= max_scans, f"{name}: {scans} scans > budget {max_scans}"
    assert (
        exchanges <= max_exch
    ), f"{name}: {exchanges} exchanges > budget {max_exch}"
    if not cartesian_ok:
        assert not cartesian, f"{name}: unexpected cartesian/BNLJ node"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if needs_pushdown and re.search(r"events\.parquet", plan):
        assert re.findall(
            r"PushedFilters: \[\s*[A-Za-z]", plan
        ), f"{name}: events scan lost its PushedFilters"
