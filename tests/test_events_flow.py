"""Semantic invariants for the event-flow, components, and sampling
operators — properties the DuckDB oracle parity can't express (the
oracle proves engine agreement; these prove the *semantics* are the
advertised ones), on the sf0.001 fixtures."""

from __future__ import annotations

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_asof_match_is_latest_prior_click(queries, spark):
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.sources import events_raw, load_raw

    out = {
        (r["user_id"], r["purchase_id"]): r
        for r in queries["ef_asof_purchase_click"](spark, SF_DIR).collect()
    }
    ev = events_raw(spark, SF_DIR).select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("tsm"), "event_type"
    )
    rows = ev.collect()
    purchases = [r for r in rows if r["event_type"] == "purchase"]
    clicks_by_user: dict[int, list] = {}
    for r in rows:
        if r["event_type"] == "click":
            clicks_by_user.setdefault(r["user_id"], []).append(r)
    assert len(out) == len(purchases)
    for p in purchases:
        got = out[(p["user_id"], p["event_id"])]
        prior = [
            c for c in clicks_by_user.get(p["user_id"], []) if c["tsm"] <= p["tsm"]
        ]
        if not prior:
            assert got["click_id"] is None and got["gap_us"] is None
        else:
            best = max(prior, key=lambda c: (c["tsm"], c["event_id"]))
            assert got["click_id"] == best["event_id"]
            assert got["gap_us"] == p["tsm"] - best["tsm"]


def test_sessions_partition_events_and_respect_gap(queries, spark):
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.operators.events_flow import (
        SESSION_GAP_US,
    )
    from recommedation_system_under_flink_spark.sources import events_raw, load_raw

    sessions = queries["ef_sessionize"](spark, SF_DIR).collect()
    ev = (
        events_raw(spark, SF_DIR)
        .select("user_id", F.expr("ts DIV 1000").alias("tsm"))
        .collect()
    )
    # sessions partition the events: counts add up
    assert sum(s["n_events"] for s in sessions) == len(ev)
    by_user: dict[int, list] = {}
    for s in sessions:
        by_user.setdefault(s["user_id"], []).append(s)
    for user, ss in by_user.items():
        ss.sort(key=lambda s: s["session_seq"])
        # 1-based contiguous numbering per user
        assert [s["session_seq"] for s in ss] == list(range(1, len(ss) + 1))
        for a, b in zip(ss, ss[1:]):
            # sessions don't overlap and consecutive ones are > gap apart
            assert b["session_start"] - a["session_end"] > SESSION_GAP_US
        for s in ss:
            assert s["duration_us"] == s["session_end"] - s["session_start"]


def test_components_agree_with_neardup_pairs(queries, spark):
    comp = {
        r["vec_id"]: r["component"]
        for r in queries["sim_neardup_components"](spark, SF_DIR).collect()
    }
    pairs = queries["sim_neardup_pairs_exact"](spark, SF_DIR).collect()
    # every near-dup pair landed in the same component
    for p in pairs:
        assert comp[p["vec_a"]] == comp[p["vec_b"]]
    # each component is labeled by its smallest member
    members: dict[int, list] = {}
    for v, c in comp.items():
        members.setdefault(c, []).append(v)
    for label, vs in members.items():
        assert label == min(vs)
    # non-singleton components only arise from pairs
    linked = {v for p in pairs for v in (p["vec_a"], p["vec_b"])}
    for label, vs in members.items():
        if len(vs) > 1:
            assert set(vs) <= linked


def test_split_assign_proportions_and_determinism(queries, spark):
    rows = queries["samp_split_assign"](spark, SF_DIR).collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    n = len(rows)
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / n == pytest.approx(0.8, abs=0.1)
    again = queries["samp_split_assign"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_stratified_sample_caps_each_stratum(queries, spark):
    from recommedation_system_under_flink_spark.operators.sampling import STRATUM_N

    rows = queries["samp_stratified"](spark, SF_DIR).collect()
    per: dict[tuple, int] = {}
    for r in rows:
        key = (r["lang"], r["source"])
        per[key] = per.get(key, 0) + 1
        assert 1 <= r["pos"] <= STRATUM_N
    assert max(per.values()) <= STRATUM_N


def test_hll_sketch_within_error_bound(queries, spark):
    approx = {
        r["date"]: r["approx_users"]
        for r in queries["sk_daily_clickers_hll"](spark, SF_DIR).collect()
    }
    exact: dict = {}
    for r in queries["a1_daily_distinct_clickers"](spark, SF_DIR).collect():
        exact[r["date"]] = exact.get(r["date"], 0) + 1
    assert set(approx) == set(exact)
    for d, ex in exact.items():
        # pinned-register HLL, m=1024: ~3.25% rsd in the raw-estimator
        # regime, much tighter under linear counting (n < 2.5m, which
        # covers the fixture days) — allow ~4 sigma of the worst case
        assert abs(approx[d] - ex) <= max(2, 0.13 * ex)


def test_quantile_sketch_brackets_exact(queries, spark):
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.sources import events_raw, load_raw

    # GK form is an unregistered diagnostic since round 10 (certified
    # form: the pinned-bin histogram sk_value_quantiles) — import it
    from recommedation_system_under_flink_spark.operators.sketches import (
        sk_value_quantiles_gk,
    )

    got = {
        r["event_type"]: r["quantiles"]
        for r in sk_value_quantiles_gk(spark, SF_DIR).collect()
    }
    # the sketch's contract is bounded RANK error (it returns real data
    # points, not interpolations): each approx quantile must lie between
    # the exact quantiles at p ± 0.02
    ps = [0.5, 0.95, 0.99]
    lo_expr = ", ".join(str(max(0.0, p - 0.02)) for p in ps)
    hi_expr = ", ".join(str(min(1.0, p + 0.02)) for p in ps)
    ev = events_raw(spark, SF_DIR)
    brackets = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(f"percentile(value, array({lo_expr}))").alias("lo"),
            F.expr(f"percentile(value, array({hi_expr}))").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(brackets)
    for et, (lows, highs) in brackets.items():
        for a, lo, hi in zip(got[et], lows, highs):
            assert lo - 1e-9 <= a <= hi + 1e-9


def test_asof_core_matches_naive_on_random_logs(spark):
    """Seeded-random event logs with adversarial shapes (duplicate
    timestamps, clickless users, click-at-purchase-instant ties) —
    the carry-forward as-of must equal the naive quadratic scan."""
    import random

    from recommedation_system_under_flink_spark.operators.events_flow import (
        asof_last_prior,
    )

    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(40):
        n = rng.randint(0, 12)
        for _ in range(n):
            # coarse timestamps on purpose: plenty of exact ties
            tsm = rng.randint(0, 20)
            side = rng.randint(0, 1)
            rows.append((user, eid, tsm, side))
            eid += 1
    tagged = spark.createDataFrame(
        rows, "user_id long, event_id long, tsm long, side int"
    )
    got = {
        (r["user_id"], r["purchase_id"]): (r["click_id"], r["gap_us"])
        for r in asof_last_prior(tagged).collect()
    }
    expected = {}
    for user, eid_, tsm, side in rows:
        if side != 1:
            continue
        prior = [
            (c_tsm, c_eid)
            for (u, c_eid, c_tsm, s) in rows
            if u == user and s == 0 and c_tsm <= tsm
        ]
        if prior:
            best = max(prior)
            expected[(user, eid_)] = (best[1], tsm - best[0])
        else:
            expected[(user, eid_)] = (None, None)
    assert got == expected


def test_empty_input_robustness(queries, spark):
    """Empty inputs are normal at scale (quiet days, fresh deploys) —
    operators must return empty relations, not throw. Regression set:
    the three historical offenders plus one per operator family; the
    full 77-query sweep lives in scripts/empty_sweep.py."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from empty_sweep import make_empty_fixture

    dst = make_empty_fixture(SF_DIR)
    # historical offender now outside the registry (round-10 demotion;
    # certified form sim_ivf_topk_pinned): keep the empty-input check
    # via direct import
    from recommedation_system_under_flink_spark.operators.similarity import (
        sim_ivf_topk,
    )

    assert sim_ivf_topk(spark, dst).count() == 0
    for name in (
        "als_recommendations",           # historical: ALS on no ratings
        "s7_partitioned_write_pruned_read",  # historical: no partition dirs
        "hot_topics_pipeline",
        "tfidf_pipeline",
        "j3_scored_join",
        "dedup_minhash_lsh",
        "sim_neardup_components",
        "ef_asof_purchase_click",
        "ef_sessionize",
        "llm_curation_fused",
        "samp_stratified",
        "ts_lang_id",
    ):
        assert queries[name](spark, dst).count() == 0, name


def test_sessionize_core_matches_naive_on_random_logs(spark):
    """Seeded-random logs with tie timestamps and tiny gaps — the
    window-cumsum sessionizer must equal a naive per-user scan."""
    import random

    from recommedation_system_under_flink_spark.operators.events_flow import (
        sessionize_events,
    )

    rng = random.Random(7)
    gap = 5  # tiny gap threshold in fake micros
    rows = []
    eid = 0
    for user in range(30):
        for _ in range(rng.randint(1, 15)):
            rows.append((user, eid, rng.randint(0, 60), float(rng.randint(0, 9))))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, tsm long, value double"
    )
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"], r["session_start"], r["session_end"], r["total_value"]
        )
        for r in sessionize_events(ev, gap_us=gap).collect()
    }
    expected = {}
    by_user: dict[int, list] = {}
    for u, e, t, v in rows:
        by_user.setdefault(u, []).append((t, e, v))
    for u, evs in by_user.items():
        evs.sort()
        seq, cur = 0, []
        for t, e, v in evs:
            if not cur or t - cur[-1][0] > gap:
                if cur:
                    expected[(u, seq)] = (
                        len(cur), cur[0][0], cur[-1][0],
                        round(sum(x[2] for x in cur), 6),
                    )
                seq += 1
                cur = []
            cur.append((t, e, v))
        expected[(u, seq)] = (
            len(cur), cur[0][0], cur[-1][0], round(sum(x[2] for x in cur), 6)
        )
    assert got == expected


def test_range_join_plan_is_equi_join(queries, spark):
    """The banded rewrite must execute as a plain equi-join on band —
    no BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    df = queries["ef_range_join_banded"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_matches_naive(queries, spark):
    """Banded result == naive theta-join result on the fixture."""
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.operators.events_flow import (
        RANGE_WINDOW_US,
    )
    from recommedation_system_under_flink_spark.sources import events_raw, load_raw

    ev = events_raw(spark, SF_DIR)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.expr("ts DIV 1000").alias("ptsm")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.expr("ts DIV 1000").alias("etsm")
    )
    naive = p.join(
        e,
        (F.col("etsm") >= F.col("ptsm"))
        & (F.col("etsm") < F.col("ptsm") + RANGE_WINDOW_US),
    )
    got = {
        (r["purchase_id"], r["error_id"])
        for r in queries["ef_range_join_banded"](spark, SF_DIR).collect()
    }
    want = {(r["purchase_id"], r["error_id"]) for r in naive.collect()}
    assert got == want


def test_pagerank_is_a_distribution(queries, spark):
    """Ranks are positive and sum to ~1 (symmetric graph, no dangling
    mass); news nodes are odd, user nodes even."""
    rows = queries["graph_pagerank_clicks"](spark, SF_DIR).collect()
    assert rows
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-9
    assert all(r["rank"] > 0 for r in rows)
    assert {r["node"] % 2 for r in rows} == {0, 1}


def test_heavy_hitters_exact_and_mg_superset(queries, spark):
    """sk_heavy_hitters_exact must equal the plain full-groupBy answer
    (the sketch only accelerates candidate generation — the output is
    exact), which also proves the Misra-Gries union was a superset of
    the true heavy hitters."""
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.operators.sketches import HH_K
    from recommedation_system_under_flink_spark.sources import clicks

    got = {
        (r["news_id"], r["n_clicks"])
        for r in queries["sk_heavy_hitters_exact"](spark, SF_DIR).collect()
    }
    cl = clicks(spark, SF_DIR).select("news_id")
    total = cl.count()
    want = {
        (r["news_id"], r["n"])
        for r in cl.groupBy("news_id")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") > total / HH_K)
        .collect()
    }
    assert got == want
    assert got  # non-degenerate on the fixture


def test_monthly_hll_rollup_error_bound(queries, spark):
    """The daily-register → monthly-MAX-merge estimate must land
    within ~4 sigma of the exact monthly distinct clicker count
    (pinned-register HLL, m=1024 ⇒ ~3.25% rsd raw, tighter in the
    linear-counting regime), and cover every month the log spans."""
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.sources import clicks

    approx = {
        r["month"]: r["approx_users"]
        for r in queries["sk_monthly_from_daily_hll"](spark, SF_DIR).collect()
    }
    exact = {
        r["month"]: r["n"]
        for r in clicks(spark, SF_DIR)
        .groupBy(F.date_format("date", "yyyy-MM").alias("month"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for m, ex in exact.items():
        # same ~4-sigma-of-3.25%-rsd bound as the daily test
        assert abs(approx[m] - ex) <= max(2, 0.13 * ex)


def test_psi_terms_positive_and_bounded(queries, spark):
    """Every PSI term is non-negative ((p-q)·ln(p/q) ≥ 0 always),
    the bins partition both windows (counts sum to the window sizes),
    and the total PSI is finite."""
    import math

    from recommedation_system_under_flink_spark.operators.events_props import (
        PSI_SPLIT,
    )
    import datetime as dt

    from recommedation_system_under_flink_spark.sources import events_raw

    rows = queries["ev_value_psi"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r["psi_term"] >= 0 for r in rows)
    total = sum(r["psi_term"] for r in rows)
    assert math.isfinite(total)
    split = dt.date.fromisoformat(PSI_SPLIT)
    n_ref = events_raw(spark, SF_DIR, date_to=split - dt.timedelta(days=1)).count()
    n_cur = events_raw(spark, SF_DIR, date_from=split).count()
    assert sum(r["ref_n"] for r in rows) == n_ref
    assert sum(r["cur_n"] for r in rows) == n_cur


def test_position_attribution_conserves_value(spark):
    """Attributed revenue across all news must equal (to weight-
    quantization tolerance) the summed value of purchases that had at
    least one lookback touch; and per-purchase weights sum to ~1."""
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark import registry
    from recommedation_system_under_flink_spark.operators.events_flow import (
        MTA_LOOKBACK_US,
    )
    from recommedation_system_under_flink_spark.sources import events_raw

    from conftest import SF_DIR

    rows = registry.queries()["ef_attribution_position_based"](
        spark, SF_DIR
    ).collect()
    attributed = sum(r["attributed_value"] for r in rows)

    ev = events_raw(spark, SF_DIR)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.expr("ts DIV 1000").alias("ptsm"),
        "value",
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.expr("ts DIV 1000").alias("ctsm")
    )
    touched = (
        p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("ctsm") <= F.col("ptsm"))
            & (F.col("ctsm") > F.col("ptsm") - MTA_LOOKBACK_US),
            "left_semi",
        )
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    # weight quantization (6 dp × up to n touches) bounds the gap
    assert abs(attributed - touched) < 1e-2, (attributed, touched)


def test_kaplan_meier_curve_properties(spark):
    """KM invariants: survival starts ≤ 1, is non-increasing, stays in
    [0, 1]; at-risk counts are non-increasing in t; and the first
    step equals 1 − d₁/n₁ exactly."""
    from recommedation_system_under_flink_spark import registry

    from conftest import SF_DIR

    rows = sorted(
        registry.queries()["ef_kaplan_meier"](spark, SF_DIR).collect(),
        key=lambda r: r["t_day"],
    )
    assert rows
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    nr = [r["n_risk"] for r in rows]
    assert all(a >= b for a, b in zip(nr, nr[1:]))
    first = rows[0]
    assert abs(
        first["survival"] - (1 - first["d_events"] / first["n_risk"])
    ) <= 1e-6
