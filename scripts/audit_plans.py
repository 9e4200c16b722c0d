"""Plan-shape audit: sweep every registered query's executed plan for
scale red flags.

For each ``__spark_entry__.queries()`` entry (batch only — streaming
entries execute on build, so they are skipped), prints one line:

    name  scans=N exchanges=N cartesian=Y/N rowudf=Y/N pushdown=ok/miss

- **scans**: number of parquet file scans — re-executed subtrees show
  up as surplus scans (Catalyst has no cross-subtree CSE).
- **exchanges**: shuffle count.
- **cartesian**: a CartesianProduct/BroadcastNestedLoopJoin node exists
  somewhere it probably shouldn't (the J3-naive twin is the known,
  intentional one).
- **rowudf**: a row-at-a-time BatchEvalPython node (non-Arrow UDF) —
  always a bug in this codebase; Arrow paths show ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas instead.
- **pushdown**: for plans scanning ``events``, whether the scan carries
  a non-empty PushedFilters list (the list is often truncated with
  ``...`` in the plan string — only a literal ``[]`` is a miss). Only
  flagged when the plan ALSO has a post-scan Filter on scan columns,
  i.e. a predicate existed and didn't push.

Caveat: counts are over the *plan string*, which prints the full
lineage beneath InMemoryTableScan nodes — iterative operators that
persist per round (``sim_neardup_components``) show the whole loop's
scans even though cached partitions short-circuit execution.

Usage: ``python scripts/audit_plans.py [sf_dir] [name ...]``
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Queries where a CartesianProduct / BroadcastNestedLoopJoin is the
#: intended plan, with why. Anything NOT listed here gets flagged.
EXPECTED_CARTESIAN = {
    # 1-row corpus-size scalar broadcast into tf·log(N/df) — O(rows)
    "a5_news_tfidf": "1-row N scalar broadcast (BNLJ over literal)",
    "a7_user_keywords": "inherits a5's 1-row scalar broadcast",
    "a8_news_keywords_topk": "inherits a5's 1-row scalar broadcast",
    "tfidf_pipeline": "inherits a5's 1-row scalar broadcast",
    "tfidf_recommend_all_days": "inherits a5's 1-row scalar broadcast",
    "j1_user_docs_semijoin": "inherits a5's 1-row scalar broadcast",
    "j3_scored_join": "inherits a5's 1-row scalar broadcast",
    "j3_scored_join_dot": "inherits a5's 1-row scalar broadcast",
    "tfidf_pipeline_dot": "inherits a5's 1-row scalar broadcast",
    "hybrid_rrf_recommend": "inherits a5's 1-row scalar broadcast (via j3)",
    "j7_extractor_agreement": "inherits a5's 1-row scalar broadcast (via a8)",
    "ts_unigram_logprob": "1-row corpus-total scalar broadcast",
    "ts_bigram_lm_perplexity": "1-row corpus-total scalar broadcast",
    "ts_kneser_ney_logprob": "1-row bigram-type-total scalar broadcast",
    "ml_nb_langid": "5-row lang-stats + 1-row vocab/n-train scalar broadcasts",
    "ml_lr_sweep": "3-row swept-weights table broadcast into the scoring pass",
    "s27_skipping_stats_report": "1-row n_files scalar broadcast into the hash-layout arm",
    "ev_harmonic_regression": "1-row Cramer-solved beta broadcast into the R2 scoring pass",
    "ml_als_two_sweeps": "1-row factor-norm scalars crossed into each objective row",
    "ml_woe_iv": "1-row smoothed pos/neg totals broadcast into the bin grid",
    "ml_target_encoding": "1-row global-prior scalar broadcast into the LOO rows",
    "rel_basket_pairs": "1-row order-count scalar broadcast into the lift",
    "cf_novelty_report": "1-row user-total scalar broadcast into the novelty bits",
    "llm_curation_mix_fused": "1-row budget/total scalar broadcast into the per-source mix",
    "ml_ridge_regression": "1-row Cramer-solved beta broadcast into the R2 scoring pass",
    "ml_cv_ridge_path": "1-row global-moment and 3-row lambda-spine broadcasts into the 5-row fold relation",
    "ml_confusion_threshold_sweep": "11-row threshold spine broadcast into the one-pass sweep",
    "ml_decision_stump": "1-row class-totals scalar broadcast into the split scan",
    "ml_histogram_split": "1-row class-totals scalar broadcast into the binned split scan",
    "ml_boosted_stumps": "1-row fitted-stump and MSE scalars broadcast per boosting stage",
    "ml_learning_curve": "3-row per-fraction weight table broadcast into the scoring pass",
    "ml_average_precision": "1-row positive-total scalar broadcast into the PR sweep",
    "samp_balanced_downsample": "1-row minority-size scalar broadcast into the per-class rank filter",
    "ml_linear_attribution": "1-row feature-means scalar broadcast into the attribution projection",
    "ml_roc_auc": "1-row class-totals + AUC scalar and 11-row threshold spine broadcasts",
    "ml_brier_decomposition": "two 1-row overall/brier aggregates cross-joined",
    "ts_term_drift": "1-row old/new totals scalar broadcast",
    "j6_rec_coverage": "three 1-row diagnostic aggregates cross-joined",
    "j3_scored_join_salted": "inherits a5's 1-row scalar broadcast",
    "j3_scored_join_naive": "the intentional reference-shaped cross",
    # bounded pairwise demos over _N_DOCS=20 keyword maps
    "f5_calculate_x_sql": "20-doc pairwise kernel demo (id< range join)",
    "f6_fuzzy_overlap_sql": "20-doc pairwise kernel demo",
    "f7_boolean_overlap_sql": "20-doc pairwise kernel demo",
    "f8_dot_product_sql": "20-doc pairwise kernel demo",
    "f9_rank_distance_sql": "20-doc pairwise kernel demo",
    "f10_positive_correlation_sql": "20-doc pairwise kernel demo",
    # tiny-dimension spines / scalar totals crossed by design
    "ev_daily_spine_fill": "date-spine × event-type dim (30×|types| rows)",
    "t4_rbo_recommender_agreement": "date-spine × 10-depth dim + K-fanout prefix (bounded)",
    "ev_key_skew_report": "1-row global-total scalar broadcast",
    "rel_q11_important_stock": "1-row (total, count) scalar broadcast (Q15 pattern)",
    "ev_value_psi": "1-row decile-edges scalar broadcast",
    "ev_growth_accounting": "1-row MAX(day) scalar broadcast bounding last-day churn",
    "graph_modularity_report": "1-row directed-edge-total scalar broadcast",
    "t6_decayed_popularity": "1-row MAX(date) horizon scalar broadcast",
    "sk_bloom_prefilter": "1-row (n_build, n_bits_set, report) scalar combines",
    "als_rank1_topk": (
        "items-bounded (NEWS_MOD<=1000) factor table broadcast crossed into"
        " per-user scoring — the standard serving fan-out; docstring"
        " documents the ANN cut at scale"
    ),
    # round-5 experiment stats: 1-row per-cohort aggregates combined
    "ef_welch_ttest": "two 1-row cohort-moment sides crossed into one stat row",
    "ef_conversion_lag_percentiles": "1-row total-count scalar broadcast over the bounded gap-seconds grid",
    "samp_token_budget_waterfill": "1-row budget and 1-row lambda scalar broadcasts over the O(|sources|) grid",
    "ev_ewma_forecast": "|days|xW banded self-join on the pre-aggregated daily series + 1-row y0/last/mae scalar crosses",
    "ev_seasonal_decomposition": "1-row variance-decomposition scalar broadcast over the 7-row seasonal grid",
    "samp_neyman_allocation": "1-row budget/denominator scalar broadcast over the O(|sources|) grid",
    "samp_dsir_ess_truncation": "DSIR's own 1-row LM-total broadcasts + a 1-row percentile-cut scalar cross",
    "ef_interarrival_profile": "1-row moment x 1-row percentile scalar cross over the bounded gap-seconds grid",
    "ts_entropy_rate": "1-row total broadcasts into each entropy sum + a 1-row x 1-row final cross",
    "llm_corpus_planning_report": "inherits the waterfill/Neyman legs' 1-row budget broadcasts; join grid is O(|sources|)",
    "ev_forecast_backtest": "shared |days|xW EWMA banded kernel + 1-row y0 scalar cross over the daily series",
    "ts_source_js_divergence": "1-row corpus-total broadcast + the deliberate |sources|x|vocab| JSD grid (q-term needs full vocab per source)",
    "prof_partition_balance": "1-row stats x 1-row median scalar cross over the O(|days|) partition grid",
    "ts_heaps_law_fit": "6-row checkpoint grid crosses (max-id, OLS-fit 1-row); banded prefix joins are checkpoint-bounded",
    "sim_knn_label_agreement": "broadcast probe-set x corpus scan, the sim_bruteforce_topk pattern (IVF swap at scale)",
    "a15_retention_halflife": "1-row max-day + day1-rate + OLS-fit scalar crosses over the O(|offsets|) curve",
    "cf_association_rules": "1-row distinct-user-count scalar broadcast into the rule ratios",
    "ef_cuped_adjustment": "1-row midpoint + theta + two 1-row cohort sides",
    "ev_trimmed_mean": "1-row (n, k) totals broadcast + the prefix-sum bucket-offset triangular join (O(range/8) cent buckets)",
    "ev_ks_drift": "prefix-sum bucket-offset triangular join (O(range/8) value buckets)",
    "ef_mannwhitney_u": "prefix-sum bucket-offset triangular join (O(range/64) per-user-total buckets)",
    "sim_kmeans_lloyd": "K=8-row centroid set broadcast per Lloyd round",
    "ev_theil_sen": "1-row medians/counters combined over the bounded daily series",
    "ef_markov_attribution": "1-row absorption scalars per chain variant crossed into channel rows",
    "ev_autocorrelation": "7-row lag spine crossed with the bounded daily deviations",
    "rel_entity_blocking": "4-row blocking-pass spine broadcast into per-name keys",
    "s24_malformed_csv_ingest": "two 1-row ingest-mode aggregates scalar-combined",
    "samp_lang_mixture": "1-row corpus-total scalar broadcast into rates",
    "samp_dsir_weights": "1-row LM-totals scalar broadcast into per-token weights",
    "samp_dsir_auc": "inherits samp_dsir_weights' 1-row totals broadcast",
    "prof_l_diversity_t_closeness": "|types|-row global distribution crossed into QI groups (TVD needs absent cells)",
    "ts_bm25_search": "1-row corpus stats (N, avg_len) scalar broadcast",
    "ts_quality_threshold_calibration": "3-row threshold table broadcast back over scores",
    "prof_chi2_lang_source": "margins grid bounded by |langs|x|sources| (absent cells need the cross)",
    "ev_ks_drift": "1-row sample-size scalar broadcast into the ECDF ratios",
    "ef_kaplan_meier": "at-risk theta join vs the ~tens-of-rows event-day table (broadcast)",
    "ts_pmi_top_pairs": "1-row corpus-N scalar broadcast into the PMI ratios",
    "sk_count_min_accuracy": "D×W-row sketch broadcast with OR-of-rows probe condition (BNLJ)",
    "samp_srm_check": "1-row split-total scalar broadcast into expected counts",
    "sim_ivf_cell_balance": "1-row corpus-total scalar broadcast into share/skew",
    "sim_silhouette_simplified": "K-row centroid table broadcast vs corpus (O(n·K) distances)",
    "ef_conversion_ztest": "two 1-row cohort aggregates crossed for the z arithmetic",
    "samp_temperature_mixture": "1-row totals/λ scalar broadcasts into rates",
    "rel_q22_inactive_rich_customers": "1-row global-avg scalar broadcast",
    # brute-force baselines: query set / block pairs broadcast by design
    "sim_bruteforce_topk": "broadcast query set vs corpus (baseline)",
    "sim_mmr_rerank": "broadcast query set vs corpus (pool generation)",
    "sim_sq8_topk": "broadcast query set vs int8 corpus (same shape)",
    "sim_mrl_prefix_rerank": "broadcast query set vs prefix corpus (stage 1)",
    "sim_hard_negatives": "broadcast query set vs corpus (bruteforce shape)",
    "sim_neardup_pairs_exact": "block-pair id<= range join (blocked GEMM)",
    "sim_neardup_components": "inherits the blocked-GEMM edge builder",
    "sim_threshold_sweep_report": "inherits the blocked-GEMM pair scorer",
    "sim_ann_recall_report": "inherits sim_bruteforce_topk's broadcast query set",
    "sim_nprobe_recall_curve": "inherits sim_bruteforce_topk's broadcast query set",
    "als_recommendations": "user×item factor cross for top-k (bounded dims)",
}

#: Queries whose plan intentionally contains a Python eval node — the
#: documented slow-path twins that exist to exercise/verify a Python
#: API surface against the same oracle as their Catalyst form.
EXPECTED_ROWUDF = {
    "ts_chunk_documents_udtf": "UDTF twin of ts_chunk_documents (LATERAL surface demo)",
}

#: Queries where a GLOBAL window (WindowExec with an empty partition
#: spec — "Moving all data to a single partition") is the intended
#: plan BECAUSE the relation under it is bounded by construction:
#: O(days), O(bins), O(groups), O(K) or 1-row aggregates — never an
#: O(corpus) relation. Anything NOT listed here gets flagged (the
#: round-10 pinned invariant; the reviewed reason states the bound).
EXPECTED_GLOBAL_WINDOW: dict[str, str] = {
    # -- O(K) relations: global top-K routed through ranking.global_top_k
    #    (TakeOrderedAndProject pre-limit; the window ranks K survivors)
    "hot_topics_pipeline": "rank window on the K=10 TakeOrdered survivors",
    "s6_parquet_roundtrip": "inherits hot_topics_pipeline",
    "t6_decayed_popularity": "rank window on the N=20 TakeOrdered survivors",
    "ev_key_skew_report": "rank window on the top-N TakeOrdered survivors",
    # -- O(days) / O(days²) daily-series relations (spine ≤ fixture month;
    #    at any SF the series is one row per day)
    "a9_trailing_avg_daily_clicks": "trailing window over the O(days) daily series",
    "ev_daily_trend_ols": "OLS rank/cumsum over the O(days) series",
    "ev_ewma_forecast": "recursive EWMA unroll over the O(days) series",
    "ev_forecast_backtest": "lag/backtest windows over the O(days) series",
    "ev_autocorrelation": "lag windows over the O(days) series",
    "ev_harmonic_regression": "index window over the O(days) series",
    "ev_seasonal_decomposition": "centered MA over the O(days) series",
    "ev_theil_sen": "median-of-slopes over the O(days²) pair relation",
    # -- bounded grids / bins / spines / scalar combines
    "ev_value_psi": "decile-edge extraction over ≤10 quantile rows",
    "ev_revenue_concentration": "Gini cumulative over per-user revenue aggregate (entity-level; the exact Gini is a total order by definition — documented swap at ≥1e9 users: binned Lorenz)",
    "ef_conversion_lag_percentiles": "nearest-rank over the bounded gap-seconds grid",
    "ef_interarrival_profile": "percentiles over the bounded gap-seconds grid",
    "ef_uplift_by_decile": "NTILE over per-user score aggregate (entity-level; deciles are a global rank by definition — documented swap at ≥1e9 users: approx decile cuts)",
    # (ef_mannwhitney_u / ev_ks_drift / ev_trimmed_mean were removed
    # round 12: rewritten onto the two-phase prefix sum in
    # operators/prefix.py — no global window remains in their plans.
    # ev_ks_drift's old entry was also factually stale: it windowed
    # over RAW sample rows, not the distinct-value relation.)
    "prof_benford_totalprice": "9 first-digit rows",
    "prof_partition_balance": "per-day partition counts (O(days) rows)",
    "j6_rec_coverage": "three 1-row diagnostic aggregates",
    "samp_token_budget_waterfill": "waterfill over the O(|sources|) grid",
    "llm_corpus_planning_report": "per-source windows over O(|sources|) rows",
    "sim_threshold_sweep_report": "cumulative over the 20-bin cosine histogram",
    "ml_kfold_eval": "cross-fold mean/SD over the K=5 fold rows",
    # -- DISTINCT-score relations of pinned scorers over gridded features
    #    (bounded by the feature grid, not the row count)
    "ml_roc_auc": "rank-sum AUC over DISTINCT scores (aggregation-first)",
    "ml_average_precision": "PR cumulative over DISTINCT scores",
    "samp_dsir_auc": "rank-sum AUC over DISTINCT DSIR scores",
    "samp_dsir_ess_truncation": "weight-quantile windows over DISTINCT scores",
    "ml_decision_stump": "cumulative split scan over DISTINCT feature values",
    "ml_histogram_split": "cumulative over 64 fixed bins",
    "ml_boosted_stumps": "per-stage cumulative over DISTINCT feature values",
    # -- vocabulary-bounded relations (O(|vocab|) — sublinear in corpus,
    #    the standard tokenizer/LM artifact shapes)
    "ts_vocab_build": "frequency-rank ids over the O(|vocab|) term table",
    "ts_ngram_counts": "frequency-rank ids over the min-count n-gram table",
    "ts_zipf_fit": "log-log rank over the O(|vocab|) term table",
    "ts_pmi_top_pairs": "quantized top-K over the min-support pair table",
    "ts_bm25_search": "rank over per-query scored docs (bounded by posting intersection)",
    "ts_term_drift": "rank over the O(|vocab|) drift table",
    # -- entity-level sampling frames where the sequential walk IS the
    #    algorithm (Madow systematic sampling needs the cumulative line)
    "samp_pps_systematic": "cumulative token line over the per-doc aggregate (entity-level; systematic PPS is sequential by definition — documented swap at ≥1e9 docs: stratified per-shard walks)",
}


def _count_global_windows(node) -> int:
    """Walk the physical-plan tree (through the AQE wrapper) and count
    Window-family nodes whose partitionSpec is empty."""
    n = 0
    stack = [node]
    seen = 0
    while stack and seen < 10_000:  # defensive bound
        nd = stack.pop()
        seen += 1
        cls = nd.getClass().getSimpleName()
        if cls in ("WindowExec", "WindowGroupLimitExec", "WindowInPandasExec"):
            try:
                if nd.partitionSpec().isEmpty():
                    n += 1
            except Exception:
                pass
        if cls == "AdaptiveSparkPlanExec":
            try:
                stack.append(nd.inputPlan())
            except Exception:
                pass
        try:
            ch = nd.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        except Exception:
            pass
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from recommedation_system_under_flink_spark.session import get_spark

    spark = get_spark(app_name="audit")
    qs = entrymod.queries()

    flagged = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        if name.startswith("stream_"):
            continue  # executes on build; plan is the settled memory table
        try:
            executed = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan()
            plan = executed.toString()
            n_gwin = _count_global_windows(executed)
        except Exception as exc:  # pragma: no cover - audit tool
            print(f"{name:36s} ERROR {type(exc).__name__}: {exc}")
            flagged += 1
            continue
        scans = len(re.findall(r"Scan parquet", plan))
        exchanges = len(re.findall(r"Exchange", plan))
        cartesian = bool(re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan))
        rowudf = "BatchEvalPython" in plan
        pushdown = "n/a"
        if re.search(r"events\.parquet", plan):
            # the plan string truncates long filter lists with "..." —
            # only a literal empty list means nothing pushed
            empty = re.findall(r"PushedFilters: \[\s*\]", plan)
            any_pushed = len(re.findall(r"PushedFilters: \[\s*[A-Za-z]", plan)) > 0
            if any_pushed:
                pushdown = "ok"
            elif empty and re.search(r"Filter .*(ts#|event_type#)", plan):
                pushdown = "MISS"  # a predicate existed and didn't push
            else:
                pushdown = "none"  # full scan with nothing to push
        flags = []
        if cartesian and name not in EXPECTED_CARTESIAN:
            flags.append("CARTESIAN")
        if rowudf and name not in EXPECTED_ROWUDF:
            flags.append("ROW-UDF")
        if pushdown == "MISS":
            flags.append("NO-PUSHDOWN")
        if n_gwin and name not in EXPECTED_GLOBAL_WINDOW:
            flags.append(f"GLOBAL-WINDOW({n_gwin})")
        if flags:
            flagged += 1
        print(
            f"{name:36s} scans={scans:2d} exchanges={exchanges:2d} "
            f"cartesian={'Y' if cartesian else 'n'} rowudf={'Y' if rowudf else 'n'} "
            f"pushdown={pushdown:4s} {' '.join('!' + f for f in flags)}"
        )
    print(f"\n{flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
