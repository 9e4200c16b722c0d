"""Query registry: the driver-facing catalogue of implemented operators.

Every operator from SURVEY.md §2 that is implemented registers here as a
``(name, spark_builder, duckdb_oracle_sql)`` triple. ``__spark_entry__``
exports the registry as ``queries()`` / ``oracle_sql()``; the driver
runs both sides at sf0.01 and hash-compares. Operators whose semantics
are not SQL-expressible (UDF keyword extraction, streaming) register
with ``oracle=None`` → driver records the weaker rows-only check, and
pytest covers them with ground-truth fixtures instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Entry:
    name: str
    fn: QueryFn
    oracle: str | None


_REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Entry(name, fn, oracle)
        return fn

    return deco


#: The driver hash-verifies only the FIRST 50 entries of ``queries()``
#: (insertion order) — round-2 finding: CORRECTNESS_r02's 50 rows were
#: exactly registration order, slots 1-50, leaving every pipeline
#: unverified. This list pins slots 1-50 to the queries that matter:
#: the four end-to-end pipelines, one query per SURVEY §2 operator row,
#: and one per LLM-pipeline family. Every name here MUST have a full
#: DuckDB oracle (enforced by tests/test_registry_window.py).
#: ROUND-9 ROTATION (6th tranche): rounds 2-8 cumulatively certified
#: 242/364 oracle-backed queries (CORRECTNESS_r02…r08). This round
#: keeps the same 6 regression canaries (four pipelines + the CSV
#: source sentinel + the flagship scored join), RETRIES the two r8
#: driver hash fails now rebuilt on rule-free integer/FLOOR hash paths
#: (sim_embedding_covariance, graph_modularity_report), and spends the
#: other 42 slots on the SIXTH tranche of never-driver-certified
#: queries — the three largest remaining blocks, taken whole: all 16
#: ts_* text-analysis, all 13 ef_* event-flow, and all 13 ev_*
#: event-properties queries. Cumulative target: ≥284/364 oracle-backed
#: queries driver-certified by end of round 9.
VERIFIED_WINDOW = (
    # regression canaries: end-to-end pipelines (SURVEY §3) + sentinels
    "hot_topics_pipeline",
    "tfidf_pipeline",
    "textrank_pipeline_distributed",
    "tfidf_recommend_all_days",
    "s1_csv_roundtrip",
    "j3_scored_join",
    # r8 driver-red retries (hash paths rebuilt: integer sums + FLOOR)
    "sim_embedding_covariance",
    "graph_modularity_report",
    # --- never-driver-verified rotation (42), round 9 ---
    # text-analysis block (all 16 never-certified)
    "ts_fingerprint",
    "ts_top_terms_per_lang",
    "ts_langid_confusion",
    "ts_langid_accuracy",
    "ts_term_drift",
    "ts_repetition_score",
    "ts_boilerplate_shingles",
    "ts_tokenizer_fertility",
    "ts_chunk_documents_udtf",
    "ts_phrase_search",
    "ts_quality_threshold_calibration",
    "ts_vocab_coverage_curve",
    "ts_length_outliers",
    "ts_entropy_rate",
    "ts_source_js_divergence",
    "ts_heaps_law_fit",
    # event-flow block (all 13 never-certified)
    "ef_session_funnel",
    "ef_attribution_report",
    "ef_attribution_position_based",
    "ef_conversion_ztest",
    "ef_welch_ttest",
    "ef_mannwhitney_u",
    "ef_asof_forward",
    "ef_conversion_lag_percentiles",
    "ef_sprt_decision",
    "ef_power_analysis",
    "ef_interarrival_profile",
    "ef_design_effect",
    "ef_session_overlap_join",
    # event-properties block (all 13 never-certified)
    "ev_value_histogram",
    "ev_daily_spine_fill",
    "ev_daily_anomaly",
    "ev_weekday_profile",
    "ev_props_variant",
    "ev_value_psi",
    "ev_daily_trend_ols",
    "ev_mad_anomaly",
    "ev_trimmed_mean",
    "ev_autocorrelation",
    "ev_ewma_forecast",
    "ev_revenue_concentration",
    "ev_forecast_backtest",
)


def _ordered_names() -> list[str]:
    prio = {n: i for i, n in enumerate(VERIFIED_WINDOW)}
    reg_order = {n: i for i, n in enumerate(_REGISTRY)}
    return sorted(
        _REGISTRY, key=lambda n: (prio.get(n, len(prio)), reg_order[n])
    )


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: _REGISTRY[n].fn for n in _ordered_names()}


def oracles() -> dict[str, str]:
    _load_all()
    return {
        n: _REGISTRY[n].oracle
        for n in _ordered_names()
        if _REGISTRY[n].oracle is not None
    }


_LOADED = False


#: Modules that register queries on import. Missing ones are skipped so
#: the registry degrades gracefully while coverage is being built out —
#: a misspelled module name must never take down the whole catalogue.
_QUERY_MODULES = (
    "operators.filters",
    "operators.aggregates",
    "operators.ranking",
    "operators.joins",
    "operators.tfidf",
    "operators.keywords",
    "operators.dedup",
    "operators.events_flow",
    "operators.graph",
    "operators.profiling",
    "operators.events_props",
    "operators.sampling",
    "operators.sketches",
    "operators.similarity",
    "operators.textstats",
    "operators.multimodal",
    "operators.kernels_sql",
    "operators.ml",
    "sources.pysource",
    "operators.relational",
    "operators.cf",
    "plans.pipelines",
    "plans.als",
    "plans.curation",
    "streaming.hot_topics",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import importlib
    import importlib.util

    for mod in _QUERY_MODULES:
        name = f"{__package__}.{mod}"
        # Skip only modules that don't exist yet; a genuine import error
        # inside an existing module must surface, not be swallowed.
        try:
            missing = importlib.util.find_spec(name) is None
        except ModuleNotFoundError:  # parent package absent
            missing = True
        if missing:
            continue
        importlib.import_module(name)
    _LOADED = True
