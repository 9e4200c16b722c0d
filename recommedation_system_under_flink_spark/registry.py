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
#: ROUND-4 ROTATION (VERDICT r3 item 1): round 3 certified every §2
#: operator row (CORRECTNESS_r03: 50/50 hash-green), so this round the
#: window keeps only the four pipelines + ONE sentinel per §2 letter
#: family and spends the other 40 slots on oracle-backed queries that
#: have NEVER had a driver CORRECTNESS row. Every §2 row certified in
#: r3 stays covered by its green r3 row; the sentinels guard against
#: regressions in the shared scan/kernel paths.
VERIFIED_WINDOW = (
    # end-to-end pipelines (SURVEY §3) + the all-days amortized form
    "hot_topics_pipeline",
    "tfidf_pipeline",
    "textrank_pipeline_distributed",
    "tfidf_recommend_all_days",
    # §2 sentinels, one per letter family (rest certified in r3)
    "s1_csv_roundtrip",
    "p1_news_keywords_distributed",
    "j3_scored_join",
    "a3_user_keywords_distributed",
    "t1_user_topk",
    "f5_calculate_x_sql",
    # --- never-driver-verified rotation (40) ---
    # dedup family breadth (r3 certified only minhash_lsh)
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_neardup_canonical",
    # similarity / embedding curation
    "sim_dbscan",
    "sim_pq_topk_pinned",
    "sim_semdedup",
    "sim_mmr_rerank",
    "sim_kcenter_coreset",
    "sim_hard_negatives",
    # sketches
    "sk_count_min_accuracy",
    "sk_heavy_hitters_exact",
    # text stats / quality
    "ts_bm25_search",
    "ts_bpe_token_estimate",
    "ts_quality_score",
    "ts_lang_id",
    "ts_pii_scrub",
    # profiling / privacy
    "prof_l_diversity_t_closeness",
    "prof_k_anonymity",
    # sampling / mixtures
    "samp_dsir_weights",
    "samp_stratified",
    # graph
    "graph_hits_clicks",
    "graph_triangle_stats",
    # TPC-H rotation (r3 certified q1/q5)
    "rel_q9_product_profit",
    "rel_q13_customer_distribution",
    "rel_q16_supplier_part_counts",
    "rel_q20_dominant_suppliers",
    "rel_q21_waiting_suppliers",
    # ranking eval
    "t5_policy_replay_eval",
    # event properties / stats
    "ev_daily_trend_ols",
    "ev_user_rfm_scalable",
    "ev_value_psi",
    # event flow / experiment stats
    "ef_kaplan_meier",
    "ef_logrank_test",
    "ef_conversion_ztest",
    # sources & connectors
    "s23_xml_roundtrip",
    "s21_python_datasource",
    # CF / curation / streaming flagships not yet certified
    "cf_user_recommendations",
    "llm_curation_pipeline",
    "stream_sessionize",
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
