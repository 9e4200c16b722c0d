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
#: ROUND-6 ROTATION: rounds 3-5 certified every §2 row plus two
#: tranches of never-verified flagships (112 queries cumulatively
#: driver-green across CORRECTNESS_r01/r02/r03/r05). This round keeps
#: 6 regression canaries (four pipelines + the CSV source sentinel +
#: the flagship scored join) and spends the other 44 slots on the
#: THIRD tranche of oracle-backed queries that have never had a driver
#: CORRECTNESS row — clustering/PQ ANN, span-level dedup, survival /
#: A-B test stats, privacy profiling, DSIR sampling, sketch accuracy,
#: XML/erasure/bucketed warehouse shapes, the TPC-H rotation
#: continuation, and association rules. Cumulative target: ≥155/306
#: oracle-backed queries driver-certified by end of round 6.
VERIFIED_WINDOW = (
    # regression canaries: end-to-end pipelines (SURVEY §3) + sentinels
    "hot_topics_pipeline",
    "tfidf_pipeline",
    "textrank_pipeline_distributed",
    "tfidf_recommend_all_days",
    "s1_csv_roundtrip",
    "j3_scored_join",
    # --- never-driver-verified rotation (44), round 6 ---
    # ANN / clustering / embedding diagnostics
    "sim_neardup_pairs_exact",
    "sim_pq_topk_pinned",
    "sim_ivfpq_topk_pinned",
    "sim_semdedup",
    "sim_dbscan",
    "sim_kmeans_lloyd",
    "sim_embedding_drift",
    # span-level / candidate-join dedup
    "dedup_prefix_filter_join",
    "dedup_duplicated_spans",
    "dedup_incremental_lsh",
    "dedup_winnowing",
    # text / LM quality
    "ts_bm25_search",
    "ts_bpe_token_estimate",
    "ts_lang_id",
    "ts_quality_score",
    "ts_kneser_ney_logprob",
    "ts_lexical_diversity",
    # survival / experiment stats over events
    "ef_kaplan_meier",
    "ef_logrank_test",
    "ef_markov_attribution",
    "ef_cuped_adjustment",
    # graph algorithms
    "graph_hits_clicks",
    "graph_triangle_stats",
    "graph_assortativity",
    # privacy / data-quality profiling
    "prof_k_anonymity",
    "prof_l_diversity_t_closeness",
    "prof_numeric_correlation",
    # event-series stats
    "ev_user_rfm_scalable",
    "ev_theil_sen",
    "ev_seasonal_decomposition",
    # sampling / split hygiene
    "samp_dsir_weights",
    "samp_srm_check",
    "samp_neyman_allocation",
    "samp_token_budget_waterfill",
    # sketch accuracy
    "sk_count_min_accuracy",
    "sk_heavy_hitters_exact",
    # warehouse maintenance / source shapes
    "s23_xml_roundtrip",
    "s14_user_erasure",
    "s8_bucketed_join",
    # TPC-H rotation continuation
    "rel_q9_product_profit",
    "rel_q13_customer_distribution",
    "rel_q21_waiting_suppliers",
    # CF / curation flagships
    "cf_association_rules",
    "llm_curation_fused",
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
