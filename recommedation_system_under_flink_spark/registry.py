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
#: ROUND-10 ROTATION (7th tranche): rounds 2-9 cumulatively certified
#: 286/368 oracle-backed queries (CORRECTNESS_r02…r09; r9 was 50/50).
#: This round keeps the same 6 regression canaries (four pipelines +
#: the CSV source sentinel + the flagship scored join) and spends the
#: other 44 slots on the SEVENTH tranche of never-driver-certified
#: queries, prioritizing the blocks with streaming/settled-state
#: oracles per the round-9 verdict: all 8 stream_* structured-
#: streaming queries, all 7 cf_* collaborative-filtering queries, all
#: 11 samp_* sampling/split queries, the 7 remaining dedup_* queries,
#: all 8 prof_* profiling queries, the 2 portable-register HLL
#: sketches, and the a1_daily_clicker_sets straggler. Every member was
#: ROUND-audited onto the rule-free FLOOR quantizer (commit c4667bd)
#: and preflighted green at 3 SFs + perturbed 7-CPU partitioning.
#: Residue after this round: 38 oracle-backed queries (mm_* 4, llm_* 4,
#: s1x storage 15, sim_* 3, ml_* 2, a15-a17 4, t3-t6 4,
#: j7_extractor_agreement, graph_degree_histogram) — queued whole for
#: the r11 rotation, which clears ALL certification debt.
VERIFIED_WINDOW = (
    # regression canaries: end-to-end pipelines (SURVEY §3) + sentinels
    "hot_topics_pipeline",
    "tfidf_pipeline",
    "textrank_pipeline_distributed",
    "tfidf_recommend_all_days",
    "s1_csv_roundtrip",
    "j3_scored_join",
    # --- never-driver-verified rotation (44), round 10 ---
    # structured-streaming block (all 8; settled-state oracles)
    "stream_news_running_totals",
    "stream_hot_topics_trailing",
    "stream_purchase_click_join",
    "stream_topk_to_parquet",
    "stream_enrich_news_join",
    "stream_sessionize",
    "stream_decayed_popularity",
    "stream_pysource_daily_counts",
    # collaborative-filtering block (all 7)
    "cf_user_recommendations",
    "cf_item_neighbors_weighted",
    "cf_user_neighbors",
    "cf_item_lift",
    "cf_path_trigrams",
    "cf_next_item_hitrate",
    "cf_novelty_report",
    # sampling/split block (all 11)
    "samp_stratified",
    "samp_weighted_priority",
    "samp_bpr_triplets",
    "samp_lang_mixture",
    "samp_dsir_auc",
    "samp_split_leakage",
    "samp_curriculum_order",
    "samp_poisson_bootstrap",
    "samp_source_cap_report",
    "samp_dsir_ess_truncation",
    "samp_pps_systematic",
    # dedup remainder (all 7 never-certified)
    "dedup_effective_tokens",
    "dedup_ngram_novelty",
    "dedup_boundary_stitch",
    "dedup_span_scrub",
    "dedup_funnel_report",
    "dedup_cdc_chunks",
    "dedup_line_level",
    # profiling block (all 8)
    "prof_documents_columns",
    "prof_constraint_checks",
    "prof_embedding_norms",
    "prof_null_semantics",
    "prof_chi2_lang_source",
    "prof_candidate_keys",
    "prof_partition_balance",
    "prof_dp_release",
    # portable-register HLL pair (promoted to oracle in r9) + straggler
    "sk_daily_clickers_hll",
    "sk_monthly_from_daily_hll",
    "a1_daily_clicker_sets",
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
