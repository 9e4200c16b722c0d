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
#: ROUND-11 ROTATION (8th tranche): rounds 2-10 cumulatively certified
#: 330/381 oracle-backed queries (CORRECTNESS_r02…r10; r9/r10 were
#: 50/50), leaving 51 never-driver-certified. Per the round-10 verdict
#: (items 1-2) this round drops the two cheapest canaries FOR ONE ROUND
#: — `s1_csv_roundtrip` and `j3_scored_join`, both certified 8+ times,
#: the scored join transitively re-certified via `tfidf_pipeline` /
#: `tfidf_pipeline_dot` which embed the identical scored CTE — keeping
#: 4 pipeline canaries and spending 46 slots on the EIGHTH tranche: the
#: whole 38-query pre-r10 residue (s1x storage 15, mm_* 4, llm_* 4,
#: sim_* 3, ml_* 2, a15-a17 4, t3-t6 4, j7_extractor_agreement,
#: graph_degree_histogram) plus 8 of the 13 round-10 additions. All 46
#: were preflighted green at sf0.001/0.01/0.1 AND perturbed 7-CPU
#: partitioning (`GATE_r11_queue_preflight.log`). Residue after this
#: round: 5 (als_rank1_topk, sim_pca_pc1_project, ev_holt_linear_daily,
#: sim_whiten_diag_project, sk_kmv_monthly_rollup — each pinned
#: meanwhile by arbitrary-precision / numpy-agreement pytests), queued
#: for r12, which clears ALL certification debt.
VERIFIED_WINDOW = (
    # regression canaries: end-to-end pipelines (SURVEY §3)
    "hot_topics_pipeline",
    "tfidf_pipeline",
    "textrank_pipeline_distributed",
    "tfidf_recommend_all_days",
    # --- never-driver-verified rotation (46), round 11 ---
    # storage/warehouse one-offs (all 15)
    "s10b_scd2_asof_lookup",
    "s11_zorder_key",
    "s13_orc_roundtrip",
    "s15_schema_evolution_read",
    "s16_incremental_agg_merge",
    "s17_small_file_compaction",
    "s18_snapshot_diff",
    "s19_token_table_reuse",
    "s21_python_datasource",
    "s22_output_manifest",
    "s23_schema_evolution_roundtrip",
    "s24_malformed_csv_ingest",
    "s25_corrupt_file_skip",
    "s27_skipping_stats_report",
    "s28_bucketed_join_colocated",
    # multimodal block (all 4)
    "mm_audio_window_plan",
    "mm_frame_plan",
    "mm_phash_dedup",
    "mm_scene_cuts",
    # llm curation block (all 4)
    "llm_corpus_planning_report",
    "llm_curation_funnel_by_source",
    "llm_curation_funnel_report",
    "llm_curation_pipeline",
    # similarity residue (3)
    "sim_dbscan_lsh",
    "sim_multiprobe_lsh_topk",
    "sim_nndescent_round",
    # ml residue (2)
    "ml_cv_ridge_path",
    "ml_gbdt_k_rounds",
    # window/agg + SQL-surface residue (a15-a17, t3-t6)
    "a15_retention_halflife",
    "a15_trailing_range_window",
    "a16_grouping_sets",
    "a17_set_operations",
    "t3_sql_surface_demo",
    "t4_rbo_recommender_agreement",
    "t5_policy_replay_eval",
    "t6_decayed_popularity",
    # stragglers
    "j7_extractor_agreement",
    "graph_degree_histogram",
    # round-10 additions (8 of 13)
    "j3_scored_join_dot",
    "tfidf_pipeline_dot",
    "textrank_pipeline_distributed_dot",
    "sk_value_quantiles",
    "ts_bpe_learn_merges",
    "ts_bpe_encode_stats",
    "s29_dpp_partitioned_join",
    "sk_kmv_day_overlap",
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
