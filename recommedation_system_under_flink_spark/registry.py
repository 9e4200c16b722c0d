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
#: ROUND-8 ROTATION (5th tranche): rounds 2-7 cumulatively certified
#: 200/354 oracle-backed queries (CORRECTNESS_r02/r03/r05/r06/r07).
#: This round keeps the same 6 regression canaries (four pipelines +
#: the CSV source sentinel + the flagship scored join) and spends the
#: other 44 slots on the FIFTH tranche of never-driver-certified
#: queries: the 11 round-7 additions first (per the r7 verdict), then
#: the two largest never-certified blocks — the full 14-query sim_*
#: ANN/embedding remainder and the full 15-query rel_* TPC-H
#: remainder — plus the 4 heaviest graph_* entries. Cumulative target:
#: ≥244/354 oracle-backed queries driver-certified by end of round 8.
VERIFIED_WINDOW = (
    # regression canaries: end-to-end pipelines (SURVEY §3) + sentinels
    "hot_topics_pipeline",
    "tfidf_pipeline",
    "textrank_pipeline_distributed",
    "tfidf_recommend_all_days",
    "s1_csv_roundtrip",
    "j3_scored_join",
    # --- never-driver-verified rotation (44), round 8 ---
    # round-7 additions (verdict ask #1: certify these first)
    "ml_ridge_regression",
    "ml_confusion_threshold_sweep",
    "ml_permutation_importance",
    "ml_isotonic_calibration_hashable",
    "mm_decode_features_hashable",
    "mm_binary_stats_hashable",
    "llm_curation_mix_fused",
    "llm_dataset_card",
    "ts_decontamination",
    "ts_gopher_rules",
    "stream_dedup_exact",
    # similarity / ANN / embedding remainder (all 14 never-certified)
    "sim_neardup_pairs_lsh",
    "sim_sq8_topk",
    "sim_label_outliers",
    "sim_threshold_sweep_report",
    "sim_hard_negatives",
    "sim_mmr_rerank",
    "sim_kcenter_coreset",
    "sim_silhouette_simplified",
    "sim_embedding_covariance",
    "sim_ivf_cell_balance",
    "sim_nprobe_recall_curve",
    "sim_dup_family_report",
    "sim_knn_label_agreement",
    "sim_jl_distortion",
    # relational TPC-H remainder (all 15 never-certified)
    "rel_q2_min_cost_part",
    "rel_q4_order_priority",
    "rel_q7_nation_volume",
    "rel_q8_market_share",
    "rel_q11_important_stock",
    "rel_q12_late_lines_by_class",
    "rel_q14_promo_share",
    "rel_q15_top_supplier",
    "rel_q16_supplier_part_counts",
    "rel_q17_small_quantity_revenue",
    "rel_q18_large_orders",
    "rel_q19_disjunctive_revenue",
    "rel_q20_dominant_suppliers",
    "rel_q22_inactive_rich_customers",
    "rel_entity_blocking",
    # heaviest never-certified graph entries
    "graph_bfs_hops",
    "graph_ppr_recommend",
    "graph_link_prediction_aa",
    "graph_modularity_report",
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
