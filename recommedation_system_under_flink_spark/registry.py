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


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: e.fn for n, e in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    _load_all()
    return {n: e.oracle for n, e in _REGISTRY.items() if e.oracle is not None}


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
