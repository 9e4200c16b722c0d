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


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        dedup,
        filters,
        joins,
        ranking,
        similarity,
        textstats,
    )
    from .plans import pipelines  # noqa: F401

    _LOADED = True
