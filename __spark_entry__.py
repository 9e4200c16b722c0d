"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All three functions are thin delegates to
``recommedation_system_under_flink_spark.registry``: every implemented operator
registers a ``(name, spark_builder, duckdb_oracle_sql)`` triple there
(SURVEY.md §5.2). UDF-only operators register with ``oracle=None`` →
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from recommedation_system_under_flink_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the HotTopics pipeline (SURVEY §7.1) at sf0.001 —
    trailing click window → per-(date,news) SUM → per-day top-K."""
    _configure(spark)
    qs = registry.queries()
    for name in (
        "hot_topics_pipeline",
        "t3_daily_topk_by_count",
        "a2_clicks_daily_news_sum",
        "p3_clicks_trailing_window",
    ):
        if name in qs:
            return qs[name](spark, "/root/testdata/sf0.001")
    # Degenerate fallback: first registered query.
    name = sorted(qs)[0]
    return qs[name](spark, "/root/testdata/sf0.001")


def _configure(spark: SparkSession) -> None:
    """Apply session settings the engine depends on when the driver
    hands us an externally-built SparkSession (idempotent; safe confs
    only — nanosAsLong is a read-path conf settable at runtime)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def _wrap(fn: registry.QueryFn) -> registry.QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _configure(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; UDF-only operators
    are intentionally absent (driver records rows-only checks)."""
    return registry.oracles()
