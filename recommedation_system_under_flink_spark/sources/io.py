"""Parquet IO (S1-S4 scans, S6 sink — SURVEY.md §2.1).

The reference reads CSV through absent model loaders (csv path from
config, TF_IDF.java:57) and writes formatted text one-file-per-dataset
(TextRank.java:68-73). Spark-first replacement: columnar parquet both
ways — scans get predicate pushdown + column pruning for free, sinks
keep schema. S5 (``env.fromCollection``, TextRank.java:359) maps to
``spark.createDataFrame`` at call sites.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver generates per scale factor (TESTDATA.md).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1-S4: scan one fixture table. Filters/projections applied by the
    caller push down into this scan (Catalyst; verify via
    ``df.explain`` → ``PushedFilters``/``ReadSchema``)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S6 sink: ``writeAsFormattedText(..., OVERWRITE)`` → parquet
    overwrite. ``partition_by`` (typically ``["date"]``) gives partition
    pruning for the per-day consumers at scale."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
