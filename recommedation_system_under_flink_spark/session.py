"""SparkSession factory.

The reference obtains its execution environment through the absent
``Controller.getEnvironment()`` (TextRank.java:359); here the analogue is a
single tuned :class:`~pyspark.sql.SparkSession`.

Tuning rationale (100 TB-scale defaults, scaled down for local[N] tests):

- AQE on: runtime coalescing + skew-join splitting replaces any hand
  scheduling for skewed user×news keys (SURVEY §4.2).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this is overridden per-deployment (AQE coalesces down anyway).
- Arrow enabled: every pandas UDF crosses the JVM↔Python boundary in
  columnar batches, not row-at-a-time pickles.
- Session timezone pinned UTC so date/timestamp semantics match the
  DuckDB oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "recommedation_system_under_flink_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``. On a real
    cluster, pass ``master=None`` after setting it externally, or supply
    the cluster master URL; everything else carries over.
    """
    if master is None:
        master = f"local[{DEFAULT_CPUS}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(DEFAULT_CPUS) if DEFAULT_CPUS.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Driver fixture events.parquet stores TIMESTAMP(NANOS), which
        # Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL) unless read as
        # raw long nanos; sources/tables.py re-derives timestamps from
        # the long. Bonus at scale: date predicates become raw-long
        # range predicates that push down into the parquet scan.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
