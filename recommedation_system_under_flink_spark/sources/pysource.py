"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference engine's source surface is files + an in-memory seed
(SURVEY §2 S1-S5). Spark 4 adds a first-class way to bring an
*external system* into the scan path from Python: a ``DataSource``
subclass whose reader declares partitions and yields rows per
partition — the connector shape you'd use for an internal feed,
paginated API, or bespoke storage format, with Spark parallelizing
across the declared partitions exactly like file splits.

This module registers ``graft_clickgen``: a deterministic synthetic
click-event generator (pinned Knuth-hash user assignment, modular
news/day derivation — the same portable-arithmetic conventions as
``operators/sampling.py``). Determinism is the point: the source's
entire output is reproducible from its parameters, so a DuckDB oracle
can regenerate it with ``generate_series`` and hash-verify that the
custom connector feeds Spark EXACTLY the declared rows — connector
correctness as a first-class verified query (`s21_python_datasource`).

Scale notes: ``partitions()`` declares ``ROWS/partitions`` contiguous
id ranges; each executor materializes only its range (generator, no
driver-side data). A real connector swaps the arithmetic for API
pages / shard ids; the partition-planning contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

#: Generator parameters (pinned; mirrored into the oracle).
PYSOURCE_ROWS = 100_000
PYSOURCE_PARTITIONS = 8
PYSOURCE_USERS = 1_000
PYSOURCE_NEWS = 500
PYSOURCE_DAYS = 30
#: Knuth multiplicative hash (cf. operators/sampling.py).
_MULT = 2654435761
_MOD = 2**32


def _make_datasource():
    """Build the DataSource class lazily so importing this module never
    requires the datasource API (present in pyspark ≥ 4.0)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _IdRange(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class ClickGenReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", PYSOURCE_ROWS))
            self.nparts = int(options.get("partitions", PYSOURCE_PARTITIONS))

        def partitions(self):
            step = max(1, -(-self.rows // self.nparts))
            return [
                _IdRange(lo, min(lo + step, self.rows))
                for lo in range(0, self.rows, step)
            ]

        def read(self, partition):
            # Yield ONE Arrow batch per id-range instead of per-row
            # tuples (r12, guide §4): tuple yield pickles every row
            # through the Python-worker boundary; the Arrow path is a
            # handful of vectorized numpy ops + one columnar transfer.
            # Same rows, same order, exact integer arithmetic
            # (i·MULT ≤ 1e5·2.7e9 ≈ 2.7e14 — far inside int64).
            import numpy as np
            import pyarrow as pa

            # int64 exactness bound: i * _MULT must not wrap (callers
            # can raise `rows` via options; silent wraparound would
            # diverge from the exact-int oracle arithmetic)
            assert partition.end <= 2**63 // _MULT, (
                "rows too large for exact int64 Knuth-hash arithmetic"
            )
            i = np.arange(partition.start, partition.end, dtype=np.int64)
            yield pa.record_batch(
                {
                    "event_id": i,
                    "user_id": (i * _MULT) % _MOD % PYSOURCE_USERS,
                    "news_id": i % PYSOURCE_NEWS,
                    "day": i % PYSOURCE_DAYS,
                }
            )

    class ClickGenDataSource(DataSource):
        @classmethod
        def name(cls):
            return "graft_clickgen"

        def schema(self):
            return "event_id bigint, user_id bigint, news_id bigint, day bigint"

        def reader(self, schema):
            return ClickGenReader(self.options)

    return ClickGenDataSource


_REGISTERED: set[int] = set()


def register_clickgen(spark: SparkSession) -> None:
    """Register the source with this session (idempotent per session)."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.dataSource.register(_make_datasource())
    _REGISTERED.add(key)


def clickgen(spark: SparkSession, rows: int = PYSOURCE_ROWS) -> DataFrame:
    register_clickgen(spark)
    return (
        spark.read.format("graft_clickgen")
        .option("rows", str(rows))
        .option("partitions", str(PYSOURCE_PARTITIONS))
        .load()
    )


@register(
    "s21_python_datasource",
    f"""SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(news_id) AS BIGINT) AS news_id_sum
FROM (
  SELECT i AS event_id,
         (i * {_MULT}) % {_MOD} % {PYSOURCE_USERS} AS user_id,
         i % {PYSOURCE_NEWS} AS news_id,
         i % {PYSOURCE_DAYS} AS day
  FROM generate_series(0, {PYSOURCE_ROWS - 1}) AS t(i)
)
GROUP BY day""",
)
def s21_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension: scan through the **custom Python data
    source** and aggregate — proving the connector path end-to-end.
    The oracle regenerates the source's deterministic output with
    ``generate_series`` and the same pinned arithmetic, so the hash
    compare certifies the connector delivered exactly the declared
    rows across its {PYSOURCE_PARTITIONS} parallel partitions (the
    checksum column would catch any dropped/duplicated range)."""
    df = clickgen(spark)
    return df.groupBy("day").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("news_id").cast("long").alias("news_id_sum"),
    )


# ------------------------------------------------ streaming variant

#: Rows emitted per micro-batch by the streaming reader.
PYSOURCE_BATCH = 20_000


def _make_stream_datasource():
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class ClickGenStreamReader(SimpleDataSourceStreamReader):
        """Deterministic finite click stream: micro-batches of
        ``PYSOURCE_BATCH`` rows until ``rows`` are emitted, then idle.
        Offsets are the emitted-row position — replayable from any
        offset (``readBetweenOffsets``), which is what gives the
        exactly-once contract under retries."""

        def __init__(self, options):
            self.rows = int(options.get("rows", PYSOURCE_ROWS))

        def initialOffset(self):
            return {"pos": 0}

        def _rows(self, lo: int, hi: int):
            # a LIST ITERATOR: the engine's prefetch cache calls
            # next() on it AND copy.copy()s it — list iterators
            # support both, generators pickle-fail, bare lists aren't
            # iterators
            return iter(
                [
                    (
                        i,
                        (i * _MULT) % _MOD % PYSOURCE_USERS,
                        i % PYSOURCE_NEWS,
                        i % PYSOURCE_DAYS,
                    )
                    for i in range(lo, hi)
                ]
            )

        def read(self, start):
            pos = int(start["pos"])
            end = min(pos + PYSOURCE_BATCH, self.rows)
            return self._rows(pos, end), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return self._rows(int(start["pos"]), int(end["pos"]))

    class ClickGenStreamDataSource(DataSource):
        @classmethod
        def name(cls):
            return "graft_clickstream"

        def schema(self):
            return "event_id bigint, user_id bigint, news_id bigint, day bigint"

        def simpleStreamReader(self, schema):
            return ClickGenStreamReader(self.options)

    return ClickGenStreamDataSource


_STREAM_REGISTERED: set[int] = set()


def register_clickstream(spark: SparkSession) -> None:
    key = id(spark)
    if key in _STREAM_REGISTERED:
        return
    spark.dataSource.register(_make_stream_datasource())
    _STREAM_REGISTERED.add(key)


@register(
    "stream_pysource_daily_counts",
    # the drained finite stream must settle to the batch aggregate —
    # same oracle arithmetic as s21_python_datasource
    f"""SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(news_id) AS BIGINT) AS news_id_sum
FROM (
  SELECT (i * {_MULT}) % {_MOD} % {PYSOURCE_USERS} AS user_id,
         i % {PYSOURCE_NEWS} AS news_id,
         i % {PYSOURCE_DAYS} AS day
  FROM generate_series(0, {PYSOURCE_ROWS - 1}) AS t(i)
)
GROUP BY day""",
)
def stream_pysource_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan through the **custom Python streaming source**
    (``SimpleDataSourceStreamReader``): the finite deterministic click
    stream drains in ``ROWS/BATCH`` micro-batches into a per-day
    running aggregate; settlement is hash-verified against the same
    generate_series oracle as the batch connector — the replayable
    offset contract (position-range offsets + ``readBetweenOffsets``)
    is exactly what a production exactly-once Python connector (queue
    consumer, paginated API tailer) implements."""
    register_clickstream(spark)
    import uuid

    stream = (
        spark.readStream.format("graft_clickstream")
        .option("rows", str(PYSOURCE_ROWS))
        .load()
    )
    agg = stream.groupBy("day").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("news_id").cast("long").alias("news_id_sum"),
    )
    # Python streaming sources don't support Trigger.AvailableNow yet
    # (falls back to ONE batch = one 20k slice); drain with
    # processAllAvailable instead — the source goes idle (read()
    # returns its own offset) once `rows` are emitted, so this
    # terminates deterministically.
    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
