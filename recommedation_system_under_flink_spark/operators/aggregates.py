"""A1-A4: aggregations (SURVEY §2.4).

- A1 per-day distinct clickers (TextRank.java:321-340, TF_IDF.java:243-262):
  the reference groups clicks by date and dedups user ids with an O(n²)
  ``LinkedList.contains`` loop into a nested ``Tuple2<Date, List<Long>>``.
  Spark-first replacement keeps the relation FLAT —
  ``select(date, user_id).distinct()`` — because every consumer is a
  semi-join (J1/J2) that works better on flat rows than on collected
  lists (SURVEY §4.2). The nested form is kept as a second query for
  shape parity.
- A2 hot-topics SUM (HotTopics.java:67-93): trailing-window clicks →
  per-news SUM with the row's date rewritten to *today*
  (HotTopics.java:84).
- A4 global reduce (TextRank.java:88-101): all distinct window users in
  one row.

Scale notes (100 TB): A1/A2 are map-side-combinable hash aggregations —
Spark plans partial_* before the shuffle, so shuffled bytes are
O(|distinct keys|), not O(|clicks|). The date-range inputs arrive
pre-pruned at the parquet scan (sources/tables.py raw-``ts`` pushdown).
A4's single-row output is fine: the partial ``collect_set`` shrinks each
partition to its distinct users before the 1-partition final step.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_SCENE, TODAY
from ..registry import register
from ..sources import CLICKS_CTE, clicks, with_ctes

NUM_DAYS = DEFAULT_SCENE.num_days
_WINDOW_START = TODAY - dt.timedelta(days=NUM_DAYS - 1)


@register(
    "a1_daily_distinct_clickers",
    with_ctes(
        """SELECT DISTINCT date, user_id FROM clicks""",
        CLICKS_CTE,
    ),
)
def a1_daily_distinct_clickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 flat form (TextRank.java:321-340): one row per (date, user)
    that clicked — the semi-join-ready shape. ``distinct()`` is a
    hash aggregate with map-side partials, vs the reference's O(n²)
    ``contains`` dedup (SURVEY §4.1)."""
    return clicks(spark, sf_dir).select("date", "user_id").distinct()


@register(
    "a1_daily_clicker_sets",
    with_ctes(
        """SELECT date, list_sort(list(DISTINCT user_id)) AS users
FROM clicks GROUP BY date""",
        CLICKS_CTE,
    ),
)
def a1_daily_clicker_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 nested form — shape parity with the reference's
    ``Tuple2<Date, LinkedList<Long>>`` (TextRank.java:321-323). Sorted
    so the driver hash is deterministic."""
    return (
        clicks(spark, sf_dir)
        .groupBy("date")
        .agg(F.sort_array(F.collect_set("user_id")).alias("users"))
    )


@register(
    "a2_hot_topics_sum",
    with_ctes(
        f"""SELECT DATE '{TODAY}' AS date, news_id, SUM(cnt) AS clicks
FROM clicks
WHERE date BETWEEN DATE '{_WINDOW_START}' AND DATE '{TODAY}'
GROUP BY news_id""",
        CLICKS_CTE,
    ),
)
def a2_hot_topics_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (HotTopics.java:67-93): trailing-window click SUM per news,
    with the output date rewritten to *today* (HotTopics.java:84 sets
    ``date = today`` on every emitted row)."""
    return (
        clicks(spark, sf_dir, date_from=_WINDOW_START, date_to=TODAY)
        .groupBy("news_id")
        .agg(F.sum("cnt").alias("clicks"))
        .select(F.lit(TODAY).cast("date").alias("date"), "news_id", "clicks")
    )


@register(
    "a4_window_users_reduce",
    with_ctes(
        f"""SELECT list_sort(list(DISTINCT user_id)) AS users,
       COUNT(DISTINCT user_id) AS n_users
FROM clicks
WHERE date BETWEEN DATE '{_WINDOW_START}' AND DATE '{TODAY}'""",
        CLICKS_CTE,
    ),
)
def a4_window_users_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (TextRank.java:88-101): global no-key reduce of window users
    into a single row. Partial ``collect_set`` runs per-partition before
    the single-partition final merge, so the shuffle carries distinct
    ids only."""
    return clicks(spark, sf_dir, date_from=_WINDOW_START, date_to=TODAY).agg(
        F.sort_array(F.collect_set("user_id")).alias("users"),
        F.count_distinct("user_id").alias("n_users"),
    )
