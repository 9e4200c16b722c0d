"""T1-T3: grouped sort / top-K (SURVEY §2.5).

The reference implements every ranking as
``groupBy(..).sortGroup(.., DESC).reduceGroup(take first K)``
(TextRank.java:280-299, TF_IDF.java:206-221, HotTopics.java:41-46) —
a full per-group sort in user code, ties broken by Flink iteration
order (nondeterministic). The engine pins the total order
``ORDER BY score DESC, news_id ASC`` (SURVEY §2.5 note) so results are
oracle-hashable, and plans all three as window functions:
``row_number() OVER (PARTITION BY key ORDER BY ...)`` — one shuffle on
the partition key, sort within partitions, no collected lists until the
final output shape requires them.

Scale notes (100 TB): top-K via ``row_number() <= K`` lets Spark use
``WindowGroupLimit`` (rank-limit pushdown): each map task keeps only K
rows per key before the shuffle, so shuffled volume is O(K·|keys|), not
O(|rows|). Verify in explain: a ``WindowGroupLimit`` node below the
shuffle. Skewed keys (one user with millions of scored pairs) are
exactly what this prunes.

The scored input for T1/T2 is a deterministic click-affinity relation
(user, news, score=Σcnt) so the rankings are standalone-testable; the
pipelines (plans/pipelines.py) feed them J3 output instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_SCENE
from ..registry import register
from ..sources import CLICKS_CTE, clicks, with_ctes

K = DEFAULT_SCENE.num_recommendations

#: Deterministic scored (user, news) relation used as ranking input.
_SCORES_CTE = """scores AS (
  SELECT user_id, news_id, CAST(SUM(cnt) AS DOUBLE) AS score
  FROM clicks GROUP BY user_id, news_id
)"""


def _scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        clicks(spark, sf_dir)
        .groupBy("user_id", "news_id")
        .agg(F.sum("cnt").cast("double").alias("score"))
    )


def top_k_rows(df: DataFrame, key: str, order: list, k: int | None) -> DataFrame:
    """Shared T1/T2/T3 core: rank rows within ``key`` groups by the
    pinned total order; keep the top ``k`` (None = keep all, T2)."""
    w = Window.partitionBy(key).orderBy(*order)
    ranked = df.withColumn("rank", F.row_number().over(w))
    return ranked if k is None else ranked.filter(F.col("rank") <= k)


def ranked_list(df: DataFrame, key: str) -> DataFrame:
    """Collapse ranked rows into the reference's output shape —
    ``(key, news array<long>)`` ordered by rank (TextRank.java:289-293).
    ``sort_array`` over (rank, news_id) structs pins the list order
    regardless of collect_list's arrival order."""
    return (
        df.groupBy(key)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rank", "news_id"))),
                lambda s: s["news_id"],
            ).alias("news")
        )
    )


@register(
    "t1_user_topk",
    with_ctes(
        f"""SELECT user_id, news_id, score,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY score DESC, news_id ASC) AS rank
FROM scores
QUALIFY rank <= {K}""",
        CLICKS_CTE,
        _SCORES_CTE,
    ),
)
def t1_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (TextRank.java:280-299): per-user top-K, truncated at
    K=scene.num_recommendations. Registered in the FLAT ranked-rows
    shape (user_id, news_id, score, rank) — the driver's canonicalizer
    cannot hash the reference's nested list shape (round-2 err);
    :func:`t1_user_topk_lists` keeps the nested API form."""
    return top_k_rows(
        _scores(spark, sf_dir), "user_id", [F.desc("score"), F.asc("news_id")], K
    )


def t1_user_topk_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 in the reference's output shape — ``(user_id, news
    array<long>)`` ordered by rank (TextRank.java:289-293). NOT
    registered (array column); the flat twin above is the compared
    form."""
    return ranked_list(t1_user_topk(spark, sf_dir), "user_id")


@register(
    "t2_user_full_rank",
    with_ctes(
        """SELECT user_id, news_id, score,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY score DESC, news_id ASC) AS rank
FROM scores""",
        CLICKS_CTE,
        _SCORES_CTE,
    ),
)
def t2_user_full_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 (TF_IDF.java:206-221): full per-user ranking, no truncation."""
    return top_k_rows(
        _scores(spark, sf_dir), "user_id", [F.desc("score"), F.asc("news_id")], None
    )


_DAILY_CTE = """daily AS (
  SELECT date, news_id, CAST(SUM(cnt) AS BIGINT) AS clicks
  FROM clicks GROUP BY date, news_id
)"""


@register(
    "t3_daily_topk_by_count",
    with_ctes(
        f"""SELECT date, news_id, clicks,
       ROW_NUMBER() OVER (PARTITION BY date ORDER BY clicks DESC, news_id ASC) AS rank
FROM daily
QUALIFY rank <= {K}""",
        CLICKS_CTE,
        _DAILY_CTE,
    ),
)
def t3_daily_topk_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (HotTopics.java:41-46): per-day top-K hottest news by click
    count — the HotTopics pipeline's ranking stage."""
    daily = (
        clicks(spark, sf_dir)
        .groupBy("date", "news_id")
        .agg(F.sum("cnt").alias("clicks"))
    )
    return top_k_rows(daily, "date", [F.desc("clicks"), F.asc("news_id")], K)
