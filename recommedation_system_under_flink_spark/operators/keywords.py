"""P1 + A3: TextRank keyword extraction as Spark queries (SURVEY §2.2, §2.4).

The TextRank pipeline computes keywords inline, not via TF-IDF:

- P1 (TextRank.java:59-67): per-news ``map`` —
  ``keywords = vote(text2wordsSet(content, windowSize), numNewsKeywords)``.
- A3 (TextRank.java:111-128): per-user ``reduceGroup`` — accumulate a
  full-clique co-occurrence graph over ALL of a user's tweets, then
  vote. A custom per-group aggregation (UDAF) → ``applyInPandas``.

Both run the pure-Python bodies from functions/text.py inside
Arrow-batched pandas UDFs — the graphs are per-document/per-user and
tiny, so iteration stays local (SURVEY §4.2 "Iteration": no GraphFrames,
no distributed loop). Not SQL-expressible → rows-only driver checks;
pytest fixtures cover the numeric semantics (tests/test_text.py).

Output shape is FLAT (doc, term, weight) rows, not maps: flat rows feed
the inverted-index J3 directly and keep the driver hash order-stable.

Scale notes (100 TB): P1 is embarrassingly parallel (mapInPandas-style,
no shuffle; cost is the Python boundary, amortized by Arrow batches).
A3 shuffles tweets once on user_id; skewed authors are bounded by the
per-group graph being vocabulary-sized, not tweet-count-sized — the
clique graph dedups words. applyInPandas materializes one user's tweets
per group in pandas, which is fine for tweets (user-bounded) but the
same pattern would need pre-aggregation for unbounded groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_SCENE
from ..functions.text import extract_keywords_clique, extract_keywords_windowed
from ..registry import register
from ..sources import news, tweets

_KW_SCHEMA = T.MapType(T.StringType(), T.DoubleType())


def news_keywords_udf(scene=DEFAULT_SCENE):
    """P1 scalar pandas UDF: content → top-K TextRank keyword map."""

    def batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.apply(
                lambda text: extract_keywords_windowed(
                    text,
                    scene.num_news_keywords,
                    scene.window_size,
                    scene.friction,
                    scene.max_iterates,
                    scene.min_difference,
                )
            )

    return F.pandas_udf(batch, _KW_SCHEMA)


@register("p1_news_keywords_textrank")  # UDF → rows-only check
def p1_news_keywords_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (TextRank.java:59-67): project news to (id, date, keywords),
    exploded flat. No shuffle: scan → Arrow batch → explode."""
    kw = news_keywords_udf()
    return (
        news(spark, sf_dir)
        .select("news_id", "date", F.explode(kw("content")).alias("term", "weight"))
    )


@register("a3_user_keywords_textrank")  # UDAF → rows-only check
def a3_user_keywords_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (TextRank.java:111-128): per-user clique-graph TextRank over
    all the user's tweets — grouped-map ``applyInPandas``, one shuffle
    on user_id."""
    scene = DEFAULT_SCENE

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        kws = extract_keywords_clique(
            pdf["content"].tolist(),
            scene.num_user_keywords,
            scene.friction,
            scene.max_iterates,
            scene.min_difference,
        )
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[0],
                "term": list(kws.keys()),
                "weight": list(kws.values()),
            }
        )

    return (
        tweets(spark, sf_dir)
        .select("user_id", "content")
        .groupBy("user_id")
        .applyInPandas(merge, "user_id long, term string, weight double")
    )


@register("a3_user_keywords_windowed")  # UDAF → rows-only check
def a3_user_keywords_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 per loop day (TextRank.java:231-310 × 94-128): for every
    recommendation day ``d`` in the loop range, user keywords from the
    trailing ``num_days`` tweet window ``[d-(num_days-1), d]``.

    The reference resubmits the whole job per day, re-reading the tweet
    table each time. Here a tweet dated ``t`` is replicated to each day
    it serves — ``sequence(t, t+num_days-1)`` clipped to the loop range
    — then one shuffle on (day, user) feeds the same clique-graph merge.
    The explode is bounded by ``num_days`` (×7), far cheaper at scale
    than ``days`` separate scans of the corpus; the per-group graph
    stays vocabulary-bounded exactly as in :func:`a3_user_keywords_textrank`.
    """
    scene = DEFAULT_SCENE
    from ..config import TODAY

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        kws = extract_keywords_clique(
            pdf["content"].tolist(),
            scene.num_user_keywords,
            scene.friction,
            scene.max_iterates,
            scene.min_difference,
        )
        return pd.DataFrame(
            {
                "day": pdf["day"].iloc[0],
                "user_id": pdf["user_id"].iloc[0],
                "term": list(kws.keys()),
                "weight": list(kws.values()),
            }
        )

    lo = F.lit(scene.from_date.isoformat()).cast("date")
    hi = F.lit(TODAY.isoformat()).cast("date")
    last_served = F.date_add(F.col("date"), scene.num_days - 1)
    return (
        tweets(spark, sf_dir)
        .filter((F.col("date") <= hi) & (last_served >= lo))
        .select(
            F.explode(
                F.sequence(F.greatest(F.col("date"), lo), F.least(last_served, hi))
            ).alias("day"),
            "user_id",
            "content",
        )
        .groupBy("day", "user_id")
        .applyInPandas(merge, "day date, user_id long, term string, weight double")
    )
