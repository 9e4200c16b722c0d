"""Registry queries for the kernel SQL twins + small utility operators
(F8, F5 as Catalyst expressions; F11 date helpers; F12 formatters; S6
sink roundtrip — SURVEY §2.7, §2.1).

The kernels' hot-path use is inside J3 (operators/joins.py); these
entries exercise them standalone against a DuckDB oracle so the twins
themselves are hash-verified, not just their composition.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_SCENE, TODAY
from ..functions.kernels import calculate_x_sql, dot_product_sql
from ..registry import register
from ..sources import CLICKS_CTE, NEWS_CTE, clicks, with_ctes
from .tfidf import _NEWS_KW_CTE, _NEWS_TERMS_CTE, _NEWS_TFIDF_CTE, a8_news_keywords_topk

#: Pairwise kernel demos run over this news-id prefix (keeps the pair
#: space small while exercising every code path).
_N_DOCS = 20


def _news_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map<term,weight> keyword column for the first _N_DOCS news docs."""
    kw = a8_news_keywords_topk(spark, sf_dir).filter(F.col("news_id") < _N_DOCS)
    return kw.groupBy("news_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "weight"))).alias("kw")
    )


_KW_PAIR_CTES = (
    NEWS_CTE,
    _NEWS_TERMS_CTE,
    _NEWS_TFIDF_CTE,
    _NEWS_KW_CTE,
    f"kw AS (SELECT news_id, term, weight FROM news_kw WHERE news_id < {_N_DOCS})",
)


@register(
    "f8_dot_product_sql",
    with_ctes(
        """SELECT a.news_id AS news_a, b.news_id AS news_b,
       SUM(a.weight * b.weight) AS dot
FROM kw a JOIN kw b ON a.term = b.term AND a.news_id < b.news_id
GROUP BY 1, 2""",
        *_KW_PAIR_CTES,
    ),
)
def f8_dot_product_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 (EuclideanDistance.java:29-43) as ``map_zip_with`` +
    ``aggregate`` over map columns — pure whole-stage-codegen, no Python.
    The oracle computes the same sums from flat rows; zero-overlap pairs
    (dot = 0) are excluded on both sides since an inner term-join never
    produces them."""
    maps = _news_maps(spark, sf_dir)
    a = maps.select(F.col("news_id").alias("news_a"), F.col("kw").alias("k1"))
    b = maps.select(F.col("news_id").alias("news_b"), F.col("kw").alias("k2"))
    return (
        a.join(F.broadcast(b), F.col("news_a") < F.col("news_b"))
        .select("news_a", "news_b", dot_product_sql("k1", "k2").alias("dot"))
        .filter(F.col("dot") > 0)
    )


@register(
    "f5_calculate_x_sql",
    with_ctes(
        f"""SELECT i.news_a, i.news_b,
       CAST(i.inter AS DOUBLE) / (sa.n * sb.n) AS score
FROM (
  SELECT a.news_id AS news_a, b.news_id AS news_b, COUNT(*) AS inter
  FROM kw a JOIN kw b ON a.term = b.term AND a.news_id < b.news_id
  GROUP BY 1, 2
) i
JOIN (SELECT news_id, COUNT(*) AS n FROM kw GROUP BY news_id) sa ON i.news_a = sa.news_id
JOIN (SELECT news_id, COUNT(*) AS n FROM kw GROUP BY news_id) sb ON i.news_b = sb.news_id""",
        *_KW_PAIR_CTES,
    ),
)
def f5_calculate_x_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 ``calculateX`` (CosineSimilarity.java:88-127) as a Catalyst
    expression over map columns (``array_intersect`` of key sets /
    size product), verified against the flat-row oracle."""
    maps = _news_maps(spark, sf_dir)
    a = maps.select(F.col("news_id").alias("news_a"), F.col("kw").alias("k1"))
    b = maps.select(F.col("news_id").alias("news_b"), F.col("kw").alias("k2"))
    return (
        a.join(F.broadcast(b), F.col("news_a") < F.col("news_b"))
        .select("news_a", "news_b", calculate_x_sql("k1", "k2").alias("score"))
        .filter(F.col("score") > 0)
    )


# --------------------------------------------------------------- F11

_RANGE_DAYS = (TODAY - DEFAULT_SCENE.from_date).days + 1


@register(
    "f11_date_sequence",
    f"""SELECT CAST(unnest(generate_series(DATE '{DEFAULT_SCENE.from_date}',
                                 DATE '{TODAY}', INTERVAL 1 DAY)) AS DATE) AS day""",
)
def f11_date_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 ``DateIterator`` (TextRank.java:84-85, 231-232) as data, not
    driver control flow: ``sequence(from, to, interval 1 day)``. This is
    the date dimension the all-days pipeline joins against — the whole
    reason the reference's O(days) job-resubmission loop disappears."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(DEFAULT_SCENE.from_date.isoformat()).cast("date"),
                F.lit(TODAY.isoformat()).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )


# --------------------------------------------------------------- F12

@register(
    "f12_click_format",
    with_ctes(
        """SELECT user_id, news_id,
       user_id || ',' || news_id || ',' || strftime(date, '%Y-%m-%d') || ',' || cnt
         AS line
FROM clicks WHERE date = DATE '2024-01-30'""",
        CLICKS_CTE,
    ),
)
def f12_click_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 row formatters (``toString`` text-sink format,
    TextRank.java:70-72): the CSV-ish line via ``format_string`` /
    ``date_format`` — byte-compatible text sinks are
    ``df.select(line).write.text`` away (SURVEY §2.1 S6 note)."""
    return clicks(spark, sf_dir, date_from=TODAY, date_to=TODAY).select(
        "user_id",
        "news_id",
        F.format_string(
            "%d,%d,%s,%d",
            F.col("user_id"),
            F.col("news_id"),
            F.date_format("date", "yyyy-MM-dd"),
            F.col("cnt"),
        ).alias("line"),
    )


# ---------------------------------------------------------------- S6

@register(
    "s6_parquet_roundtrip",
    with_ctes(
        f"""SELECT DATE '{TODAY}' AS date,
       (list(news_id ORDER BY clicks DESC, news_id ASC))[1:{DEFAULT_SCENE.num_recommendations}] AS news
FROM (
  SELECT news_id, SUM(cnt) AS clicks
  FROM clicks
  WHERE date BETWEEN DATE '{TODAY - dt.timedelta(days=DEFAULT_SCENE.num_days - 1)}' AND DATE '{TODAY}'
  GROUP BY news_id
)""",
        CLICKS_CTE,
    ),
)
def s6_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 sink (``writeAsFormattedText`` → parquet overwrite,
    TextRank.java:68-73): write the HotTopics result through
    sources.io.write_parquet and read it back — the oracle checks the
    roundtripped rows, so schema preservation is hash-verified."""
    from ..plans.pipelines import hot_topics_pipeline
    from ..sources.io import write_parquet

    out = os.path.join(tempfile.gettempdir(), "spark_graft_s6_roundtrip")
    write_parquet(hot_topics_pipeline(spark, sf_dir), out)
    return spark.read.parquet(out)
