"""Derived logical tables: clicks / news / tweets from the driver fixtures.

The reference consumes three input tables (SURVEY.md §1.2): a 4-column
click log (TextRank.java:332-334, HotTopics.java:83-86), a news corpus
(TextRank.java:63-65), and tweets (TextRank.java:107,120-122). The
driver fixtures don't ship those tables directly, so FIXTURES.md §B maps
them onto ``events`` and ``documents`` with **pinned deterministic
derivations**. Every derivation exists twice — a Spark builder and a
DuckDB CTE string — and the two must stay in lockstep: the driver's
correctness gate hashes Spark output against DuckDB output.

Pinned constants:

- ``NEWS_MOD = 500``: ``news_id = event_id % 500`` — doc_ids 0..499
  exist at every scale factor, so every click maps to a real news row.
- ``USER_MOD = 50``: tweet author ``user_id = doc_id % 50`` — overlaps
  the events ``user_id`` range at every SF, so semi-joins are non-empty.
- ``DATE0 = 2024-01-01``, ``DATE_MOD = 30``: news/tweet date =
  ``DATE0 + doc_id % 30`` — spans the same 30-day window as events.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import read_parquet_table

NEWS_MOD = 500
USER_MOD = 50
DATE_MOD = 30
DATE0 = "2024-01-01"

_EPOCH = dt.date(1970, 1, 1)


def load_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------- clicks

def date_to_nanos(day: dt.date) -> int:
    """Midnight UTC of ``day`` as epoch nanoseconds (the canonical ``ts``
    representation produced by :func:`events_raw`)."""
    return (day - _EPOCH).days * 86_400_000_000_000


def _ts_literal(ts_type: str, day: dt.date) -> Column:
    """Midnight UTC of ``day`` as a literal of the *stored* ``ts`` type,
    so range predicates compare same-type values and reach the parquet
    scan as ``PushedFilters`` (a casted column never pushes down)."""
    if ts_type == "bigint":
        return F.lit(date_to_nanos(day))
    stamp = f"{day.isoformat()} 00:00:00"
    if ts_type == "timestamp_ntz":
        return F.expr(f"TIMESTAMP_NTZ '{stamp}'")
    return F.expr(f"TIMESTAMP '{stamp}'")  # session tz pinned UTC


def events_raw(
    spark: SparkSession,
    sf_dir: str,
    date_from: dt.date | None = None,
    date_to: dt.date | None = None,
) -> DataFrame:
    """``events`` with ``ts`` canonicalized to epoch-long **nanoseconds**.

    The fixture encodes ``ts`` as either parquet TIMESTAMP(NANOS) (read
    as a raw long under ``spark.sql.legacy.parquet.nanosAsLong``) or
    TIMESTAMP(MICROS) (read as a timestamp; session tz pinned UTC). This
    loader adapts to both and presents one canonical shape downstream:
    ``ts`` = epoch nanos as BIGINT — exact in both directions (micros
    ×1000 is lossless).

    Scale-critical detail: the optional day-window predicate is applied
    to the **stored** column with same-type literals *before* the
    canonicalizing projection, so it pushes into the parquet scan
    (row-group pruning). A predicate on the derived long column would
    be evaluated post-read — a full scan of ``events`` at 100 TB.
    """
    ev = load_raw(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    cond = None
    if date_from is not None:
        cond = F.col("ts") >= _ts_literal(ts_type, date_from)
    if date_to is not None:
        upper = F.col("ts") < _ts_literal(ts_type, date_to + dt.timedelta(days=1))
        cond = upper if cond is None else cond & upper
    if cond is not None:
        ev = ev.filter(cond)
    if ts_type == "bigint":
        return ev
    return ev.withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    )


def _div_us(c: Column | str) -> Column:
    """Exact nanos→micros: integer ``DIV 1000``. Float division
    (``(c / 1000).cast("long")``) routes through a double whose ~0.25 µs
    spacing at 1.7e18 can round *up* across a micro boundary — the
    column form uses exact decimal division (truncating cast) so any
    Column expression gets the same floor semantics DuckDB applies when
    truncating TIMESTAMP(NANOS) to micros."""
    if isinstance(c, str):
        return F.expr(f"{c} DIV 1000")
    return (c.cast("decimal(38,0)") / F.lit(1000)).cast("long")


def ts_date(c: Column | str = "ts") -> Column:
    """Derive a day-granularity date from the canonical long-nanos
    ``ts`` column (see :func:`events_raw`): micros → timestamp → date
    (session timezone pinned UTC, so this matches DuckDB's native
    ``CAST(ts AS DATE)``)."""
    return F.to_date(F.timestamp_micros(_div_us(c)))


def ts_in_date_range(
    date_from: dt.date | None, date_to: dt.date | None, c: Column | str = "ts"
) -> Column:
    """Canonical-long range predicate equivalent to
    ``date_from <= ts_date(ts) <= date_to`` (bounds inclusive, open side
    when ``None``), for frames already canonicalized by
    :func:`events_raw`. For the scan-pruning form pass
    ``date_from``/``date_to`` to :func:`events_raw` itself — that
    applies the same bounds to the *stored* column, which is what
    reaches the parquet scan as ``PushedFilters``."""
    c = F.col(c) if isinstance(c, str) else c
    cond = F.lit(True)
    if date_from is not None:
        cond = cond & (c >= F.lit(date_to_nanos(date_from)))
    if date_to is not None:
        cond = cond & (c < F.lit(date_to_nanos(date_to + dt.timedelta(days=1))))
    return cond


def clicks(
    spark: SparkSession,
    sf_dir: str,
    date_from: dt.date | None = None,
    date_to: dt.date | None = None,
) -> DataFrame:
    """clicks(user_id, news_id, date, cnt) ← events with
    event_type='click'. The event_type predicate, the optional raw-``ts``
    date-range predicate, and the 3-column projection all push down to
    the parquet scan (verify: ``PushedFilters`` in explain)."""
    ev = events_raw(spark, sf_dir, date_from=date_from, date_to=date_to)
    cond = F.col("event_type") == "click"
    return ev.filter(cond).select(
        F.col("user_id"),
        (F.col("event_id") % NEWS_MOD).alias("news_id"),
        ts_date("ts").alias("date"),
        F.lit(1).cast("int").alias("cnt"),
    )


CLICKS_CTE = f"""clicks AS (
  SELECT user_id,
         event_id % {NEWS_MOD} AS news_id,
         CAST(ts AS DATE) AS date,
         CAST(1 AS INTEGER) AS cnt
  FROM events
  WHERE event_type = 'click'
)"""


# ------------------------------------------------------------------ news

def news(spark: SparkSession, sf_dir: str) -> DataFrame:
    """news(news_id, date, title, description, content) ← documents.
    title/description are deterministic token slices of the text so the
    per-field term weighting (TF_IDF.java:58-60) has three real fields."""
    docs = load_raw(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        F.col("doc_id").alias("news_id"),
        F.date_add(
            F.to_date(F.lit(DATE0)), (F.col("doc_id") % DATE_MOD).cast("int")
        ).alias("date"),
        F.array_join(F.slice(toks, 1, 4), " ").alias("title"),
        F.array_join(F.slice(toks, 5, 8), " ").alias("description"),
        F.col("text").alias("content"),
    )


NEWS_CTE = f"""news AS (
  SELECT doc_id AS news_id,
         DATE '{DATE0}' + CAST(doc_id % {DATE_MOD} AS INTEGER) AS date,
         array_to_string(string_split(text, ' ')[1:4], ' ') AS title,
         array_to_string(string_split(text, ' ')[5:12], ' ') AS description,
         text AS content
  FROM documents
)"""


# ---------------------------------------------------------------- tweets

def tweets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tweets(tweet_id, user_id, date, content) ← documents with a
    pinned author derivation."""
    docs = load_raw(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("tweet_id"),
        (F.col("doc_id") % USER_MOD).alias("user_id"),
        F.date_add(
            F.to_date(F.lit(DATE0)), (F.col("doc_id") % DATE_MOD).cast("int")
        ).alias("date"),
        F.col("text").alias("content"),
    )


TWEETS_CTE = f"""tweets AS (
  SELECT doc_id AS tweet_id,
         doc_id % {USER_MOD} AS user_id,
         DATE '{DATE0}' + CAST(doc_id % {DATE_MOD} AS INTEGER) AS date,
         text AS content
  FROM documents
)"""


def with_ctes(body: str, *ctes: str) -> str:
    """Compose a DuckDB oracle query from CTE snippets + a final body."""
    if not ctes:
        return body
    return "WITH " + ",\n".join(ctes) + "\n" + body
