"""Sources & sinks (SURVEY.md §2.1 S1-S6).

The reference's sources are CSV scans through absent model loaders
(``NewsModel.loadNewsDataSet`` TextRank.java:58, etc.) and its sink is a
formatted-text writer (``writeAsFormattedText``, TextRank.java:68-73 and
10 more sites); pipeline phases communicate through the filesystem
(SURVEY §1.4). Here: parquet in, parquet out, and the *logical* tables
(clicks/news/tweets) are derived deterministically from the driver
fixture tables with a DuckDB CTE twin per table so every operator
downstream stays oracle-checkable.
"""

from .io import read_parquet_table, write_parquet
from .tables import (
    CLICKS_CTE,
    NEWS_CTE,
    TWEETS_CTE,
    clicks,
    date_to_nanos,
    events_raw,
    load_raw,
    news,
    ts_date,
    ts_in_date_range,
    tweets,
    with_ctes,
)

__all__ = [
    "read_parquet_table",
    "write_parquet",
    "clicks",
    "news",
    "tweets",
    "load_raw",
    "events_raw",
    "date_to_nanos",
    "ts_date",
    "ts_in_date_range",
    "CLICKS_CTE",
    "NEWS_CTE",
    "TWEETS_CTE",
    "with_ctes",
]
