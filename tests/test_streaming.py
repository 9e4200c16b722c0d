"""Streaming + ALS extension checks: the streaming windows must agree
with their batch twins on the same fixtures (replay equivalence), and
ALS must emit the standard recommendations shape.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from recommedation_system_under_flink_spark import registry
from recommedation_system_under_flink_spark.config import DEFAULT_SCENE, TODAY
from recommedation_system_under_flink_spark.sources import clicks

from conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


def test_stream_daily_equals_batch_daily(queries, spark):
    """1-day tumbling windows over the file stream == batch
    groupBy(date, news_id) on the same parquet."""
    streamed = {
        (r.date, r.news_id): r.clicks
        for r in queries["stream_hot_topics_daily"](spark, SF_DIR).collect()
    }
    batch = {
        (r.date, r.news_id): r.clicks
        for r in clicks(spark, SF_DIR)
        .groupBy("date", "news_id")
        .agg(F.count("*").alias("clicks"))
        .collect()
    }
    assert streamed == batch


def test_stream_trailing_pane_matches_batch_window(queries, spark):
    """The sliding-window pane ending at TODAY must equal the batch
    trailing-zone aggregate (A2 without the date rewrite)."""
    num_days = DEFAULT_SCENE.num_days
    start = TODAY - dt.timedelta(days=num_days - 1)
    streamed = {
        (r.news_id): r.clicks
        for r in queries["stream_hot_topics_trailing"](spark, SF_DIR).collect()
        if r.date == TODAY
    }
    batch = {
        r.news_id: r.clicks
        for r in clicks(spark, SF_DIR, date_from=start, date_to=TODAY)
        .groupBy("news_id")
        .agg(F.count("*").alias("clicks"))
        .collect()
    }
    assert streamed == batch


def test_als_shape_and_validity(queries, spark):
    rows = queries["als_recommendations"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.date == TODAY
        assert 0 < len(r.news) <= DEFAULT_SCENE.num_recommendations
        assert len(set(r.news)) == len(r.news)


def test_stream_dedup_exactly_once(queries, spark):
    """The doubled-delivery source must come out exactly-once: the
    deduped stream equals the batch click set by event_id."""
    from recommedation_system_under_flink_spark.sources import events_raw, load_raw

    streamed = {
        r.event_id
        for r in queries["stream_clicks_dedup"](spark, SF_DIR).collect()
    }
    batch = {
        r.event_id
        for r in events_raw(spark, SF_DIR)
        .filter(F.col("event_type") == "click")
        .select("event_id")
        .distinct()
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_stream_running_totals_equal_batch_counts(queries, spark):
    """Settled applyInPandasWithState totals == batch per-news click
    counts."""
    streamed = {
        (r.news_id, r.total)
        for r in queries["stream_news_running_totals"](spark, SF_DIR).collect()
    }
    batch = {
        (r.news_id, r.cnt)
        for r in clicks(spark, SF_DIR)
        .groupBy("news_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_stream_interval_join_equals_batch_join(queries, spark):
    """The stream-stream interval join must emit exactly the matches the
    identical batch join produces on the same fixture."""
    from recommedation_system_under_flink_spark.sources import events_raw, load_raw

    streamed = {
        (r.user_id, r.purchase_id, r.click_id): r.gap_sec
        for r in queries["stream_purchase_click_join"](spark, SF_DIR).collect()
    }
    ev = events_raw(spark, SF_DIR).select(
        "user_id",
        "event_id",
        "event_type",
        F.timestamp_micros(F.expr("ts DIV 1000")).alias("t"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("t").alias("ct"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("t").alias("pt"),
    )
    batch = {
        (r.p_user, r.purchase_id, r.click_id): r.gap
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("ct") <= F.col("pt"))
            & (F.col("ct") >= F.col("pt") - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "p_user",
            "purchase_id",
            "click_id",
            (F.unix_timestamp("pt") - F.unix_timestamp("ct")).alias("gap"),
        )
        .collect()
    }
    assert streamed == batch
