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


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics pinned end-to-end: an event arriving after
    the watermark has passed its window must be DROPPED by an
    append-mode windowed aggregate — the property that bounds state at
    100 TB (without it every window stays open forever). Three
    deterministic one-file micro-batches: (1) on-time day-1 events,
    (2) a day-4 marker that advances the watermark past day 1's
    window, closing and emitting it, (3) a late day-1 event, which
    must not re-open or change the emitted window."""
    src = tmp_path / "src"
    src.mkdir()
    schema = "ts timestamp, user_id long"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    import datetime as dt

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    write_batch("b1", [(d(1, 1), 1), (d(1, 2), 2), (d(1, 3), 3)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("date").alias("day"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_data_probe")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is still at batch-1's max - 1d → nothing emitted yet
        write_batch("b2", [(d(4), 99)])
        q.processAllAvailable()
        emitted = {
            r["day"]: r["n"]
            for r in spark.sql("SELECT * FROM late_data_probe").collect()
        }
        assert emitted.get(dt.date(2024, 1, 1)) == 3  # window closed with 3
        # a day-1 event now arrives AFTER the watermark passed its window
        write_batch("b3", [(d(1, 5), 4)])
        q.processAllAvailable()
        final = {
            r["day"]: r["n"]
            for r in spark.sql("SELECT * FROM late_data_probe").collect()
        }
        assert final.get(dt.date(2024, 1, 1)) == 3  # late row dropped
        assert len([d_ for d_ in final if d_ == dt.date(2024, 1, 1)]) == 1
    finally:
        q.stop()


def test_pysource_stream_drains_in_micro_batches(spark):
    """The custom Python streaming source must progress through its
    position offsets in PYSOURCE_BATCH-sized micro-batches (not one
    big read) and settle to the batch connector's aggregate."""
    import uuid

    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.sources.pysource import (
        PYSOURCE_BATCH,
        PYSOURCE_ROWS,
        clickgen,
        register_clickstream,
    )

    register_clickstream(spark)
    stream = (
        spark.readStream.format("graft_clickstream")
        .option("rows", str(PYSOURCE_ROWS))
        .load()
    )
    agg = stream.groupBy("day").agg(F.count("*").alias("n"))
    name = f"t_{uuid.uuid4().hex[:10]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    settled = {r["day"]: r["n"] for r in spark.table(name).collect()}
    batch = {
        r["day"]: r["n"]
        for r in clickgen(spark).groupBy("day").agg(F.count("*").alias("n")).collect()
    }
    assert settled == batch
    rows_per_batch = [p["numInputRows"] for p in progress if p["numInputRows"]]
    assert len(rows_per_batch) >= PYSOURCE_ROWS // PYSOURCE_BATCH
    assert all(n <= PYSOURCE_BATCH for n in rows_per_batch)


def test_checkpoint_restart_is_exactly_once(spark):
    """Operational semantics: restarting a checkpointed file-source
    stream must NOT reprocess committed data — the second run of the
    identical query over the identical source sees zero new input rows
    and the append sink's row count is unchanged (exactly-once across
    restarts, the property the checkpoint exists for)."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.streaming.hot_topics import (
        stream_clicks,
    )

    from conftest import SF_DIR

    run_id = uuid.uuid4().hex[:10]
    ckpt = f"/tmp/spark_ckpt_restart_{run_id}"
    sink = f"/tmp/spark_sink_restart_{run_id}"

    raw = stream_clicks(spark, SF_DIR).select("user_id", "news_id")
    q1 = (
        raw.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    first_rows = spark.read.parquet(sink).count()
    # numInputRows counts RAW source rows (pre click-filter), the sink
    # holds the filtered rows — both must be non-empty on first run
    first_inputs = sum(p["numInputRows"] for p in q1.recentProgress)
    assert first_rows > 0 and first_inputs >= first_rows

    raw2 = stream_clicks(spark, SF_DIR).select("user_id", "news_id")
    q2 = (
        raw2.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    second_inputs = sum(p["numInputRows"] for p in q2.recentProgress)
    assert second_inputs == 0  # committed offsets: nothing reprocessed
    assert spark.read.parquet(sink).count() == first_rows

    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)


def test_stream_cdc_apply_matches_batch(spark):
    """The settled streaming snapshot must equal the batch CDC apply
    row-for-row (streaming/batch parity for merges), including the
    tombstone-resurrection path (a D followed by a later in-order U
    keeps the entity with the U's balance)."""
    from recommedation_system_under_flink_spark import registry

    qs = registry.queries()
    sf = "/root/testdata/sf0.001"
    stream = {
        r["entity_id"]: (r["balance"], r["last_seq"], r["action"])
        for r in qs["stream_cdc_apply"](spark, sf).collect()
    }
    batch = {
        r["entity_id"]: (r["balance"], r["last_seq"], r["action"])
        for r in qs["s26_cdc_apply"](spark, sf).collect()
    }
    assert stream == batch
