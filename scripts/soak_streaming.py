"""Bounded streaming soak: micro-batch latency + state-store growth.

The stream_* family is correctness-certified against settled-state
oracles (bounded availableNow replay == batch result), which proves
semantics but says nothing about LATENCY or STATE growth under a
sustained source. This soak drives the three stateful operator SHAPES
— the watermarked tumbling-window count behind
``streaming/hot_topics.py::stream_decayed_popularity``, the
``session_window`` aggregation behind ``stream_sessionize``, and the
stream-stream interval join behind ``stream_purchase_click_join`` —
from a
continuous ``rate`` source for ``--seconds`` (default 60) each, in
APPEND mode so watermark-driven state EVICTION is exercised, and
records per-micro-batch:

- trigger latency (``durationMs.triggerExecution``),
- input rate / processed rate,
- state rows (``stateOperators[].numRowsTotal``) and memory bytes.

Window/gap/watermark are scaled to soak time (10 s windows / 5 s gap
vs the operators' 1-day window) — the PLAN SHAPE and state-store code
path are identical; only the horizon constant differs. The state
bounds under test:

- decayed-popularity live half: one count row per (window, news_id) ->
  at most ``ceil(horizon/window)+1`` open windows x NEWS_IDS keys,
  independent of input rows;
- sessionize: one merged session-window row per OPEN session -> at
  most USERS keys once sessions span the gap, independent of input
  rows;
- interval join: a DIFFERENT bound class — both sides' rows within
  the (watermark + interval) horizon are retained, so state is
  rate x horizon (rows-proportional to RATE, bounded by the horizon,
  never by stream length).

A soak PASSES if each query's state rows stay under its analytic cap
and the p95 trigger latency stays under the trigger interval x 5 (a
sustained-backlog detector, not a hardware benchmark).

Usage::

    python scripts/soak_streaming.py [--seconds 60] [--rate 5000] \
        [--out SOAK_r11.log]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NEWS_IDS = 100          # distinct news keys in the synthetic stream
USERS = 500             # distinct user keys
WINDOW_SEC = 10         # tumbling window (operator uses 1 day)
GAP_SEC = 5             # session gap (operator uses SESSION_GAP_US)
WATERMARK_SEC = 10      # late-data horizon
TRIGGER_SEC = 2         # micro-batch trigger interval
SESSION_ROTATE_SEC = 15  # user-generation churn period (see _sessionize)
PURCHASE_MOD = 50       # every 50th row is the purchase side of the join
JOIN_INTERVAL_SEC = 5   # attribution window of the interval join


def _decayed_popularity_live_half(rate: DataFrame) -> DataFrame:
    """The stream side of stream_decayed_popularity (hot_topics.py:619):
    watermarked tumbling-window count per news_id, APPEND mode emits a
    window once the watermark closes it, and its state row is evicted."""
    return (
        rate.select(
            F.col("timestamp").alias("event_time"),
            (F.col("value") % NEWS_IDS).alias("news_id"),
        )
        .withWatermark("event_time", f"{WATERMARK_SEC} seconds")
        .groupBy(
            F.window("event_time", f"{WINDOW_SEC} seconds").alias("win"),
            "news_id",
        )
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("win.start").alias("window_start"), "news_id", "n")
    )


def _sessionize(rate: DataFrame) -> DataFrame:
    """The stream_sessionize aggregation (hot_topics.py:446):
    per-user session_window merge; state = open sessions only.

    The synthetic user id carries a GENERATION component that rotates
    every ``SESSION_ROTATE_SEC`` — a user stops receiving events when
    its generation ends, its session closes after the gap, and the
    watermark then EVICTS the state row. Without churn every user is
    permanently active (rate source hits each id every
    USERS/rate seconds << gap) and no session ever closes, which
    exercises merge but not eviction."""
    gen = (F.unix_timestamp("timestamp") / SESSION_ROTATE_SEC).cast("long")
    return (
        rate.select(
            F.col("timestamp").alias("event_time"),
            ((F.col("value") % USERS) + F.lit(USERS) * gen).alias("user_id"),
        )
        .withWatermark("event_time", f"{WATERMARK_SEC} seconds")
        .groupBy(
            "user_id", F.session_window("event_time", f"{GAP_SEC} seconds")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("event_time").alias("session_start"),
            F.max("event_time").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


def _interval_join(rate: DataFrame) -> DataFrame:
    """The stream_purchase_click_join shape (hot_topics.py:280):
    stream-stream INTERVAL join, both sides watermarked, event-time
    range in the join condition. Every ``PURCHASE_MOD``-th row plays
    the purchase side; each purchase matches the same user's clicks
    from the preceding ``JOIN_INTERVAL_SEC``. State here is a
    DIFFERENT bound class from the keyed aggregations: both sides'
    rows within the (watermark + interval) horizon are retained —
    rate x horizon, rows-PROPORTIONAL to input rate but bounded by
    the horizon, never by stream length."""
    ev = rate.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % USERS).alias("user_id"),
        F.col("value").alias("event_id"),
        (F.col("value") % PURCHASE_MOD == 0).alias("is_purchase"),
    )
    clicks = (
        ev.filter(~F.col("is_purchase"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_time"),
        )
        .withWatermark("click_time", f"{WATERMARK_SEC} seconds")
    )
    purchases = (
        ev.filter(F.col("is_purchase"))
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_time"),
        )
        .withWatermark("purchase_time", f"{WATERMARK_SEC} seconds")
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""p_user = c_user
               AND click_time <= purchase_time
               AND click_time >= purchase_time - INTERVAL {JOIN_INTERVAL_SEC} SECONDS"""
        ),
    ).select("p_user", "purchase_id", "click_id")


def _soak(
    spark: SparkSession,
    name: str,
    build,
    state_cap_rows: int,
    seconds: int,
    rate_rps: int,
    log,
) -> dict:
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate_rps))
        .option("numPartitions", "4")
        .load()
    )
    ckpt = tempfile.mkdtemp(prefix=f"soak_{name}_")
    q = (
        build(rate)
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime=f"{TRIGGER_SEC} seconds")
        .queryName(f"soak_{name}")
        .start()
    )
    seen: dict[int, dict] = {}
    t0 = time.time()
    try:
        while time.time() - t0 < seconds:
            time.sleep(1.0)
            for p in q.recentProgress:
                b = p["batchId"]
                if b in seen or not p.get("stateOperators"):
                    continue
                so = p["stateOperators"][0]
                seen[b] = {
                    "batch": b,
                    "trigger_ms": p["durationMs"].get("triggerExecution"),
                    "input_rps": p.get("inputRowsPerSecond"),
                    "proc_rps": p.get("processedRowsPerSecond"),
                    "in_rows": p.get("numInputRows"),
                    "state_rows": so.get("numRowsTotal"),
                    "state_bytes": so.get("memoryUsedBytes"),
                    "evicted": so.get("numRowsRemoved"),
                }
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    rows = [seen[b] for b in sorted(seen)]
    for r in rows:
        log.write(f"  {name} {json.dumps(r)}\n")
    # skip the cold first batches (plan + state-store open) for latency
    lat = sorted(
        r["trigger_ms"] for r in rows[2:] if r["trigger_ms"] is not None
    )
    p50 = lat[len(lat) // 2] if lat else None
    p95 = lat[min(len(lat) - 1, math.ceil(0.95 * len(lat)) - 1)] if lat else None
    max_state = max((r["state_rows"] or 0) for r in rows) if rows else 0
    evicted = sum((r["evicted"] or 0) for r in rows)
    summary = {
        "query": name,
        "batches": len(rows),
        "input_rows": sum(r["in_rows"] or 0 for r in rows),
        "p50_trigger_ms": p50,
        "p95_trigger_ms": p95,
        "max_state_rows": max_state,
        "state_cap_rows": state_cap_rows,
        "state_rows_evicted": evicted,
        "state_within_cap": max_state <= state_cap_rows,
        "latency_ok": p95 is not None and p95 <= TRIGGER_SEC * 1000 * 5,
        "eviction_observed": evicted > 0,
    }
    log.write(f"SUMMARY {json.dumps(summary)}\n")
    return summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--rate", type=int, default=5000)
    ap.add_argument("--out", default="SOAK_r11.log")
    args = ap.parse_args()

    from recommedation_system_under_flink_spark.session import get_spark

    spark = get_spark(app_name="soak_streaming")

    # analytic state caps (see module docstring): windows-in-horizon x
    # keys for the windowed count; one open session per user-generation
    # within the horizon for session_window. Measured plateaus sit one
    # slack generation BELOW each cap (45 s trials: 300 vs 400 window
    # rows, 1500 vs 2000 session rows) — the cap adds exactly one
    # watermark-lag generation so a slow micro-batch doesn't flap the
    # verdict while still failing loudly on any rows-proportional leak.
    win_cap = (math.ceil(WATERMARK_SEC / WINDOW_SEC) + 3) * NEWS_IDS
    sess_cap = 4 * USERS

    with open(args.out, "w") as log:
        log.write(
            f"== streaming soak ({time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}) "
            f"rate={args.rate} rows/s x {args.seconds}s per query, trigger={TRIGGER_SEC}s, "
            f"window={WINDOW_SEC}s gap={GAP_SEC}s watermark={WATERMARK_SEC}s, "
            f"news={NEWS_IDS} users={USERS}\n"
        )
        s1 = _soak(
            spark,
            "decayed_popularity_live_half",
            _decayed_popularity_live_half,
            win_cap,
            args.seconds,
            args.rate,
            log,
        )
        s2 = _soak(
            spark, "sessionize", _sessionize, sess_cap, args.seconds, args.rate, log
        )
        # stream-stream interval join: rate x horizon bound (both sides'
        # rows within watermark + interval + trigger slack are state)
        join_cap = args.rate * (WATERMARK_SEC + JOIN_INTERVAL_SEC + 3 * TRIGGER_SEC)
        s3 = _soak(
            spark,
            "purchase_click_interval_join",
            _interval_join,
            join_cap,
            args.seconds,
            args.rate,
            log,
        )
        ok = all(
            s["state_within_cap"] and s["latency_ok"] and s["eviction_observed"]
            for s in (s1, s2, s3)
        )
        log.write(f"RESULT {'PASS' if ok else 'FAIL'}\n")
    print(json.dumps({"pass": ok, "queries": [s1, s2, s3]}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
