"""Failure-recovery soak: kill the sessionize soak mid-run, restart
from checkpoint, verify exactly-once + state/latency recovery
(round-11 verdict item 5).

`SOAK_r11.log` proved latency and state boundedness under sustained
load; the remaining 100 TB streaming claim is exactly-once ACROSS
RESTARTS under load. This harness runs the ``stream_sessionize``
aggregation shape (session_window merge, APPEND mode, watermark
eviction — scripts/soak_streaming.py::_sessionize) at soak rate into
a PARQUET sink (whose ``_spark_metadata`` commit log is what gives a
file sink exactly-once), then:

1. **run phase** (child process): rate source → session_window agg →
   parquet sink, checkpointed; per-batch progress appended to a JSONL
   file.
2. **kill**: the parent SIGKILLs the child's whole process group
   (Python driver AND the py4j-launched JVM) once the progress log
   shows batch ≥ ``--kill-batch`` — a crash, not a clean stop: state
   store unflushed, sink manifest possibly mid-write.
3. **resume phase** (fresh child): same checkpoint + sink; the rate
   source resumes from its committed offsets (replaying the
   uncommitted batch), the sink manifest dedups the replay.
4. **verify** (parent): batch-read the sink THROUGH the manifest and
   assert (a) zero duplicate (user_id, session_start) session rows —
   the exactly-once claim; (b) resumed state_rows returns to the
   pre-kill plateau band and stays under the analytic cap; (c) p95
   trigger latency over post-restart batches (first 3 skipped as
   recovery) is back under trigger x 5.

Usage::

    python scripts/soak_restart.py [--rate 5000] [--kill-batch 15]
        [--resume-seconds 40] [--out SOAK_r12_restart.log]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# mirror the soak constants (scripts/soak_streaming.py)
USERS = 500
GAP_SEC = 5
WATERMARK_SEC = 10
TRIGGER_SEC = 2
SESSION_ROTATE_SEC = 15
SESS_CAP = 4 * USERS          # analytic cap (soak_streaming.py)
SESS_PLATEAU_MIN = USERS      # ≥1 live generation = resumed, not reset


def _child(phase: str, args) -> int:
    """One streaming run (fresh JVM): start → write progress JSONL →
    stop after --seconds (resume phase) or run until killed (run
    phase)."""
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from soak_streaming import _sessionize

    spark = get_spark(app_name=f"soak_restart_{phase}")
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(args.rate))
        .option("numPartitions", "4")
        .load()
    )
    out = (
        _sessionize(rate)
        # event-time column for the parquet sink partition check; keep
        # the sink schema flat
        .select(
            "user_id",
            "n_events",
            F.col("session_start").cast("long").alias("session_start_us"),
            F.col("session_end").cast("long").alias("session_end_us"),
        )
    )
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", args.sink)
        .option("checkpointLocation", args.ckpt)
        .trigger(processingTime=f"{TRIGGER_SEC} seconds")
        .queryName(f"soak_restart_{phase}")
        .start()
    )
    seen: set[int] = set()
    t0 = time.time()
    deadline = t0 + (args.seconds if phase == "resume" else 10 * 60)
    with open(args.progress, "a") as pf:
        while time.time() < deadline:
            time.sleep(0.5)
            for p in q.recentProgress:
                b = p["batchId"]
                if b in seen or not p.get("stateOperators"):
                    continue
                seen.add(b)
                so = p["stateOperators"][0]
                pf.write(
                    json.dumps(
                        {
                            "phase": phase,
                            "batch": b,
                            "trigger_ms": p["durationMs"].get("triggerExecution"),
                            "in_rows": p.get("numInputRows"),
                            "state_rows": so.get("numRowsTotal"),
                            "evicted": so.get("numRowsRemoved"),
                        }
                    )
                    + "\n"
                )
                pf.flush()
    q.stop()
    return 0


def _wait_for_batch(progress: str, phase: str, batch: int, timeout: float) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout:
        time.sleep(1.0)
        try:
            with open(progress) as f:
                for line in f:
                    r = json.loads(line)
                    if r["phase"] == phase and r["batch"] >= batch:
                        return True
        except FileNotFoundError:
            pass
    return False


def _spawn(phase: str, args) -> subprocess.Popen:
    cmd = [
        sys.executable, os.path.abspath(__file__), "--phase", phase,
        "--rate", str(args.rate), "--seconds", str(args.resume_seconds),
        "--ckpt", args.ckpt, "--sink", args.sink, "--progress", args.progress,
    ]
    # new session => own process group, so SIGKILL reaches the JVM too
    return subprocess.Popen(
        cmd, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="orchestrate")
    ap.add_argument("--rate", type=int, default=5000)
    ap.add_argument("--kill-batch", type=int, default=15)
    ap.add_argument("--resume-seconds", type=int, default=40)
    ap.add_argument("--seconds", type=int, default=40)  # child resume budget
    ap.add_argument("--ckpt")
    ap.add_argument("--sink")
    ap.add_argument("--progress")
    ap.add_argument("--out", default="SOAK_r12_restart.log")
    args = ap.parse_args()

    if args.phase in ("run", "resume"):
        return _child(args.phase, args)

    work = tempfile.mkdtemp(prefix="soak_restart_")
    args.ckpt = os.path.join(work, "ckpt")
    args.sink = os.path.join(work, "sink")
    args.progress = os.path.join(work, "progress.jsonl")

    log_lines: list[str] = []

    def log(msg: str) -> None:
        log_lines.append(msg)
        print(msg, flush=True)

    log(
        f"== restart soak ({time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}) "
        f"rate={args.rate} rows/s, trigger={TRIGGER_SEC}s, gap={GAP_SEC}s, "
        f"watermark={WATERMARK_SEC}s, kill at batch>={args.kill_batch}, "
        f"resume {args.resume_seconds}s"
    )

    # ---- phase 1: run, then SIGKILL the process group mid-batch
    child = _spawn("run", args)
    try:
        reached = _wait_for_batch(
            args.progress, "run", args.kill_batch, timeout=8 * 60
        )
        if not reached:
            log("FAIL: run phase never reached the kill batch")
            os.killpg(child.pid, signal.SIGKILL)
            return 1
        os.killpg(child.pid, signal.SIGKILL)
        child.wait(timeout=30)
        log(f"killed run-phase process group at batch>={args.kill_batch} (SIGKILL)")
    except Exception:
        os.killpg(child.pid, signal.SIGKILL)
        raise

    # ---- phase 2: resume from the same checkpoint
    child = _spawn("resume", args)
    rc = child.wait(timeout=args.resume_seconds + 8 * 60)
    log(f"resume phase exited rc={rc}")

    # ---- verify
    rows = [json.loads(line) for line in open(args.progress)]
    for r in rows:
        log(f"  {json.dumps(r)}")
    run_rows = [r for r in rows if r["phase"] == "run"]
    res_rows = [r for r in rows if r["phase"] == "resume"]

    pre_plateau = max(r["state_rows"] or 0 for r in run_rows)
    res_state = [r["state_rows"] or 0 for r in res_rows]
    res_max = max(res_state) if res_state else 0
    # (b) state resumes: back into the plateau band quickly, under cap
    state_resumed = (
        res_max >= SESS_PLATEAU_MIN and res_max <= SESS_CAP
        and pre_plateau <= SESS_CAP
    )
    # (c) p95 over post-recovery batches (skip first 3) within bound
    lat = sorted(
        r["trigger_ms"] for r in res_rows[3:] if r["trigger_ms"] is not None
    )
    p95 = (
        lat[min(len(lat) - 1, math.ceil(0.95 * len(lat)) - 1)] if lat else None
    )
    latency_recovered = p95 is not None and p95 <= TRIGGER_SEC * 1000 * 5

    # (a) exactly-once in the settled sink: batch-read THROUGH the
    # file-sink manifest; a replayed batch would duplicate closed
    # sessions keyed (user_id, session_start)
    from recommedation_system_under_flink_spark.session import get_spark

    spark = get_spark(app_name="soak_restart_verify")
    sink = spark.read.parquet(args.sink)
    total = sink.count()
    distinct = sink.select("user_id", "session_start_us").distinct().count()
    no_duplicates = total == distinct and total > 0

    summary = {
        "kill_batch": args.kill_batch,
        "run_batches": len(run_rows),
        "resume_batches": len(res_rows),
        "pre_kill_state_plateau_rows": pre_plateau,
        "resume_max_state_rows": res_max,
        "state_cap_rows": SESS_CAP,
        "sink_rows": total,
        "sink_distinct_sessions": distinct,
        "no_duplicates": no_duplicates,
        "state_resumed": state_resumed,
        "resume_p95_trigger_ms": p95,
        "latency_recovered": latency_recovered,
    }
    ok = no_duplicates and state_resumed and latency_recovered
    log(f"SUMMARY {json.dumps(summary)}")
    log(f"RESULT {'PASS' if ok else 'FAIL'}")
    with open(args.out, "w") as f:
        f.write("\n".join(log_lines) + "\n")
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"pass": ok, **summary}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
