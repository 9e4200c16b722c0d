"""Shared plumbing for BSP-style iterative operators.

Every iterative operator here (PageRank, BFS, PPR, hash-min connected
components, distributed TextRank) has the same shape: persist the loop
invariants (edges, degrees, vocab), iterate K join+aggregate rounds,
emit a SMALL result (per-node labels/ranks — O(|keys|), not O(|input|)).
Two lifecycle problems follow at scale:

1. **Lineage depth.** Each round's DataFrame references the previous
   round's plan; after K rounds the plan is K levels deep, and anything
   that recomputes it (a retry, a second action) replays the whole
   chain. ``checkpoint_result`` truncates the final lineage with an
   eager ``localCheckpoint()``.
2. **Cache lifetime.** The persisted invariants must outlive the loop's
   LAZY result — unpersisting before the caller's action would silently
   recompute the loop without caching. Checkpointing first makes the
   unpersist safe, so a 150-query session doesn't accumulate orphaned
   cache entries (round-2 advice on graph_bfs_hops / p1 / a3).

``localCheckpoint`` stores partitions on executors (not a reliable
FS) — right for these small results and for local[32]. A 1000-executor
deployment with executor loss in scope would flip ``RELIABLE_CHECKPOINT
= True`` and set a ``spark.sparkContext.setCheckpointDir`` on durable
storage; the call sites don't change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Rounds between mid-loop lineage truncations (see checkpoint_round).
CHECKPOINT_EVERY = 5

#: Plan-audit mode (round-13, VERDICT r12 item 8): queries that end in
#: ``checkpoint_result`` normally explain() as the post-checkpoint
#: ``Scan ExistingRDD`` stub, which hides the executed lineage from the
#: committed plan dumps. Setting SPARK_GRAFT_PLAN_AUDIT=1 makes
#: ``checkpoint_result`` return the UN-truncated plan (and keep the
#: caches, so InMemoryRelation boundaries stay visible). Timing and
#: cache lifecycle are both wrong in this mode — it exists ONLY for
#: throwaway explain-dump sessions (scripts/plan_probe.py
#: --plan-audit), never for bench/gate runs.
_PLAN_AUDIT = os.environ.get("SPARK_GRAFT_PLAN_AUDIT", "") == "1"


def checkpoint_result(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize a BSP loop's (small) final result, truncating its
    K-round lineage, then release the loop's persisted invariants.

    The unpersist runs in ``finally``: if the eager checkpoint fails
    mid-materialization (executor loss, OOM in a loop join), the
    loop's caches must not leak into the rest of a long-lived
    gate/bench session (round-8 review finding on the ALS rewrite)."""
    if _PLAN_AUDIT:
        return result
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for df in cached:
            df.unpersist()


def checkpoint_round(df: DataFrame, round_idx: int) -> DataFrame:
    """Mid-loop cadence for UNBOUNDED loops (convergence-driven, e.g.
    hash-min components): every ``CHECKPOINT_EVERY`` rounds, cut the
    accumulated lineage so round R's plan depth is O(CHECKPOINT_EVERY),
    not O(R). Fixed-K loops (K ≤ ~4) don't need this — their depth is
    bounded by construction."""
    if round_idx > 0 and round_idx % CHECKPOINT_EVERY == 0:
        return df.localCheckpoint(eager=True)
    return df
