"""Distributed exclusive prefix sums — the two-phase cumulative-sum
helper (round-11 verdict item 6).

A ``SUM(...) OVER (ORDER BY x)`` with no PARTITION BY plans as a
single-partition ``WindowExec`` ("Moving all data to a single
partition") — fine over an O(days) spine, a scale bug over anything
corpus-shaped. The classic fix (proven in ``samp_pps_systematic``):

1. bucket rows by a MONOTONE function of the sort key,
2. window only WITHIN buckets (``PARTITION BY bucket`` — distributed),
3. add each bucket's offset = the total of all strictly-smaller
   buckets.

This helper runs phase 3 without any window at all: bucket totals are
an O(#buckets) relation, and offsets come from a broadcast triangular
self-join (``b2.bkt < b1.bkt``) + re-aggregation — O(B²) arithmetic on
a tiny relation, zero single-partition stages anywhere in the plan.
``#buckets`` is bounded by the sort key's domain (e.g. the integer
money range for cent-gridded values), never by the row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_cum_before(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    bucket: Column,
    out_prefix: str = "cum_before_",
) -> DataFrame:
    """Append exclusive running sums of each ``sum_cols`` entry under
    the global ordering ``order_col`` — the two-phase shape above.

    ``bucket`` MUST be monotone non-decreasing in ``order_col`` (e.g.
    ``F.floor(F.col(order_col) / width)``), or the decomposition is
    wrong. ``order_col`` values must be distinct per row (aggregate to
    per-distinct-value counts first — the aggregation-first discipline
    this helper assumes).

    Output columns: ``{out_prefix}{c}`` for each ``c`` in ``sum_cols``.
    """
    b = df.withColumn("_bkt", bucket)
    btot = b.groupBy("_bkt").agg(
        *[F.sum(c).alias(f"_bs_{c}") for c in sum_cols]
    )
    rhs = btot.select(
        F.col("_bkt").alias("_bkt2"),
        *[F.col(f"_bs_{c}").alias(f"_bs2_{c}") for c in sum_cols],
    )
    offsets = (
        btot.join(F.broadcast(rhs), F.col("_bkt2") < F.col("_bkt"), "left")
        .groupBy("_bkt")
        .agg(
            *[
                F.coalesce(F.sum(f"_bs2_{c}"), F.lit(0)).alias(f"_off_{c}")
                for c in sum_cols
            ]
        )
    )
    w_in = Window.partitionBy("_bkt").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = b.join(F.broadcast(offsets), "_bkt")
    for c in sum_cols:
        out = out.withColumn(
            f"{out_prefix}{c}",
            F.col(f"_off_{c}")
            + F.coalesce(F.sum(c).over(w_in), F.lit(0)),
        )
    return out.drop(
        "_bkt", *[f"_off_{c}" for c in sum_cols]
    )
