"""operators/prefix.py — the two-phase distributed prefix sum must
equal the naive single-partition running sum bit-for-bit (it replaces
one in ev_ks_drift / ev_trimmed_mean / ef_mannwhitney_u, round-11
verdict item 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from recommedation_system_under_flink_spark.operators.prefix import (
    with_cum_before,
)


def _fixture(spark, n=500):
    # distinct, unevenly spaced sort keys spanning negative values so
    # bucket boundaries and empty buckets are both exercised
    rows = [
        (float(i * 7 % 997) - 300.0, (i * 13) % 50 + 1, (i * 31) % 9)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "x double, a long, b long").dropDuplicates(["x"])


@pytest.mark.parametrize("width", [8.0, 64.0, 10_000.0])
def test_matches_naive_global_cumsum(spark, width):
    df = _fixture(spark)
    got = with_cum_before(
        df, "x", ["a", "b"], F.floor(F.col("x") / width).cast("long")
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    want = df.select(
        "x",
        F.coalesce(F.sum("a").over(w), F.lit(0)).alias("cum_before_a"),
        F.coalesce(F.sum("b").over(w), F.lit(0)).alias("cum_before_b"),
    )
    got_m = {r["x"]: (r["cum_before_a"], r["cum_before_b"]) for r in got.collect()}
    want_m = {r["x"]: (r["cum_before_a"], r["cum_before_b"]) for r in want.collect()}
    assert got_m == want_m


def test_no_single_partition_window_in_plan(spark):
    df = _fixture(spark)
    out = with_cum_before(
        df, "x", ["a"], F.floor(F.col("x") / 8.0).cast("long")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the in-bucket window must be partitioned; no empty partitionSpec
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_partition_count_independence(spark):
    # the decomposition must not depend on how the input is partitioned
    df = _fixture(spark)
    bucket = F.floor(F.col("x") / 8.0).cast("long")
    a = with_cum_before(df.repartition(1), "x", ["a"], bucket)
    b = with_cum_before(df.repartition(17, "a"), "x", ["a"], bucket)
    am = {r["x"]: r["cum_before_a"] for r in a.collect()}
    bm = {r["x"]: r["cum_before_a"] for r in b.collect()}
    assert am == bm
