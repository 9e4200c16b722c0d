"""Unit fixtures + property tests for F5-F10 similarity kernels.

Hand-computed cases mirror the reference arithmetic at the cited lines
(CosineSimilarity.java, EuclideanDistance.java).
"""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from recommedation_system_under_flink_spark.functions.kernels import (
    boolean_overlap,
    calculate_max,
    calculate_x,
    dot_product,
    fuzzy_overlap,
    positive_correlation,
    rank_weighted_distance,
)

# bounded word/value strategies keep cases readable on failure
_words = st.text(alphabet="abcdefg", min_size=1, max_size=3)
_kwmap = st.dictionaries(_words, st.floats(0.01, 10), max_size=8)


# --------------------------------------------------------------- F5

def test_calculate_x_hand_case():
    # |{b}| / (2*2) — CosineSimilarity.java:118-126 (product, NOT √product)
    assert calculate_x({"a": 1, "b": 2}, {"b": 3, "c": 4}) == 0.25


def test_calculate_x_disjoint_and_empty():
    assert calculate_x({"a": 1}, {"b": 1}) == 0.0
    assert calculate_x({}, {"a": 1}) == 0.0  # engine-pinned 0.0 (ref: NaN)
    assert calculate_x(None, {"a": 1}) == 0.0


@given(_kwmap, _kwmap)
def test_calculate_x_symmetric_and_bounded(k1, k2):
    s = calculate_x(k1, k2)
    assert s == calculate_x(k2, k1)
    assert 0.0 <= s <= 1.0


# --------------------------------------------------------------- F6

def test_fuzzy_overlap_judge_case():
    # num = min(2,3)^2 = 4; union a:1,b:3,c:4 -> den = 1+9+16 = 26
    assert fuzzy_overlap({"a": 1, "b": 2}, {"b": 3, "c": 4}) == 4 / 26


def test_fuzzy_overlap_identical_is_one():
    k = {"x": 2.0, "y": 3.0}
    assert fuzzy_overlap(k, k) == 1.0


@given(_kwmap, _kwmap)
def test_fuzzy_overlap_bounded(k1, k2):
    s = fuzzy_overlap(k1, k2)
    assert 0.0 <= s <= 1.0
    # symmetric only to float tolerance: the union-denominator sum runs
    # in dict-insertion order, and float addition is non-associative
    # (the reference has the same property via HashMap iteration)
    assert s == pytest.approx(fuzzy_overlap(k2, k1), rel=1e-12)


# --------------------------------------------------------------- F7

def test_boolean_overlap():
    assert boolean_overlap(["a", "b"], ["b", "c"]) == 0.25
    assert boolean_overlap([], ["a"]) == 0.0
    assert boolean_overlap(None, None) == 0.0


# --------------------------------------------------------------- F8

def test_dot_product_hand_case():
    # EuclideanDistance.java:29-43: sum over shared words only
    assert dot_product({"a": 2, "b": 3}, {"b": 4, "c": 5}) == 12.0
    assert dot_product({"a": 1}, {"b": 1}) == 0.0
    assert dot_product(None, {"a": 1}) == 0.0


@given(_kwmap, _kwmap)
def test_dot_product_symmetric_nonnegative(k1, k2):
    s = dot_product(k1, k2)
    assert s == pytest.approx(dot_product(k2, k1), rel=1e-12)
    assert s >= 0.0  # values strategy is positive


# ---------------------------------------------------------- F9 / F10

def test_rank_weighted_distance_cases():
    # identical single-word lists cancel exactly (EuclideanDistance.java:52-83)
    assert rank_weighted_distance(["x"], ["x"]) == 0
    # disjoint singles: 1^2 (unmatched k1) + 1^2 (leftover k2) = 2
    assert rank_weighted_distance(["a"], ["b"]) == 2


def test_positive_correlation_case():
    # single shared word at top rank: 1*1 (EuclideanDistance.java:94-112)
    assert positive_correlation(["a"], ["a"], 1, 1) == 1
    assert positive_correlation(["a"], ["b"], 1, 1) == 0


def test_calculate_max_case():
    # len1=len2=1: both loops add 1*1 once -> 2 (EuclideanDistance.java:154-164)
    assert calculate_max(1, 1) == 2
    # len1=2, len2=1: first loop (step len1) adds 2*2; second loop
    # (step len2) adds 2*2 + 1*1 -> 9
    assert calculate_max(2, 1) == 9


def test_sql_twins_match_python_kernels(spark):
    """Every kernel SQL twin must agree with its pure-Python form on
    hand cases: overlaps, disjoint, empty, single-element, and ties."""
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.functions.kernels import (
        boolean_overlap,
        boolean_overlap_sql,
        calculate_max,
        calculate_max_sql,
        calculate_x,
        calculate_x_sql,
        dot_product,
        dot_product_sql,
        fuzzy_overlap,
        fuzzy_overlap_sql,
        positive_correlation,
        positive_correlation_sql,
        rank_weighted_distance,
        rank_weighted_distance_sql,
    )

    map_cases = [
        ({"a": 1.0, "b": 2.0}, {"b": 3.0, "c": 4.0}),
        ({"a": 1.5}, {"a": 1.5}),
        ({"a": 1.0, "b": 2.0, "c": 3.0}, {"d": 1.0}),
        ({"x": 0.25}, {"x": 4.0, "y": 0.5, "z": 2.0}),
        ({}, {"a": 1.0}),
        ({}, {}),
    ]
    df = spark.createDataFrame(
        [(i, k1, k2) for i, (k1, k2) in enumerate(map_cases)],
        "id long, k1 map<string,double>, k2 map<string,double>",
    )
    got = {
        r["id"]: (r["x"], r["f"], r["d"])
        for r in df.select(
            "id",
            calculate_x_sql("k1", "k2").alias("x"),
            fuzzy_overlap_sql("k1", "k2").alias("f"),
            dot_product_sql("k1", "k2").alias("d"),
        ).collect()
    }
    for i, (k1, k2) in enumerate(map_cases):
        assert got[i][0] == pytest.approx(calculate_x(k1, k2)), f"F5 case {i}"
        assert got[i][1] == pytest.approx(fuzzy_overlap(k1, k2)), f"F6 case {i}"
        assert got[i][2] == pytest.approx(dot_product(k1, k2)), f"F8 case {i}"

    list_cases = [
        (["a", "b", "c"], ["b", "c", "d"]),
        (["a"], ["a"]),
        (["a", "b"], ["c", "d"]),
        (["w", "x", "y", "z"], ["z"]),
        ([], ["a"]),
        ([], []),
    ]
    df2 = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(list_cases)],
        "id long, t1 array<string>, t2 array<string>",
    )
    got2 = {
        r["id"]: (r["b"], r["r"], r["p"], r["m"])
        for r in df2.select(
            "id",
            boolean_overlap_sql("t1", "t2").alias("b"),
            rank_weighted_distance_sql("t1", "t2").alias("r"),
            positive_correlation_sql("t1", "t2").alias("p"),
            calculate_max_sql(
                F.size("t1").cast("long"), F.size("t2").cast("long")
            ).alias("m"),
        ).collect()
    }
    for i, (a, b) in enumerate(list_cases):
        assert got2[i][0] == pytest.approx(boolean_overlap(a, b)), f"F7 case {i}"
        assert got2[i][1] == rank_weighted_distance(a, b), f"F9 case {i}"
        assert got2[i][2] == positive_correlation(a, b, len(a), len(b)), f"F10 case {i}"
        assert got2[i][3] == pytest.approx(calculate_max(len(a), len(b))), f"max case {i}"
