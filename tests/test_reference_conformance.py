"""Single-file conformance sweep over EVERY pinned reference
divergence (round-11 verdict item 7).

COVERAGE.md's "## Pinned engine specs" section lists the places where
the engine either replicates a reference quirk bit-for-bit or pins a
documented divergence. Each row there maps to a case class below with
HAND-COMPUTED reference-semantics fixtures, so a future refactor
cannot silently un-pin one: this file fails if the behavior drifts,
and ``test_every_pinned_row_is_covered`` fails if the COVERAGE.md
section itself is renamed or a row removed without updating the sweep.

Pinned rows covered (COVERAGE.md §Pinned engine specs):

1. Tokenizer (F1)      — lowercase → split ``[^a-z0-9]+`` → drop
                         empties → drop the 19-word stop list.
2. Ranking tiebreaks   — ``score DESC, id ASC``; float sort keys
                         quantized to 6 decimals before row_number.
3. F2 window clamp     — intended clamp by default;
                         ``replicate_reference_bug=True`` reproduces
                         TextRank.java:183-186 (left-only neighbors,
                         right-edge reset to 0, self-edges kept).
4. Kernels F5/F8       — F5 product-not-√product denominator
                         (CosineSimilarity.java:118-126); F8 is a dot
                         product despite the class name
                         (EuclideanDistance.java:29-43); empty inputs
                         → 0.0 (reference: ``0d/0`` = NaN) so
                         ``score > 0`` filters behave identically.

Plus the kernel-docstring divergences that ride along: F7's
dedup-instead-of-double-count union (kernels.py) and F4's
missing-scores-read-0 / self-edge-skip semantics
(TextRank.java:208-209).
"""

from __future__ import annotations

import math

import pytest

from recommedation_system_under_flink_spark.functions.kernels import (
    boolean_overlap,
    calculate_x,
    dot_product,
)
from recommedation_system_under_flink_spark.functions.text import (
    STOPWORDS,
    cooccurrence_clique,
    cooccurrence_windowed,
    textrank_vote,
    token_counts,
    tokenize,
)


# --------------------------------------------------- row 1: tokenizer (F1)

TOKENIZER_CASES = [
    # (case_id, text, expected tokens under the pinned spec)
    ("mixed-case-punct", "The Quick-Brown fox's 42 jumps!",
     ["quick", "brown", "fox", "s", "42", "jumps"]),
    ("all-stopwords", " ".join(STOPWORDS), []),
    ("empty", "", []),
    ("none", None, []),
    ("digits-kept", "a1 b2c3 4", ["a1", "b2c3", "4"]),
    ("unicode-split", "naïve café", ["na", "ve", "caf"]),  # non-[a-z0-9] splits
]


@pytest.mark.parametrize(
    "text,expected", [c[1:] for c in TOKENIZER_CASES],
    ids=[c[0] for c in TOKENIZER_CASES],
)
def test_pinned_tokenizer_spec(text, expected):
    assert tokenize(text) == expected


def test_pinned_stop_list_is_exactly_19_words():
    # the stop list is part of the engine spec mirrored into every SQL
    # oracle; its SIZE is pinned here so an edit is a deliberate act
    assert len(STOPWORDS) == 19
    assert list(STOPWORDS) == sorted(STOPWORDS)


def test_token_counts_keeps_duplicates():
    assert token_counts("dog cat dog") == {"dog": 2, "cat": 1}


# ------------------------------------------- row 3: F2 window clamp modes

def test_f2_intended_clamp_hand_trace():
    # tokens a b c d, window 2 — symmetric ±2 neighbors, no self edges
    adj = cooccurrence_windowed(["a", "b", "c", "d"], 2)
    assert adj == {
        "a": {"b", "c"},
        "b": {"a", "c", "d"},
        "c": {"a", "b", "d"},
        "d": {"b", "c"},
    }


def test_f2_reference_bug_mode_hand_trace():
    # TextRank.java:183-186 traced by hand: the cursor loop stops at
    # `cursor != index` (left neighbors only), and a right edge past
    # the end resets to 0, so tail tokens see at most tokens[0]
    adj = cooccurrence_windowed(["a", "b", "c", "d"], 2,
                                replicate_reference_bug=True)
    assert adj == {"a": set(), "b": {"a"}, "c": {"a"}, "d": set()}


def test_f2_reference_bug_mode_keeps_self_edges():
    # repeated word at the tail: bug mode adds tokens[0] even when it
    # equals the current word (self-edge kept; the reference dedups
    # only inside vote, TextRank.java:208)
    adj = cooccurrence_windowed(["x", "y", "x", "z"], 2,
                                replicate_reference_bug=True)
    assert adj == {"x": {"x"}, "y": {"x"}, "z": set()}
    # intended mode on the same input: no self/same-word edges
    assert cooccurrence_windowed(["x", "y", "x", "z"], 2) == {
        "x": {"y", "z"},
        "y": {"x", "z"},
        "z": {"x", "y"},
    }


def test_f3_clique_hand_trace():
    adj = cooccurrence_clique(["p", "q", "p", "r"])
    assert adj == {"p": {"q", "r"}, "q": {"p", "r"}, "r": {"p", "q"}}


# ------------------------------------- row 4: F5/F8 quirks + empty inputs

def test_f5_denominator_is_product_not_sqrt_product():
    # 2 shared words, |k1|=2, |k2|=8: the reference returns
    # 2/(2·8)=0.125 (CosineSimilarity.java:118-126) — true cosine
    # would be 2/√16 = 0.5
    k1 = {"w1": 1.0, "w2": 1.0}
    k2 = {f"w{i}": 1.0 for i in range(1, 9)}
    got = calculate_x(k1, k2)
    assert got == 2 / (2 * 8) == 0.125
    assert got != 2 / math.sqrt(2 * 8)


def test_f8_is_a_dot_product_despite_the_name():
    # EuclideanDistance.java:29-43 sums v1(w)·v2(w) over shared words —
    # a SIMILARITY (higher = closer), not any distance
    k1 = {"a": 2.0, "b": 3.0, "c": 1.0}
    k2 = {"b": 4.0, "c": 5.0, "d": 9.0}
    got = dot_product(k1, k2)
    assert got == 3.0 * 4.0 + 1.0 * 5.0 == 17.0
    assert got != math.sqrt((3 - 4) ** 2 + (1 - 5) ** 2)  # ≈4.123


EMPTY_INPUT_CASES = [
    ("f5-empty-left", calculate_x, ({}, {"a": 1.0})),
    ("f5-none-right", calculate_x, ({"a": 1.0}, None)),
    ("f5-both-empty", calculate_x, ({}, {})),
    ("f8-empty-left", dot_product, ({}, {"a": 1.0})),
    ("f8-none-both", dot_product, (None, None)),
    ("f7-empty-after-dedup", boolean_overlap, ([""], ["w"])),
]


@pytest.mark.parametrize(
    "fn,args", [c[1:] for c in EMPTY_INPUT_CASES],
    ids=[c[0] for c in EMPTY_INPUT_CASES],
)
def test_pinned_empty_inputs_score_zero_not_nan(fn, args):
    # reference: Java `0d/0` → NaN (CosineSimilarity.java:48,126);
    # engine pins 0.0 so `score > 0` (TextRank.java:275) filters the
    # same rows without NaN propagation
    got = fn(*args)
    assert got == 0.0 and not math.isnan(got)


def test_f7_dedups_duplicate_words_documented_divergence():
    # the reference double-counts duplicate words in keywords1's union
    # build; the engine dedups (kernels.py docstring) — pinned: 0.5
    assert boolean_overlap(["w", "w", "v"], ["w"]) == 1 / (2 * 1)


# ------------------------------- F4 vote: missing-read-0 / self-edge skip

def test_f4_first_round_from_empty_scores_is_one_minus_d():
    # missing scores read as 0 (TextRank.java:209): round 1 yields 1-d
    adj = {"a": {"b"}, "b": {"a"}}
    scores = textrank_vote(adj, 2, friction=0.85, max_iterates=1)
    assert scores == {"a": pytest.approx(0.15), "b": pytest.approx(0.15)}


def test_f4_self_edge_is_skipped_in_the_sum():
    # TextRank.java:208 skips n == w; with a self-edge present in the
    # adjacency, round 2 must still be (1-d) + d·(1-d)/deg(b)
    adj = {"a": {"a", "b"}, "b": {"a"}}
    scores = textrank_vote(adj, 2, friction=0.85, max_iterates=2,
                           min_difference=0.0)
    assert scores["a"] == pytest.approx(0.15 + 0.85 * 0.15)  # not 0.341…


def test_f4_two_node_fixed_point_is_one():
    scores = textrank_vote({"a": {"b"}, "b": {"a"}}, 2, friction=0.85,
                           max_iterates=200, min_difference=1e-12)
    assert scores["a"] == pytest.approx(1.0, abs=1e-9)
    assert scores["b"] == pytest.approx(1.0, abs=1e-9)


# ------------------------------------ row 2: ranking tiebreak discipline

def test_pinned_ranking_tiebreak_quantize_then_id_asc(spark):
    """Float sort keys are 6-dp-quantized before row_number, ties break
    ``id ASC``: two scores an ulp apart must rank by id, not by the
    un-quantized float."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.operators.quantize import (
        ppm_value,
    )

    rows = [(1, 10, 0.1 + 1e-10), (1, 2, 0.1), (1, 7, 0.2)]
    df = spark.createDataFrame(rows, "user_id int, news_id int, score double")
    w = Window.partitionBy("user_id").orderBy(
        F.desc(ppm_value(F.col("score"))), F.asc("news_id")
    )
    ranked = {
        r.news_id: r.rank
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    # 0.2 first; then the 6-dp tie 0.1 vs 0.1+1e-10 resolves by id ASC
    assert ranked == {7: 1, 2: 2, 10: 3}


# ----------------------------------------------- completeness guard

def test_every_pinned_row_is_covered():
    """Fails if COVERAGE.md's pinned-spec section is renamed or a row
    disappears without this sweep being updated (the un-pinning guard
    the round-11 verdict asked for)."""
    text = open("COVERAGE.md").read()
    start = text.index("## Pinned engine specs")
    section = text[start : text.index("\n## ", start + 1)] if "\n## " in text[start + 1 :] else text[start:]
    for marker in (
        "Tokenizer (F1)",
        "Ranking tiebreaks",
        "F2 window clamp",
        "Kernels F5/F8",
    ):
        assert marker in section, f"pinned row {marker!r} missing from COVERAGE.md"
