"""Round-10 additions: ``Scene.similarity_algorithm`` is live config —
the kernel enum (SimilarityAlgorithm.java:6-9) dispatched at
TF_IDF.java:195-200 / TextRank.java:267-274 now reaches J3 and both
recommend() pipelines. The inverted-index F8 form is cross-validated
against a reference-shaped naive crossJoin + map-kernel twin, and the
registered *_dot entries are pinned to the dispatch path (flipping the
one reference config knob gives exactly the registered variant).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recommedation_system_under_flink_spark.config import (
    DEFAULT_SCENE,
    Scene,
    SimilarityAlgorithm,
)
from recommedation_system_under_flink_spark.functions.kernels import (
    dot_product,
    dot_product_sql,
)

SF_DIR = "/root/testdata/sf0.001"

EUCLID = Scene(similarity_algorithm=SimilarityAlgorithm.EUCLIDEAN_DISTANCE)


def _rows(df, cols=("user_id", "news_id", "score")):
    return sorted(
        (tuple(r[c] for c in cols[:-1]) + (round(r[cols[-1]], 9),))
        for r in df.collect()
    )


def test_j3_dispatch_routes_euclid_to_registered_dot(spark):
    """Flipping the Scene knob through the SAME entrypoint a user calls
    must give exactly the registered EUCLIDEAN_DISTANCE variant."""
    from recommedation_system_under_flink_spark.operators.joins import (
        j3_scored_join,
        j3_scored_join_dot,
    )

    via_scene = _rows(j3_scored_join(spark, SF_DIR, scene=EUCLID))
    registered = _rows(j3_scored_join_dot(spark, SF_DIR))
    assert via_scene == registered
    assert len(registered) > 0


def test_j3_dot_differs_from_cosine(spark):
    """The dispatch must actually change the kernel: F8 scores are
    weight products, not count ratios."""
    from recommedation_system_under_flink_spark.operators.joins import (
        j3_scored_join,
    )

    cosine = dict(
        ((r["user_id"], r["news_id"]), r["score"])
        for r in j3_scored_join(spark, SF_DIR).collect()
    )
    dot = dict(
        ((r["user_id"], r["news_id"]), r["score"])
        for r in j3_scored_join(spark, SF_DIR, scene=EUCLID).collect()
    )
    # same candidate pairs (both kernels are supported on the term
    # intersection; all weights in this corpus are > 0)
    assert set(cosine) == set(dot)
    diffs = sum(1 for k in cosine if abs(cosine[k] - dot[k]) > 1e-12)
    assert diffs > 0


def test_j3_dot_equals_naive_cross_kernel_twin(spark):
    """Algebraic cross-validation (the j3_scored_join_naive pattern):
    the inverted-index SUM(u·n) must equal the reference-shaped
    crossJoin + F8 map kernel (EuclideanDistance.java:29-43) + P6."""
    from recommedation_system_under_flink_spark.operators.joins import (
        _news_window_keywords,
        j1_user_docs_semijoin,
        j3_scored_join_dot,
    )

    user_maps = (
        j1_user_docs_semijoin(spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("term", "weight"))).alias("u"))
    )
    news_maps = (
        _news_window_keywords(spark, SF_DIR)
        .groupBy("news_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("term", "weight"))).alias("n"))
    )
    naive = (
        user_maps.crossJoin(F.broadcast(news_maps))
        .select("user_id", "news_id", dot_product_sql("u", "n").alias("score"))
        .filter(F.col("score") > 0)
    )
    assert _rows(naive) == _rows(j3_scored_join_dot(spark, SF_DIR))


def test_j3_dot_matches_pure_python_kernel(spark):
    """Ground truth: per-pair scores equal the pure-Python F8 kernel on
    the collected keyword maps."""
    from recommedation_system_under_flink_spark.operators.joins import (
        _news_window_keywords,
        j1_user_docs_semijoin,
        j3_scored_join_dot,
    )

    u_maps: dict[int, dict[str, float]] = {}
    for r in j1_user_docs_semijoin(spark, SF_DIR).collect():
        u_maps.setdefault(r["user_id"], {})[r["term"]] = r["weight"]
    n_maps: dict[int, dict[str, float]] = {}
    for r in _news_window_keywords(spark, SF_DIR).collect():
        n_maps.setdefault(r["news_id"], {})[r["term"]] = r["weight"]

    got = {
        (r["user_id"], r["news_id"]): r["score"]
        for r in j3_scored_join_dot(spark, SF_DIR).collect()
    }
    want = {
        (u, n): dot_product(uk, nk)
        for u, uk in u_maps.items()
        for n, nk in n_maps.items()
        if dot_product(uk, nk) > 0
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9)


def test_pipeline_dispatch_routes_to_registered_dot(spark):
    """Both recommend() pipelines accept the scene and route it to the
    scored join; the registered *_dot entries pin that path."""
    from recommedation_system_under_flink_spark.plans.pipelines import (
        textrank_pipeline_distributed,
        textrank_pipeline_distributed_dot,
        tfidf_pipeline,
        tfidf_pipeline_dot,
    )

    cols = ("user_id", "news_id", "rank", "score")
    assert _rows(tfidf_pipeline(spark, SF_DIR, scene=EUCLID), cols) == _rows(
        tfidf_pipeline_dot(spark, SF_DIR), cols
    )
    assert _rows(
        textrank_pipeline_distributed(spark, SF_DIR, scene=EUCLID), cols
    ) == _rows(textrank_pipeline_distributed_dot(spark, SF_DIR), cols)
    # default scene stays the cosine form (regression: dispatch must
    # not change the certified canary)
    assert _rows(tfidf_pipeline(spark, SF_DIR), cols) == _rows(
        tfidf_pipeline(spark, SF_DIR, scene=DEFAULT_SCENE), cols
    )
