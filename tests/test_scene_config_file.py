"""Config-as-data round trip (round-10 verdict item 8): the reference
boots each job from a serialized config — ``Controller.loadConfig()`` /
``Controller.config.getCurrentScene()`` (TF_IDF.java:36,
TextRank.java:40-41) — while the engine previously constructed
``Scene`` in code only. These tests pin the file seam: save → load is
the identity, typo'd keys fail loudly, and a scene LOADED FROM DISK
drives the scored join to the same plan/rows as the code-built scene."""

from __future__ import annotations

import dataclasses
import datetime as dt

import pytest

from recommedation_system_under_flink_spark.config import (
    DEFAULT_SCENE,
    Scene,
    SimilarityAlgorithm,
    load_scene,
    save_scene,
    scene_from_dict,
    scene_to_dict,
)

SF_DIR = "/root/testdata/sf0.001"


def test_roundtrip_identity(tmp_path):
    p = str(tmp_path / "scene.json")
    save_scene(DEFAULT_SCENE, p)
    assert load_scene(p) == DEFAULT_SCENE


def test_roundtrip_non_default_fields(tmp_path):
    scene = Scene(
        from_date=dt.date(2024, 1, 10),
        num_days=3,
        num_recommendations=5,
        friction=0.5,
        similarity_algorithm=SimilarityAlgorithm.EUCLIDEAN_DISTANCE,
    )
    p = str(tmp_path / "scene.json")
    save_scene(scene, p)
    got = load_scene(p)
    assert got == scene
    assert got.similarity_algorithm is SimilarityAlgorithm.EUCLIDEAN_DISTANCE


def test_every_dataclass_field_serialized():
    # adding a Scene field without extending the serializer must fail
    # here, not silently drop the field on disk
    field_names = {f.name for f in dataclasses.fields(Scene)}
    assert set(scene_to_dict(DEFAULT_SCENE)) == field_names


def test_unknown_key_is_loud():
    with pytest.raises(ValueError, match="num_recomendations"):
        scene_from_dict({"num_recomendations": 5})  # typo'd key


def test_missing_keys_take_defaults():
    assert scene_from_dict({"num_days": 3}) == Scene(num_days=3)


def test_loaded_scene_drives_kernel_dispatch(spark, tmp_path):
    """The file seam end-to-end: a EUCLIDEAN_DISTANCE scene loaded
    from disk must produce the registered dot-kernel join's rows."""
    from recommedation_system_under_flink_spark.operators.joins import (
        j3_scored_join,
    )
    from recommedation_system_under_flink_spark import registry

    p = str(tmp_path / "scene.json")
    save_scene(
        Scene(similarity_algorithm=SimilarityAlgorithm.EUCLIDEAN_DISTANCE), p
    )
    from_file = j3_scored_join(spark, SF_DIR, scene=load_scene(p)).collect()
    registered = registry.queries()["j3_scored_join_dot"](spark, SF_DIR).collect()
    # both sides run the identical builder/plan, so exact row equality
    # (floats included) is the right check; sort by the business key,
    # not by accidental tuple order
    def key(r):
        return (r["user_id"], r["news_id"])

    assert [tuple(r) for r in sorted(from_file, key=key)] == [
        tuple(r) for r in sorted(registered, key=key)
    ]
    assert from_file  # non-degenerate
