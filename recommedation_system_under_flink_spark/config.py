"""Scene: the hyperparameter bundle threading through every pipeline.

Reconstructed from the reference's absent ``models.Scene`` class; every
field below is read at a cited call site (SURVEY.md §3.1):

- ``from_date``/``to_date``    — recommendation date range (TF_IDF.java:161)
- ``num_days``                 — trailing/leading window width (TF_IDF.java:166)
- ``num_recommendations``      — top-K news per user (TextRank.java:295)
- ``num_news_keywords``        — keywords kept per news doc (TextRank.java:65)
- ``num_user_keywords``        — keywords kept per user profile (TextRank.java:125)
- ``window_size``              — co-occurrence window (TextRank.java:65)
- ``friction``                 — TextRank damping d (TextRank.java:195)
- ``max_iterates``             — TextRank iteration cap (TextRank.java:198)
- ``min_difference``           — TextRank convergence epsilon (TextRank.java:214)
- ``similarity_algorithm``     — kernel enum (SimilarityAlgorithm.java:6-9,
  dispatched TF_IDF.java:195-200)
- ``title/description/content_weight`` — per-field term weights
  (TF_IDF.java:58-60)

Defaults are the engine's pinned choices (the reference ships no config
files in the snapshot).
"""

from __future__ import annotations

import datetime as dt
import enum
from dataclasses import dataclass


class SimilarityAlgorithm(enum.Enum):
    """SimilarityAlgorithm.java:6-9."""

    COSINE_SIMILARITY = "cosine_similarity"
    EUCLIDEAN_DISTANCE = "euclidean_distance"


@dataclass(frozen=True)
class Scene:
    from_date: dt.date = dt.date(2024, 1, 8)
    to_date: dt.date = dt.date(2024, 1, 31)  # exclusive, like DateIterator
    num_days: int = 7
    num_recommendations: int = 10
    num_news_keywords: int = 10
    num_user_keywords: int = 20
    window_size: int = 5
    friction: float = 0.85
    max_iterates: int = 100
    min_difference: float = 1e-4
    similarity_algorithm: SimilarityAlgorithm = SimilarityAlgorithm.COSINE_SIMILARITY
    title_weight: float = 3.0
    description_weight: float = 2.0
    content_weight: float = 1.0


#: "today" used by single-day oracle queries — the last full day of the
#: driver fixture event range (events span 2024-01-01..2024-01-30).
TODAY = dt.date(2024, 1, 30)

DEFAULT_SCENE = Scene()


# ------------------------------------------------ config as data
#
# The reference boots every job from a serialized config —
# ``Controller.loadConfig()`` / ``Controller.config.getCurrentScene()``
# (TF_IDF.java:36, TextRank.java:40-41; the Controller class itself is
# absent from the snapshot, so the FORMAT here is ours: one flat JSON
# object, dates ISO, enum by name). Round-tripping through a file is
# what lets a deployment pin hyperparameters next to the job instead
# of in code.

def scene_to_dict(scene: Scene) -> dict:
    """Flat JSON-able mapping (dates ISO-8601, enum by name)."""
    return {
        "from_date": scene.from_date.isoformat(),
        "to_date": scene.to_date.isoformat(),
        "num_days": scene.num_days,
        "num_recommendations": scene.num_recommendations,
        "num_news_keywords": scene.num_news_keywords,
        "num_user_keywords": scene.num_user_keywords,
        "window_size": scene.window_size,
        "friction": scene.friction,
        "max_iterates": scene.max_iterates,
        "min_difference": scene.min_difference,
        "similarity_algorithm": scene.similarity_algorithm.name,
        "title_weight": scene.title_weight,
        "description_weight": scene.description_weight,
        "content_weight": scene.content_weight,
    }


def scene_from_dict(d: dict) -> Scene:
    """Inverse of :func:`scene_to_dict`. Unknown keys are an error
    (a typo'd hyperparameter must fail loudly, not silently default);
    missing keys take the dataclass defaults."""
    fields = set(scene_to_dict(DEFAULT_SCENE))
    unknown = set(d) - fields
    if unknown:
        raise ValueError(f"unknown Scene config keys: {sorted(unknown)}")
    kw: dict = dict(d)
    for k in ("from_date", "to_date"):
        if k in kw:
            kw[k] = dt.date.fromisoformat(kw[k])
    if "similarity_algorithm" in kw:
        kw["similarity_algorithm"] = SimilarityAlgorithm[
            kw["similarity_algorithm"]
        ]
    return Scene(**kw)


def save_scene(scene: Scene, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(scene_to_dict(scene), f, indent=2, sort_keys=True)
        f.write("\n")


def load_scene(path: str) -> Scene:
    """``Controller.config.getCurrentScene()`` analogue: read the
    serialized scene a deployment ships next to the job."""
    import json

    with open(path) as f:
        return scene_from_dict(json.load(f))
