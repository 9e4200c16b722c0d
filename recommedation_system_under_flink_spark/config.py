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


def _coerce_int(key: str, v) -> int:
    # bool is an int subclass; a JSON `true` for num_days is a config
    # bug, not a 1
    if isinstance(v, bool):
        raise ValueError(f"Scene config key {key!r}: expected int, got {v!r}")
    if isinstance(v, int):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            pass
    raise ValueError(f"Scene config key {key!r}: expected int, got {v!r}")


def _coerce_float(key: str, v) -> float:
    if isinstance(v, bool):
        raise ValueError(f"Scene config key {key!r}: expected float, got {v!r}")
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            pass
    raise ValueError(f"Scene config key {key!r}: expected float, got {v!r}")


def scene_from_dict(d: dict) -> Scene:
    """Inverse of :func:`scene_to_dict`. Unknown keys are an error
    (a typo'd hyperparameter must fail loudly, not silently default),
    and so are wrong-typed values — a ``"7"`` for ``num_days`` or a
    ``3`` for ``friction`` is coerced against the dataclass annotation,
    anything uncoercible raises naming the key (it must not surface as
    an obscure failure deep inside a pipeline). Missing keys take the
    dataclass defaults."""
    import dataclasses

    fields = set(scene_to_dict(DEFAULT_SCENE))
    unknown = set(d) - fields
    if unknown:
        raise ValueError(f"unknown Scene config keys: {sorted(unknown)}")
    types = {f.name: f.type for f in dataclasses.fields(Scene)}
    kw: dict = dict(d)
    for k in ("from_date", "to_date"):
        if k in kw:
            if isinstance(kw[k], dt.date):
                continue
            if not isinstance(kw[k], str):
                raise ValueError(
                    f"Scene config key {k!r}: expected ISO date string, "
                    f"got {kw[k]!r}"
                )
            try:
                kw[k] = dt.date.fromisoformat(kw[k])
            except ValueError:
                raise ValueError(
                    f"Scene config key {k!r}: expected ISO date string, "
                    f"got {kw[k]!r}"
                ) from None
    if "similarity_algorithm" in kw:
        v = kw["similarity_algorithm"]
        if not isinstance(v, SimilarityAlgorithm):
            if not isinstance(v, str) or v not in SimilarityAlgorithm.__members__:
                raise ValueError(
                    "Scene config key 'similarity_algorithm': expected one "
                    f"of {sorted(SimilarityAlgorithm.__members__)}, got {v!r}"
                )
            kw["similarity_algorithm"] = SimilarityAlgorithm[v]
    for k, v in list(kw.items()):
        # `from __future__ import annotations` → f.type is a string
        if types[k] == "int":
            kw[k] = _coerce_int(k, v)
        elif types[k] == "float":
            kw[k] = _coerce_float(k, v)
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
