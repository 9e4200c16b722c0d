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
