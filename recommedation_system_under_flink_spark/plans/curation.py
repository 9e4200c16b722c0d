"""End-to-end LLM training-data curation pipeline.

The LLM-ops flagship: compose the curation stages every pre-training
corpus goes through — exact dedup (keep the canonical copy), language
gate, quality gate, split assignment — into one declarative plan:

    documents
      ├─ canonical:  min doc_id per sha2(text)   (exact dedup)
      ├─ language:   marker-token argmax          (ts_lang_id)
      ├─ quality:    [0,1] heuristic              (ts_quality_score)
      └─ split:      pinned-hash train/val/test   (samp_split_assign)
    → keep canonical ∧ lang='en' ∧ quality ≥ MIN, tagged with split

Each stage is the already-oracle-verified operator, and the pipeline
oracle **embeds the component oracle SQL verbatim** (pulled from the
registry at import time), so the composition can never drift from the
parts.

Scale notes (100 TB): the stages join on ``doc_id`` — co-partitioned
after the first shuffle, and each stage is scan-speed (no shuffle)
except dedup's hash groupBy. The joins keep the plan modular; a fused
single-pass form (all stage columns in one projection + one aggregate)
halves the scans and is the documented optimization if the four
documents scans ever dominate — at 100 TB the scans are the cheap part
next to dedup's shuffle, and AQE picks broadcast for the canonical
side when a lang/quality-filtered partition shrinks enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import samp_split_assign
from ..operators.textstats import ts_lang_id, ts_quality_score
from ..registry import _REGISTRY, register
from ..sources import load_raw

#: Minimum quality score a document must reach to survive curation.
QUALITY_MIN = 0.5
#: The language gate (the fixture corpus is majority-English).
KEEP_LANG = "en"

# Component oracles, verbatim from the registry — the composition's
# oracle is definitionally in lockstep with the parts'.
_LANG_SQL = _REGISTRY["ts_lang_id"].oracle
_QUAL_SQL = _REGISTRY["ts_quality_score"].oracle
_SPLIT_SQL = _REGISTRY["samp_split_assign"].oracle

_CURATION_ORACLE = f"""WITH lang AS (
{_LANG_SQL}
), qual AS (
{_QUAL_SQL}
), canon AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
), split AS (
{_SPLIT_SQL}
)
SELECT c.doc_id, l.lang_guess, q.quality, s.split
FROM canon c
JOIN lang l ON c.doc_id = l.doc_id
JOIN qual q ON c.doc_id = q.doc_id
JOIN split s ON c.doc_id = s.doc_id
WHERE l.lang_guess = '{KEEP_LANG}' AND q.quality >= {QUALITY_MIN}"""


@register("llm_curation_pipeline", _CURATION_ORACLE)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-corpus view: canonical, English, above the quality bar,
    tagged with its train/val/test split. See module docstring for the
    stage graph and the 100 TB story."""
    docs = load_raw(spark, sf_dir, "documents")
    # Exact dedup on a content hash (never on the raw text column —
    # the shuffle key must be fixed-width; sha2 collisions are ignorable
    # at any corpus size).
    canonical = (
        docs.select("doc_id", F.sha2(F.col("text"), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    lang = ts_lang_id(spark, sf_dir).select("doc_id", "lang_guess")
    qual = ts_quality_score(spark, sf_dir).select("doc_id", "quality")
    split = samp_split_assign(spark, sf_dir).select("doc_id", "split")
    return (
        canonical.join(lang, "doc_id")
        .join(qual, "doc_id")
        .filter(
            (F.col("lang_guess") == KEEP_LANG) & (F.col("quality") >= QUALITY_MIN)
        )
        .join(split, "doc_id")
        .select("doc_id", "lang_guess", "quality", "split")
    )
