"""Semi-structured event properties: typed JSON extraction + rollup.

``events.props`` carries a JSON object per event (the driver fixture
stores ``{"k": <int>}``). The reference never parses it — its click
ingestion keeps only (user, news, date, cnt) — but any real event
pipeline must lift JSON payloads into typed columns before analytics,
so this module makes the parse a first-class, oracle-checked operator.

Engine approach (100 TB):

- ``from_json`` with an **explicit schema** — never schema inference,
  which needs an extra full pass over the data. The parse is a JVM-side
  codegen expression: one scan, no Python boundary, no shuffle.
- Parsing happens **after** pushed-down predicates on real columns
  (``event_type``), so at scale the JSON CPU cost is paid only on the
  surviving rows. A predicate on the *parsed* value cannot prune the
  scan — queries that filter on payload fields should land behind a
  materialized typed column (write the parsed table once, read it
  many times) rather than re-parse per query.
- The rollup is a plain hash aggregate on low-cardinality keys —
  map-side combinable, output rows = |event_type| × buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_raw

#: Explicit payload schema — the single source of truth for the parse.
PROPS_SCHEMA = "k INT"


@register(
    "ev_props_parse",
    """SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events""",
)
def ev_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction: ``props -> k`` as a real column.

    ``from_json(props, 'k INT')`` is a single codegen expression per
    row; malformed JSON yields NULL (PERMISSIVE mode), matching the
    oracle's NULL on failed extraction."""
    ev = load_raw(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.from_json("props", PROPS_SCHEMA).getField("k").cast("long").alias("k"),
    )


@register(
    "ev_props_rollup",
    """SELECT event_type,
       CAST(k % 10 AS BIGINT) AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(value) AS DOUBLE) AS sum_value
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
  FROM events
)
WHERE k IS NOT NULL
GROUP BY event_type, k % 10""",
)
def ev_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup on a parsed payload field: events per (event_type,
    ``k % 10``) bucket with the summed ``value``. Parse → bucket →
    map-side-combinable hash aggregate; the only shuffle moves
    |event_type|·10 partial rows per task."""
    ev = load_raw(spark, sf_dir, "events")
    k = F.from_json("props", PROPS_SCHEMA).getField("k").cast("long")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").cast("double").alias("sum_value"),
        )
    )
