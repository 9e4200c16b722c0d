"""Item-item collaborative filtering over the click log.

The reference's three recommenders are content-based (TF-IDF, TextRank)
or popularity-based (HotTopics); the classic *behavioral* recommender —
item-item CF, "users who read X also read Y" — completes the family
using nothing but the click log the engine already derives.

Construction (all Catalyst, fully oracle-checkable):

1. Binary preference matrix: distinct ``(user, news)`` clicks.
2. Item co-occurrence via the **inverted-index** pattern (self-join on
   ``user_id`` — never an item×item cross): ``cooc(a, b) = |users who
   clicked both|``.
3. Cosine on binary vectors: ``sim(a, b) = cooc / sqrt(pop_a · pop_b)``
   — exact rationals of counts under one sqrt; quantized to 6 decimals
   for rank stability.
4. Top-K neighbors per item (pinned ties).
5. User recommendations: score every neighbor of the user's clicked
   items by summed similarity, drop already-clicked, top-K per user.

Scale notes (100 TB): step 2's pair generation is Σ_u deg(u)² — the
standard item-CF hot spot. Uniform users are fine (bounded daily
degree); power users need the standard mitigations, both mechanical
here: a deterministic per-user interaction cap before the self-join
(drop or sample the heaviest histories — industry practice, e.g. the
"frequent-clicker" truncation) and/or the hot-key salting pattern from
``j3_scored_join_salted``. The neighbor table (step 4) is K rows per
item — broadcast-sized per news corpus, which is what makes step 5 a
map-side join at serving time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..config import DEFAULT_SCENE
from ..registry import register
from .quantize import ppm_sum, ppm_value
from ..sources import CLICKS_CTE, clicks, with_ctes
from ..sources.tables import NEWS_MOD

#: Neighbors kept per item / recommendations per user.
CF_NEIGHBORS = 10
CF_RECS = DEFAULT_SCENE.num_recommendations

_PREFS_CTE = "prefs AS (SELECT DISTINCT user_id, news_id FROM clicks)"
_POP_CTE = "pop AS (SELECT news_id, COUNT(*) AS pop FROM prefs GROUP BY news_id)"
_SIMS_CTE = """sims AS (
  SELECT c.news_a, c.news_b,
         ROUND(c.cooc / sqrt(pa.pop * pb.pop), 6) AS sim
  FROM (
    SELECT a.news_id AS news_a, b.news_id AS news_b, CAST(COUNT(*) AS DOUBLE) AS cooc
    FROM prefs a JOIN prefs b
      ON a.user_id = b.user_id AND a.news_id <> b.news_id
    GROUP BY 1, 2
  ) c
  JOIN pop pa ON c.news_a = pa.news_id
  JOIN pop pb ON c.news_b = pb.news_id
)"""
_NEIGHBORS_CTE = f"""neighbors AS (
  SELECT news_a, news_b, sim FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY news_a ORDER BY sim DESC, news_b ASC) AS rnk
    FROM sims
  ) WHERE rnk <= {CF_NEIGHBORS}
)"""


@register(
    "cf_item_neighbors",
    with_ctes(
        "SELECT news_a, news_b, sim FROM neighbors",
        CLICKS_CTE,
        _PREFS_CTE,
        _POP_CTE,
        _SIMS_CTE,
        _NEIGHBORS_CTE,
    ),
)
def cf_item_neighbors(
    spark: SparkSession, sf_dir: str, prefs: DataFrame | None = None
) -> DataFrame:
    """Top-K most-similar items per item (binary-cosine item-item CF).
    The model table a serving layer would broadcast.

    ``prefs`` lets composed queries share ONE persisted prefs relation:
    this builder references it three times (pop + both co-occurrence
    sides) and Catalyst has no cross-subtree CSE, so an un-shared call
    re-ran the clicks scan+distinct per reference (r12)."""
    if prefs is None:
        prefs = clicks(spark, sf_dir).select("user_id", "news_id").distinct()
    pop = prefs.groupBy("news_id").agg(F.count("*").alias("pop"))
    a = prefs.alias("a")
    b = prefs.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.news_id") != F.col("b.news_id")),
        )
        .groupBy(
            F.col("a.news_id").alias("news_a"), F.col("b.news_id").alias("news_b")
        )
        .agg(F.count("*").cast("double").alias("cooc"))
    )
    sims = (
        cooc.join(
            F.broadcast(pop.select(F.col("news_id").alias("news_a"), F.col("pop").alias("pa"))),
            "news_a",
        )
        .join(
            F.broadcast(pop.select(F.col("news_id").alias("news_b"), F.col("pop").alias("pb"))),
            "news_b",
        )
        .select(
            "news_a",
            "news_b",
            F.round(F.col("cooc") / F.sqrt(F.col("pa") * F.col("pb")), 6).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("news_a").orderBy(F.desc("sim"), F.asc("news_b"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CF_NEIGHBORS)
        .select("news_a", "news_b", "sim")
    )


#: The recommendation SELECT, shared verbatim by the
#: cf_user_recommendations oracle and the composed novelty report.
_RECS_SELECT = f"""SELECT user_id, news_id, score FROM (
  SELECT s.user_id, s.news_id, s.score,
         ROW_NUMBER() OVER (
           PARTITION BY s.user_id ORDER BY s.score DESC, s.news_id ASC) AS rnk
  FROM (
    SELECT p.user_id, n.news_b AS news_id, ROUND(SUM(n.sim), 6) AS score
    FROM prefs p
    JOIN neighbors n ON p.news_id = n.news_a
    LEFT JOIN prefs seen ON seen.user_id = p.user_id AND seen.news_id = n.news_b
    WHERE seen.news_id IS NULL
    GROUP BY p.user_id, n.news_b
  ) s
) WHERE rnk <= {CF_RECS}"""


@register(
    "cf_user_recommendations",
    with_ctes(
        _RECS_SELECT,
        CLICKS_CTE,
        _PREFS_CTE,
        _POP_CTE,
        _SIMS_CTE,
        _NEIGHBORS_CTE,
    ),
)
def cf_user_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-CF user recommendations: each clicked item votes its
    similarity onto its neighbors; already-clicked items are excluded
    (left-anti); top-K per user with pinned ties. Scores sum quantized
    similarities (each already 6-dp) and re-quantize — positive sums of
    ≤K small terms, hash-stable.

    Plan: prefs ⋈ broadcast(neighbor model) → anti-join own history →
    per-user aggregate + window. The neighbor model is K·|items| rows —
    the broadcast that makes this a single-shuffle recommender."""
    # NOTE (r13): r12 persisted prefs (5 consumers, no cross-subtree
    # CSE); re-adjudicated paired in r13: the persist MEASURED 1.2x
    # slower (2.31 vs 1.88 s min-of-5) — reverted. The narrow
    # distinct-clicks chain re-runs cheaper than its cache writes; at
    # 100 TB share a materialized prefs table across the pipeline
    # instead (s19 pattern). OPTIMIZATION_r13.md.
    prefs = (
        clicks(spark, sf_dir).select("user_id", "news_id").distinct()
    )
    neighbors = cf_item_neighbors(spark, sf_dir, prefs=prefs)
    scored = (
        prefs.join(
            F.broadcast(neighbors),
            prefs.news_id == neighbors.news_a,
        )
        .select("user_id", F.col("news_b").alias("cand"), "sim")
        .join(
            prefs.select("user_id", F.col("news_id").alias("cand")),
            ["user_id", "cand"],
            "left_anti",
        )
        .groupBy("user_id", F.col("cand").alias("news_id"))
        .agg(F.round(F.sum("sim"), 6).alias("score"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("news_id"))
    out = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CF_RECS)
        .select("user_id", "news_id", "score")
    )
    return out


# ---------------------------------------------- next-item transitions

@register(
    "cf_next_item_transitions",
    with_ctes(
        f"""SELECT news_a, news_b, n_follows, prob FROM (
  SELECT news_a, news_b, n_follows,
         ROUND(n_follows / SUM(n_follows) OVER (PARTITION BY news_a), 6) AS prob,
         ROW_NUMBER() OVER (PARTITION BY news_a
                            ORDER BY n_follows DESC, news_b ASC) AS rnk
  FROM (
    SELECT news_a, news_b, CAST(COUNT(*) AS DOUBLE) AS n_follows
    FROM (
      SELECT news_id AS news_b,
             LAG(news_id) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS news_a
      FROM (SELECT user_id, event_id % {NEWS_MOD} AS news_id, ts, event_id
            FROM events WHERE event_type = 'click')
    )
    WHERE news_a IS NOT NULL AND news_a <> news_b
    GROUP BY news_a, news_b
  )
) WHERE rnk <= {CF_NEIGHBORS}""",
        ),
)
def cf_next_item_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-aware recommender model: first-order **next-item
    transition matrix** — for each news item, the top-K items users
    click immediately after it, with the empirical transition
    probability. Complements item-CF (order-free co-occurrence) with
    click-ORDER information; self-transitions (reloads) excluded.

    One lag window over (user, time) builds every consecutive pair in
    a single shuffle on user_id — no self-join at all (the CF pair join
    is replaced by sequence adjacency). The probability normalizer is a
    second window over news_a. At 100 TB: both windows are
    hash-partitioned, the transition matrix is top-K-truncated per
    item, and serving is the same broadcast-model join as item-CF."""
    from ..sources import events_raw
    from ..sources.tables import NEWS_MOD

    ev = events_raw(spark, sf_dir).filter(F.col("event_type") == "click").select(
        "user_id",
        (F.col("event_id") % NEWS_MOD).alias("news_id"),
        "ts",
        "event_id",
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("news_a", F.lag("news_id").over(seq))
        .filter(F.col("news_a").isNotNull() & (F.col("news_a") != F.col("news_id")))
        .groupBy("news_a", F.col("news_id").alias("news_b"))
        .agg(F.count("*").cast("double").alias("n_follows"))
    )
    norm = Window.partitionBy("news_a")
    rank = Window.partitionBy("news_a").orderBy(
        F.desc("n_follows"), F.asc("news_b")
    )
    return (
        pairs.withColumn(
            "prob", F.round(F.col("n_follows") / F.sum("n_follows").over(norm), 6)
        )
        .withColumn("rnk", F.row_number().over(rank))
        .filter(F.col("rnk") <= CF_NEIGHBORS)
        .select("news_a", "news_b", "n_follows", "prob")
    )


# ------------------------------------------- count-weighted item CF

_PREFS_W_CTE = """prefs_w AS (
  SELECT user_id, news_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM clicks GROUP BY user_id, news_id
)"""


@register(
    "cf_item_neighbors_weighted",
    with_ctes(
        f"""SELECT news_a, news_b, sim FROM (
  SELECT c.news_a, c.news_b,
         ROUND(c.cooc / sqrt(na.ss * nb.ss), 6) AS sim,
         ROW_NUMBER() OVER (
           PARTITION BY c.news_a
           ORDER BY ROUND(c.cooc / sqrt(na.ss * nb.ss), 6) DESC, c.news_b ASC
         ) AS rnk
  FROM (
    SELECT a.news_id AS news_a, b.news_id AS news_b,
           CAST(SUM(a.c * b.c) AS DOUBLE) AS cooc
    FROM prefs_w a JOIN prefs_w b
      ON a.user_id = b.user_id AND a.news_id <> b.news_id
    GROUP BY 1, 2
  ) c
  JOIN (SELECT news_id, SUM(c * c) AS ss FROM prefs_w GROUP BY news_id) na
    ON c.news_a = na.news_id
  JOIN (SELECT news_id, SUM(c * c) AS ss FROM prefs_w GROUP BY news_id) nb
    ON c.news_b = nb.news_id
) WHERE rnk <= {CF_NEIGHBORS}""",
        CLICKS_CTE,
        _PREFS_W_CTE,
    ),
)
def cf_item_neighbors_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item CF over click **counts** (cosine of count vectors),
    vs :func:`cf_item_neighbors`'s binary incidence: repeat clicks
    strengthen the signal instead of collapsing to 1 — the standard
    upgrade when interaction intensity is informative. Same
    inverted-index plan shape; all sums are exact integers under one
    sqrt, quantized to 6 dp for rank stability."""
    prefs = (
        clicks(spark, sf_dir)
        .groupBy("user_id", "news_id")
        .agg(F.count("*").alias("c"))
    )
    norms = prefs.groupBy("news_id").agg(
        F.sum(F.col("c") * F.col("c")).alias("ss")
    )
    a = prefs.alias("a")
    b = prefs.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.news_id") != F.col("b.news_id")),
        )
        .groupBy(
            F.col("a.news_id").alias("news_a"), F.col("b.news_id").alias("news_b")
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("double").alias("cooc"))
    )
    sims = (
        cooc.join(
            F.broadcast(
                norms.select(F.col("news_id").alias("news_a"), F.col("ss").alias("sa"))
            ),
            "news_a",
        )
        .join(
            F.broadcast(
                norms.select(F.col("news_id").alias("news_b"), F.col("ss").alias("sb"))
            ),
            "news_b",
        )
        .select(
            "news_a",
            "news_b",
            F.round(F.col("cooc") / F.sqrt(F.col("sa") * F.col("sb")), 6).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("news_a").orderBy(F.desc("sim"), F.asc("news_b"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CF_NEIGHBORS)
        .select("news_a", "news_b", "sim")
    )


# --------------------------------------------------- user-based CF

_USER_SIMS_CTE = f"""user_sims AS (
  SELECT c.user_a, c.user_b,
         ROUND(c.cooc / sqrt(pa.pop * pb.pop), 6) AS sim
  FROM (
    SELECT a.user_id AS user_a, b.user_id AS user_b, CAST(COUNT(*) AS DOUBLE) AS cooc
    FROM prefs a JOIN prefs b
      ON a.news_id = b.news_id AND a.user_id <> b.user_id
    GROUP BY 1, 2
  ) c
  JOIN (SELECT user_id, COUNT(*) AS pop FROM prefs GROUP BY user_id) pa
    ON c.user_a = pa.user_id
  JOIN (SELECT user_id, COUNT(*) AS pop FROM prefs GROUP BY user_id) pb
    ON c.user_b = pb.user_id
)"""


@register(
    "cf_user_neighbors",
    with_ctes(
        f"""SELECT user_a, user_b, sim FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_a ORDER BY sim DESC, user_b ASC) AS rnk
  FROM user_sims
) WHERE rnk <= {CF_NEIGHBORS}""",
        CLICKS_CTE,
        _PREFS_CTE,
        _USER_SIMS_CTE,
    ),
)
def cf_user_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**User-based CF** neighbor model — the transpose of
    :func:`cf_item_neighbors`: users are similar when their click sets
    overlap (binary cosine), candidates generated by the inverted-index
    self-join on **news_id**. Item-based CF is usually preferred at
    scale (item count ≪ user count, so the model table is smaller and
    more stable), but taste-neighborhood features (e.g. "users like
    you") need this direction; the skew story transposes too — a viral
    ITEM is now the hot join key, capped/salted the same way."""
    prefs = clicks(spark, sf_dir).select("user_id", "news_id").distinct()
    pop = prefs.groupBy("user_id").agg(F.count("*").alias("pop"))
    a = prefs.alias("a")
    b = prefs.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.news_id") == F.col("b.news_id"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b")
        )
        .agg(F.count("*").cast("double").alias("cooc"))
    )
    sims = (
        cooc.join(
            F.broadcast(pop.select(F.col("user_id").alias("user_a"), F.col("pop").alias("pa"))),
            "user_a",
        )
        .join(
            F.broadcast(pop.select(F.col("user_id").alias("user_b"), F.col("pop").alias("pb"))),
            "user_b",
        )
        .select(
            "user_a",
            "user_b",
            F.round(F.col("cooc") / F.sqrt(F.col("pa") * F.col("pb")), 6).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("user_a").orderBy(F.desc("sim"), F.asc("user_b"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CF_NEIGHBORS)
        .select("user_a", "user_b", "sim")
    )


@register(
    "cf_item_lift",
    with_ctes(
        f"""SELECT news_a, news_b, lift FROM (
  SELECT c.news_a, c.news_b,
         CAST(CAST(FLOOR((c.cooc * tot.n_users / (pa.pop * CAST(pb.pop AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
           AS lift,
         ROW_NUMBER() OVER (
           PARTITION BY c.news_a
           ORDER BY CAST(CAST(FLOOR((c.cooc * tot.n_users / (pa.pop * CAST(pb.pop AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 DESC,
                    c.news_b ASC) AS rnk
  FROM (
    SELECT a.news_id AS news_a, b.news_id AS news_b, CAST(COUNT(*) AS DOUBLE) AS cooc
    FROM prefs a JOIN prefs b
      ON a.user_id = b.user_id AND a.news_id <> b.news_id
    GROUP BY 1, 2
  ) c
  JOIN pop pa ON c.news_a = pa.news_id
  JOIN pop pb ON c.news_b = pb.news_id
  CROSS JOIN (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM prefs) tot
) WHERE rnk <= {CF_NEIGHBORS}""",
        CLICKS_CTE,
        _PREFS_CTE,
        _POP_CTE,
    ),
)
def cf_item_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item association by **lift** (observed co-click rate over the
    rate expected under independence, `cooc·N / (pop_a·pop_b)`) — the
    popularity-debiased companion to cosine CF: cosine still rewards
    globally popular items; lift > 1 isolates genuinely associated
    pairs. Same inverted-index plan plus one 1-row user-count
    broadcast; exact count ratios, quantized for rank ties."""
    prefs = clicks(spark, sf_dir).select("user_id", "news_id").distinct()
    pop = prefs.groupBy("news_id").agg(F.count("*").alias("pop"))
    n_users = prefs.select("user_id").distinct().count()
    a = prefs.alias("a")
    b = prefs.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.news_id") != F.col("b.news_id")),
        )
        .groupBy(
            F.col("a.news_id").alias("news_a"), F.col("b.news_id").alias("news_b")
        )
        .agg(F.count("*").cast("double").alias("cooc"))
    )
    lift = ppm_value(
        F.col("cooc") * n_users / (F.col("pa") * F.col("pb").cast("double"))
    )
    w = Window.partitionBy("news_a").orderBy(F.desc("lift"), F.asc("news_b"))
    return (
        cooc.join(
            F.broadcast(pop.select(F.col("news_id").alias("news_a"), F.col("pop").alias("pa"))),
            "news_a",
        )
        .join(
            F.broadcast(pop.select(F.col("news_id").alias("news_b"), F.col("pop").alias("pb"))),
            "news_b",
        )
        .select("news_a", "news_b", lift.alias("lift"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CF_NEIGHBORS)
        .select("news_a", "news_b", "lift")
    )


# ------------------------------------------------ association rules

#: Minimum co-click support (absolute users) for a rule to surface.
RULE_MIN_SUPPORT = 2


@register(
    "cf_association_rules",
    with_ctes(
        f"""SELECT antecedent, consequent, support,
       ROUND(CAST(support AS DOUBLE) / pa, 6) AS confidence,
       ROUND(CAST(support AS DOUBLE) * n_users / (pa * pb), 6) AS lift
FROM (
  SELECT a.news_id AS antecedent, b.news_id AS consequent,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM prefs a JOIN prefs b
    ON a.user_id = b.user_id AND a.news_id <> b.news_id
  GROUP BY 1, 2
) r
JOIN (SELECT news_id, CAST(COUNT(*) AS BIGINT) AS pa FROM prefs GROUP BY news_id) qa
  ON r.antecedent = qa.news_id
JOIN (SELECT news_id, CAST(COUNT(*) AS BIGINT) AS pb FROM prefs GROUP BY news_id) qb
  ON r.consequent = qb.news_id
CROSS JOIN (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM prefs) u
WHERE support >= {RULE_MIN_SUPPORT}""",
        CLICKS_CTE,
        "prefs AS (SELECT DISTINCT user_id, news_id FROM clicks)",
    ),
)
def cf_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Association rules** over per-user click baskets (Apriori at
    the pair level): for every ordered item pair with support ≥
    ``RULE_MIN_SUPPORT`` users, the classic market-basket triple —
    support (co-click users), confidence P(B|A), and lift
    P(B|A)/P(B) — the interpretable complement to the cosine CF model
    (:func:`cf_item_neighbors` ranks by similarity; lift > 1 says the
    association beats popularity, which cosine can't distinguish).

    Plan: the same user-keyed co-occurrence self-join as the CF model
    (support pruning kills the long tail early), two broadcast
    popularity joins, one 1-row user-count broadcast — exact BIGINT
    counts, ratios quantized at the edge.

    Scale: identical envelope to cf_item_neighbors; at 100 TB the
    user-keyed join is capped per user (basket length) and the
    min-support predicate is pushed below the popularity joins."""
    # NOTE (r13): four consumers (popularity, user total, both
    # co-occurrence sides); the r12 persist MEASURED 1.7x slower than
    # re-running the pruned chain (1.95 vs 1.12 s min-of-5) — reverted,
    # same at-scale note as cf_user_recommendations. OPTIMIZATION_r13.md.
    prefs = (
        clicks(spark, sf_dir).select("user_id", "news_id").distinct()
    )
    pop = prefs.groupBy("news_id").agg(
        F.count("*").cast("bigint").alias("p")
    )
    users = prefs.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users")
    )
    a = prefs.alias("a")
    b = prefs.alias("b")
    rules = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.news_id") != F.col("b.news_id")),
        )
        .groupBy(
            F.col("a.news_id").alias("antecedent"),
            F.col("b.news_id").alias("consequent"),
        )
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= RULE_MIN_SUPPORT)
    )
    out = (
        rules.join(
            F.broadcast(
                pop.select(
                    F.col("news_id").alias("antecedent"),
                    F.col("p").alias("pa"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                pop.select(
                    F.col("news_id").alias("consequent"),
                    F.col("p").alias("pb"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(users))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round(
                F.col("support").cast("double") / F.col("pa"), 6
            ).alias("confidence"),
            F.round(
                F.col("support").cast("double")
                * F.col("n_users")
                / (F.col("pa") * F.col("pb")),
                6,
            ).alias("lift"),
        )
    )
    return out


# ---------------------------------------------------- path trigrams

#: Trigram mining: top follow-ups kept per (a, b) prefix, min support,
#: and the category coarsening (item-level trigrams are support-1 at
#: every SF — mining at category granularity is the standard fallback
#: when the item space is too sparse for order-2 patterns).
TRIGRAM_TOP = 5
TRIGRAM_MIN_SUPPORT = 2
TRIGRAM_TOPICS = 20

_TRIGRAM_ORACLE = f"""SELECT news_a, news_b, news_c, n_paths FROM (
  SELECT news_a, news_b, news_c, n_paths,
         ROW_NUMBER() OVER (PARTITION BY news_a, news_b
                            ORDER BY n_paths DESC, news_c ASC) AS rnk
  FROM (
    SELECT news_a, news_b, news_id AS news_c, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM (
      SELECT news_id,
             LAG(news_id, 1) OVER w AS news_b,
             LAG(news_id, 2) OVER w AS news_a
      FROM (SELECT user_id, (event_id % {NEWS_MOD}) % {TRIGRAM_TOPICS} AS news_id,
                   ts, event_id
            FROM events WHERE event_type = 'click')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE news_a IS NOT NULL AND news_a <> news_b AND news_b <> news_id
    GROUP BY news_a, news_b, news_c
    HAVING COUNT(*) >= {TRIGRAM_MIN_SUPPORT}
  )
) WHERE rnk <= {TRIGRAM_TOP}"""


@register("cf_path_trigrams", _TRIGRAM_ORACLE)
def cf_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, order 2: frequent click **trigrams**
    a→b→c (no immediate repeats) at category granularity
    (news_id % {TRIGRAM_TOPICS}; item-level order-2 patterns are
    support-1 at every fixture SF), min support {TRIGRAM_MIN_SUPPORT},
    top {TRIGRAM_TOP} continuations per (a, b) prefix — the
    PrefixSpan-style shape at the depth that actually serves
    session-based recommendation (the second-order Markov model's
    support table).

    Same scale skeleton as cf_next_item_transitions: TWO lag columns
    over ONE (user, time) window sort build every consecutive triple —
    no self-join, one shuffle on user_id; the group-limit window prunes
    per-prefix before anything large materializes (WindowGroupLimit
    pushes the rank filter map-side)."""
    from ..sources import events_raw

    ev = events_raw(spark, sf_dir).filter(F.col("event_type") == "click").select(
        "user_id",
        ((F.col("event_id") % NEWS_MOD) % TRIGRAM_TOPICS).alias("news_id"),
        "ts",
        "event_id",
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    triples = (
        ev.withColumn("news_b", F.lag("news_id", 1).over(seq))
        .withColumn("news_a", F.lag("news_id", 2).over(seq))
        .filter(
            F.col("news_a").isNotNull()
            & (F.col("news_a") != F.col("news_b"))
            & (F.col("news_b") != F.col("news_id"))
        )
        .groupBy("news_a", "news_b", F.col("news_id").alias("news_c"))
        .agg(F.count("*").alias("n_paths"))
        .filter(F.col("n_paths") >= TRIGRAM_MIN_SUPPORT)
    )
    rank = Window.partitionBy("news_a", "news_b").orderBy(
        F.desc("n_paths"), F.asc("news_c")
    )
    return (
        triples.withColumn("rnk", F.row_number().over(rank))
        .filter(F.col("rnk") <= TRIGRAM_TOP)
        .select("news_a", "news_b", "news_c", "n_paths")
    )


# ---------------------------------------- next-item model evaluation

_HITRATE_ORACLE = f"""WITH ev AS (
  SELECT user_id, event_id % {NEWS_MOD} AS news_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_desc
  FROM events WHERE event_type = 'click'
),
train_pairs AS (
  SELECT news_a, news_id AS news_b FROM (
    SELECT news_id, rn_desc,
           LAG(news_id) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS news_a
    FROM ev
  ) WHERE rn_desc >= 2 AND news_a IS NOT NULL AND news_a <> news_id
),
model AS (
  SELECT news_a, news_b AS news_pred FROM (
    SELECT news_a, news_b,
           ROW_NUMBER() OVER (PARTITION BY news_a
                              ORDER BY COUNT(*) DESC, news_b ASC) AS rnk
    FROM train_pairs GROUP BY news_a, news_b
  ) WHERE rnk = 1
),
eval_set AS (
  SELECT t.user_id, p.news_id AS news_prev, t.news_id AS news_actual
  FROM (SELECT * FROM ev WHERE rn_desc = 1) t
  JOIN (SELECT * FROM ev WHERE rn_desc = 2) p ON t.user_id = p.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(COUNT(m.news_pred) AS BIGINT) AS n_covered,
       CAST(COALESCE(SUM(CASE WHEN m.news_pred = e.news_actual
                              THEN 1 END), 0) AS BIGINT) AS hits,
       CAST(CAST(FLOOR((COALESCE(SUM(CASE WHEN m.news_pred = e.news_actual THEN 1.0 ELSE 0.0 END), 0) / COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS hit_rate,
       CAST(CAST(FLOOR((COUNT(m.news_pred) / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS coverage
FROM eval_set e LEFT JOIN model m ON e.news_prev = m.news_a"""


@register("cf_next_item_hitrate", _HITRATE_ORACLE)
def cf_next_item_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-last-out **temporal evaluation** of the next-item model:
    hold out every user's final click, train the first-order
    transition model on everything earlier (the held-out pair never
    enters the counts — no label leakage), predict the top-1 follow-up
    of each user's penultimate item, and report hit rate and model
    coverage. The evaluation twin that keeps cf_next_item_transitions
    honest, mirroring the reference's precision eval
    (TextRank.java:354-368) for the sequential model.

    Plan: one window sort per direction over the click log (rank from
    the end for the split, lag for the pairs — both share the user_id
    hash partitioning), a top-1 group-limit for the model, then one
    broadcast-sized join of the |users|-row eval set against the
    |items|-row model."""
    from ..sources import events_raw

    ev = (
        events_raw(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            (F.col("event_id") % NEWS_MOD).alias("news_id"),
            "ts",
            "event_id",
        )
        .withColumn(
            "rn_desc",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    train_pairs = (
        ev.withColumn("news_a", F.lag("news_id").over(seq))
        .filter(
            (F.col("rn_desc") >= 2)
            & F.col("news_a").isNotNull()
            & (F.col("news_a") != F.col("news_id"))
        )
        .select("news_a", F.col("news_id").alias("news_b"))
    )
    rank = Window.partitionBy("news_a").orderBy(
        F.desc("n"), F.asc("news_b")
    )
    model = (
        train_pairs.groupBy("news_a", "news_b")
        .agg(F.count("*").alias("n"))
        .withColumn("rnk", F.row_number().over(rank))
        .filter(F.col("rnk") == 1)
        .select("news_a", F.col("news_b").alias("news_pred"))
    )
    test = ev.filter(F.col("rn_desc") == 1).select(
        "user_id", F.col("news_id").alias("news_actual")
    )
    prev = ev.filter(F.col("rn_desc") == 2).select(
        "user_id", F.col("news_id").alias("news_prev")
    )
    joined = (
        test.join(prev, "user_id")
        .join(
            F.broadcast(model),
            F.col("news_prev") == F.col("news_a"),
            "left",
        )
    )
    hit = F.when(F.col("news_pred") == F.col("news_actual"), 1).otherwise(0)
    return joined.agg(
        F.count("*").alias("n_eval"),
        F.count("news_pred").alias("n_covered"),
        F.coalesce(F.sum(hit), F.lit(0)).cast("long").alias("hits"),
        ppm_value(
            F.coalesce(F.sum(hit.cast("double")), F.lit(0.0)) / F.count("*")
        ).alias("hit_rate"),
        ppm_value(
            F.count("news_pred") / F.count("*").cast("double")
        ).alias("coverage"),
    )


# ------------------------------------------- rec-list diversity

#: Evaluate intra-list diversity for this many users (pinned cap so
#: the report is bounded at any SF; the per-user work is K² pairs).
DIV_USERS = 200

_DIVERSITY_ORACLE = with_ctes(
    f"""SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(AVG(dist), 6) AS mean_intra_list_distance,
       ROUND(MIN(dist), 6) AS min_pair_distance,
       ROUND(MAX(dist), 6) AS max_pair_distance
FROM (
  SELECT a.user_id,
         1.0 - list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                                CAST(eb.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                                      CAST(ea.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]),
                                        CAST(eb.embedding AS DOUBLE[]))))
           AS dist
  FROM recs a
  JOIN recs b ON a.user_id = b.user_id AND a.news_id < b.news_id
  JOIN embeddings ea ON a.news_id = ea.vec_id
  JOIN embeddings eb ON b.news_id = eb.vec_id
)""",
    CLICKS_CTE,
    f"""recs AS (
  SELECT user_id, news_id FROM (
    SELECT user_id, news_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY score DESC, news_id ASC) AS rank
    FROM (SELECT user_id, news_id, CAST(SUM(cnt) AS DOUBLE) AS score
          FROM clicks GROUP BY user_id, news_id)
  ) WHERE rank <= {DEFAULT_SCENE.num_recommendations}
    AND user_id < {DIV_USERS}
)""",
)


@register("cf_reclist_diversity", _DIVERSITY_ORACLE)
def cf_reclist_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Intra-list diversity** of the top-K recommendations: mean
    pairwise cosine DISTANCE between the embeddings of each user's
    recommended items (news_id doubles as vec_id in the fixtures) —
    the beyond-accuracy recommender metric (a list of near-duplicates
    scores high on precision and fails the user; diversity is what
    MMR-style rerankers optimize, cf. sim_mmr_rerank).

    Scale shape: recommendation lists are K-bounded, so the pair
    generation is a per-user K² fan-out (≤ 45 pairs at K=10), keyed on
    user_id — never an item×item cross; the embedding lookups are two
    joins against the |items|-row table on its key. Per-row norms
    compute once per side before the pair product."""
    from ..sources import load_raw
    from .. import registry  # noqa: F401  (registration side effects)

    recs = (
        clicks(spark, sf_dir)
        .filter(F.col("user_id") < DIV_USERS)
        .groupBy("user_id", "news_id")
        .agg(F.sum("cnt").cast("double").alias("score"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("news_id")
    )
    recs = (
        recs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= CF_RECS)
        .select("user_id", "news_id")
    )
    emb = load_raw(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    emb = emb.select(
        "vec_id",
        "e",
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("e"), F.col("e"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("nrm"),
    )
    a = recs.alias("a")
    b = recs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.news_id") < F.col("b.news_id")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.news_id").alias("na"),
        F.col("b.news_id").alias("nb"),
    )
    ea = emb.select(
        F.col("vec_id").alias("na"),
        F.col("e").alias("e_a"),
        F.col("nrm").alias("n_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("nb"),
        F.col("e").alias("e_b"),
        F.col("nrm").alias("n_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("e_a"), F.col("e_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        pairs.join(ea, "na")
        .join(eb, "nb")
        .select(
            "user_id",
            (F.lit(1.0) - dot / (F.col("n_a") * F.col("n_b"))).alias("dist"),
        )
    )
    return scored.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg("dist"), 6).alias("mean_intra_list_distance"),
        F.round(F.min("dist"), 6).alias("min_pair_distance"),
        F.round(F.max("dist"), 6).alias("max_pair_distance"),
    )


# ---------------------------------------------------- novelty report

@register(
    "cf_novelty_report",
    with_ctes(
        f"""SELECT r.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_recs,
       CAST(SUM(CAST(FLOOR((LN(CAST(n_users AS DOUBLE) / pop)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / COUNT(*) / 1000000.0 / LN(2.0) AS mean_novelty_bits,
       CAST(SUM(pop) AS DOUBLE) / COUNT(*) / MAX(n_users) AS mean_pop_share
FROM (
{{recs}}
) r
JOIN pop ON pop.news_id = r.news_id
CROSS JOIN (SELECT COUNT(DISTINCT user_id) AS n_users FROM prefs) u
GROUP BY r.user_id""".format(recs=_RECS_SELECT),
        CLICKS_CTE,
        _PREFS_CTE,
        _POP_CTE,
        _SIMS_CTE,
        _NEIGHBORS_CTE,
    ),
)
def cf_novelty_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Recommendation novelty** (Castells & Vargas' self-information
    metric) — the catalogue-side quality the existing eval ops don't
    measure: j5/cf_next_item_hitrate score ACCURACY,
    cf_reclist_diversity scores WITHIN-list dissimilarity,
    j6_rec_coverage counts catalogue touch — novelty asks whether the
    recommender shows users anything they wouldn't find on the front
    page. Per user: the mean self-information −log₂(pop/|users|) of
    the recommended items (bits; popular-item lists score near 0) and
    the mean popularity share. The recommendation relation is
    `cf_user_recommendations`' own SELECT embedded verbatim (the
    composed-oracle pattern), so the report cannot drift from the
    recommender it audits.

    Plan: the single-shuffle recommender plus one broadcast popularity
    join, a 1-row user-total scalar, and a per-user aggregate —
    novelty adds no new data-sized shuffle at any scale.

    Hash-path note (r9 advice): an AVG of ln-derived doubles
    accumulates in partition order, so its 6-dp quantization was the
    one residual order-dependence in this file. Both means are now
    order-free: the bits mean quantizes each ln TERM to BIGINT
    micro-units and sums exactly (the ml_cv_ridge_path pattern; the
    base-2 change lands as one final mirrored division by LN(2)), and
    the popularity share is a pure integer SUM(pop) with two mirrored
    exactly-rounded divisions — no quantizer needed at all."""
    recs = cf_user_recommendations(spark, sf_dir).select("user_id", "news_id")
    # NOTE (r12): pop and the user total each re-derive prefs (2 scans),
    # but a second persist+checkpoint on top of the recommender's own
    # MEASURED ~1.5x slower overall - reverted; see OPTIMIZATION_r12.md.
    prefs = clicks(spark, sf_dir).select("user_id", "news_id").distinct()
    pop = prefs.groupBy("news_id").agg(F.count("*").alias("pop"))
    u = prefs.agg(F.count_distinct("user_id").alias("n_users"))
    ln_term = F.log(F.col("n_users").cast("double") / F.col("pop"))
    out = (
        recs.join(F.broadcast(pop), "news_id")
        .crossJoin(F.broadcast(u))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_recs"),
            (
                ppm_sum(ln_term).cast("double")
                / F.count("*")
                / F.lit(1000000.0)
                / F.log(F.lit(2.0))
            ).alias("mean_novelty_bits"),
            (
                F.sum("pop").cast("double") / F.count("*") / F.max("n_users")
            ).alias("mean_pop_share"),
        )
    )
    return out
