"""ALS collaborative-filtering recommender (SURVEY §7.4b).

A fourth recommender behind the same ``recommend()`` output shape as
TF_IDF/TextRank/HotTopics (SURVEY §1.2 RecommendationModel): MLlib ALS
on the implicit (user, news, click-count) matrix. The reference has no
analogue — this is the extension BASELINE.json's north star names.

Implicit-feedback mode (Hu/Koren/Volinsky 2008): click counts are
confidence, not ratings. Seeded, so runs are reproducible; iterative
training is not SQL-expressible → rows-only driver check, invariants in
tests/test_streaming.py.

Scale notes (100 TB): ALS is the one genuinely iterative-distributed
operator in the engine — MLlib blocks the factor matrices
(numUserBlocks/numItemBlocks) so each iteration is a pair of
block-joined least-squares sweeps, shuffle O(nnz) per iteration. Rank
and block counts are the scale knobs; the input aggregate (user, news,
cnt) is map-side combinable as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_SCENE, TODAY
from ..registry import register
from ..sources import clicks

K = DEFAULT_SCENE.num_recommendations


@register("als_recommendations")  # iterative training → rows-only check
def als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train implicit ALS on aggregated clicks, emit the standard
    recommendations shape ``(user_id, date, news array<long>)``."""
    from pyspark.ml.recommendation import ALS

    ratings = (
        clicks(spark, sf_dir)
        .groupBy("user_id", "news_id")
        .agg(F.sum("cnt").cast("float").alias("cnt"))
    )
    if ratings.isEmpty():  # MLlib ALS refuses an empty ratings RDD
        return spark.createDataFrame(
            [], "user_id long, date date, news array<long>"
        )
    als = ALS(
        rank=8,
        maxIter=5,
        regParam=0.1,
        implicitPrefs=True,
        alpha=10.0,
        seed=42,
        userCol="user_id",
        itemCol="news_id",
        ratingCol="cnt",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    recs = model.recommendForAllUsers(K)
    return recs.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.lit(TODAY).cast("date").alias("date"),
        F.transform("recommendations", lambda r: r["news_id"].cast("long")).alias(
            "news"
        ),
    )
