"""Logical table schemas (SURVEY.md §1.2, reconstructed from the reference).

The reference's data model is POJO/tuple rows (NewsModel, TweetModel,
ClickModel, DocumentModel, RecommendationModel — imported at
TextRank.java:5 but absent from the snapshot; field evidence cited per
table in SURVEY §1.2). Here every table is an explicit StructType; the
document-keyword "vector" (``List<Keyword>`` built into a
``HashMap<String,Double>`` at CosineSimilarity.java:53-56) is pinned as
``map<string,double>``.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: news(id, date, title, description, content) — TextRank.java:63-65,
#: field weights imply title/description/content TF_IDF.java:58-60.
NEWS = T.StructType(
    [
        T.StructField("news_id", T.LongType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

#: tweets(user_id, date, content) — TextRank.java:107,120-122.
TWEETS = T.StructType(
    [
        T.StructField("tweet_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)

#: clicks(user_id, news_id, date, cnt) — TextRank.java:332-334,
#: HotTopics.java:83-86 (4-col click log, RESULT_4COLS TextRank.java:221).
CLICKS = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("news_id", T.LongType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("cnt", T.IntegerType(), False),
    ]
)

#: doc_keywords(doc_id, user_id, date, keywords) — DocumentModel:
#: TextRank.java:63-65 (news docs, doc_id set) vs :120-125 (user docs,
#: user_id set); keywords map pinned per SURVEY §1.1.
DOC_KEYWORDS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("date", T.DateType(), True),
        T.StructField(
            "keywords", T.MapType(T.StringType(), T.DoubleType()), True
        ),
    ]
)

#: recommendations(user_id, date, news array<long> rank-ordered) —
#: RecommendationModel, TextRank.java:289-293.
RECOMMENDATIONS = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("news", T.ArrayType(T.LongType()), False),
    ]
)

#: precision_stats(date, hits, total, precision) —
#: Tuple4<Date,Integer,Integer,Double> seed row, TextRank.java:357-359.
PRECISION_STATS = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("hits", T.LongType(), False),
        T.StructField("total", T.LongType(), False),
        T.StructField("precision", T.DoubleType(), False),
    ]
)
