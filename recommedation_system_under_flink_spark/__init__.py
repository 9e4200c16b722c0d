"""PySpark-native analytics engine with the query and data-processing
capabilities of ``lostomato/Recommedation-System-under-Flink``.

The reference (read-only at ``/root/reference/``) is a Flink batch
``DataSet`` pipeline implementing three news recommenders (TF-IDF,
TextRank, HotTopics) plus similarity kernels and precision evaluation.
This package re-expresses that surface Spark-first: declarative
DataFrame/SQL plans optimized by Catalyst, pandas UDFs only where the
semantics are genuinely non-relational (keyword extraction, TextRank
vote), and Structured Streaming for the event-time extension.

Module map (SURVEY.md §7.0):

- :mod:`.session`    — SparkSession factory tuned for local[...] testing.
- :mod:`.config`     — ``Scene`` hyperparameter dataclass (reference
  ``Controller.config.getCurrentScene()``, TF_IDF.java:36).
- :mod:`.schemas`    — StructTypes for the logical tables (SURVEY §1.2).
- :mod:`.sources`    — parquet IO + derived logical tables (clicks/news/
  tweets from the driver fixtures) with paired DuckDB oracle CTEs.
- :mod:`.functions`  — text functions F1-F4 and similarity kernels
  F5-F10 (pure Python + pandas-UDF + SQL twins).
- :mod:`.operators`  — the operator inventory (filters, joins,
  aggregates, ranking, dedup, similarity search, text stats,
  multimodal plumbing).
- :mod:`.plans`      — end-to-end pipelines (hot_topics, tf_idf,
  textrank) and precision evaluation.
- :mod:`.streaming`  — Structured Streaming extension of the daily loop.
"""

__version__ = "0.1.0"
