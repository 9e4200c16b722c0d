"""End-to-end pipelines (SURVEY §3): HotTopics, TF_IDF, TextRank."""
