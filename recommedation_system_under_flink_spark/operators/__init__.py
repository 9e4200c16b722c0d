"""Operator inventory (SURVEY.md §2) plus the training-data-pipeline
extensions (dedup, similarity search, text stats, multimodal plumbing).

Each module pairs Spark DataFrame builders with DuckDB oracle SQL via
:mod:`..registry`.
"""
