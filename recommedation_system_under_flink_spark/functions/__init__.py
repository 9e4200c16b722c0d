"""Scalar / text function surface (SURVEY.md §2.7 F1-F12).

- :mod:`.text`    — F1 tokenizer, F2/F3 co-occurrence graphs, F4
  TextRank vote. Pure Python (unit-testable without Spark); wrapped as
  pandas UDFs in :mod:`.udfs`.
- :mod:`.kernels` — F5-F10 similarity kernels (pure Python + pandas
  UDFs + pure-SQL twins where the algebra allows).
"""
