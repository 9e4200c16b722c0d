"""Rule-free 6-dp quantization shared by Spark plans and DuckDB oracles.

The r8 driver flips (sim_embedding_covariance, graph_modularity_report)
and the r9 ml_cv_ridge_path sf0.1 repro all share one mechanism: a
``ROUND(x, 6)`` on the hash path where x can land on (or within an ulp
of) an exact 6-dp half-boundary — Spark rounds HALF_UP over the
double's decimal form, DuckDB rounds the binary value, and the two
disagree exactly there. Gridded inputs make such boundaries COMMON,
not rare: e.g. ``n_chars²/(5000·ntok)`` is an exact odd multiple of
1.25e-5 for many ntok.

``FLOOR(x·1e6 + 0.5)`` has no rounding *rule* at all — both engines
evaluate the same IEEE multiply/add/floor on the same double and get
the same bits, for positive and negative x alike (halves go toward
+inf on both). Quantizing each TERM to integer micro-units before a
SUM also makes the accumulation exact and partition-order-free.

Usage: quantize terms with :func:`ppm_floor` / :func:`ppm_floor_sql`
(BIGINT micro-units — sum these), publish floats with
:func:`ppm_value` / :func:`ppm_value_sql` (the quantized double).
Keep the Spark expression and the SQL fragment textually parallel so
both engines walk the identical IEEE tree.

Range contract: |x| must stay below 2^63/1e6 ≈ 9.2e12 (the BIGINT
cast) and below 2^53/1e6 ≈ 9e9 for the micro-units to be EXACT
integers in the double domain. Every current call site is a ratio,
rate, statistic, or bounded aggregate orders of magnitude inside
that; a future absolute-count-sized publisher (e.g. corpus token
totals at 100 TB) should publish the BIGINT itself, not a quantized
double. Never feed an infinity sentinel through the quantizer
(DuckDB raises on CAST(inf AS BIGINT)) — CASE around it, as
samp_token_budget_waterfill does.

SUM contract (round-9 review, ENFORCED round 10): a SUM over BIGINT
micro-unit terms is HUGEINT on the DuckDB side, so a plain Spark LONG
sum would silently wrap exactly where DuckDB stays exact in the
very-large-n regime. :func:`ppm_sum` therefore accumulates terms as
DECIMAL(38,0) — the Spark mirror of HUGEINT: within range the double
read-out is bit-identical to the BIGINT path, and an out-of-contract
n·max|term|·1e6 product overflows the decimal to NULL (a loud
row/hash failure) instead of wrapping to a plausible wrong answer.
Every term-sum site (ml_cv_ridge_path Gram moments, ef_design_effect
between-cluster terms, prof_chi2_lang_source terms,
ev_forecast_backtest ewma error terms, cf_novelty_report bits terms,
sim_embedding_covariance moments) now accumulates through it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Micro-unit scale: 6 decimal places, matching the repo-wide
#: "ROUND(x, 6) every float output" canonicalizer contract.
PPM = 1_000_000


def ppm_floor(col: Column | str) -> Column:
    """``FLOOR(x·1e6 + 0.5)`` as BIGINT micro-units (sum-safe)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.floor(col * float(PPM) + 0.5).cast("long")


def ppm_value(col: Column) -> Column:
    """x quantized to the 6-dp grid as DOUBLE (publishable)."""
    return ppm_floor(col).cast("double") / float(PPM)


def ppm_sum(col: Column | str) -> Column:
    """SUM of :func:`ppm_floor` micro-unit terms, accumulated as
    DECIMAL(38,0) — the Spark mirror of DuckDB's HUGEINT SUM(BIGINT).
    Within the documented range the value is identical to a LONG sum;
    past it the decimal overflows to NULL (loud failure) where a LONG
    would silently wrap. Returns DECIMAL(38,0); cast to double for the
    final mirrored division."""
    return F.sum(ppm_floor(col).cast("decimal(38,0)"))


def ppm_floor_sql(expr: str) -> str:
    """DuckDB twin of :func:`ppm_floor` (textual mirror)."""
    return f"CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)"


def ppm_value_sql(expr: str) -> str:
    """DuckDB twin of :func:`ppm_value` (textual mirror)."""
    return f"CAST({ppm_floor_sql(expr)} AS DOUBLE) / 1000000.0"
