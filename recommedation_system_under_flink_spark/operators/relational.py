"""Relational analytics over the warehouse fixture tables.

The reference engine is a recommender, but a user migrating to this
engine gets a full SQL analytics surface for free — Spark's native
DataFrame/Catalyst path. This module pins that claim down with the
complete set of 22 classic warehouse query shapes (TPC-H-derived
Q1–Q22, adapted to the fixture schema — no partsupp table, so
Q9/Q11/Q16/Q20 re-anchor the supplier↔part relationship through
lineitem, and Q12/Q21 re-anchor "late" on ship-vs-order dates) over
the seven relational fixture tables that the recommender surface never
touches: scan+aggregate, selective-scan revenue, 3-way join + top-N,
6-way star join, semi-join EXISTS, returned-items ranking, a
conditional-share single-row aggregate, a two-role dimension join, a
decorrelated min-subquery, a HAVING large-order filter, a left-outer
count distribution, a MAX-equality aggregate view, a decorrelated
per-group AVG boundary, a disjunctive-pushdown sum, a global-average
anti-join, a per-year market-share ratio, a profit star, a
fraction-of-global-total threshold, a late-line priority split, a
COUNT(DISTINCT)+NOT-IN exclusion, a nested-IN dominance chain, and a
decorrelated only-late-supplier double-EXISTS.

Cross-engine determinism (the whole point of the implementation):

- **Money math is exact.** Doubles from parquet are cast to DECIMAL
  before multiplication (`l_extendedprice` → DECIMAL(18,4), rates →
  DECIMAL(9,4)), so ``price*(1-disc)*(1+tax)`` is exact rational
  arithmetic in BOTH engines — decimal sums are associative, immune to
  the float-summation-order nondeterminism that would flip value
  hashes between Spark partial aggregation and DuckDB. The finished
  aggregate is cast to DOUBLE once (one deterministic rounding of the
  same exact value on both sides).
- **Top-N is fully tiebroken** (sort key then primary key), so LIMIT
  selects an identical set in both engines.
- Date bounds are literals of the **stored** column type (see
  ``_dt_lit``), so they reach the parquet scan as PushedFilters.

Scale notes (100 TB): dimensions (region, nation, filtered customer,
supplier, part) are broadcast — no shuffle for the star joins; the
fact-side scans carry pushed date/flag predicates (row-group pruning);
the aggregates are partial-aggregated map-side before the final
shuffle on low-cardinality keys. AQE re-plans the orders⋈lineitem
shuffle join (the only big⋈big here) and splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_raw

#: Exact-decimal casts (see module docstring). 4 fractional digits
#: round-trips the 2-dp money/rate doubles exactly and identically in
#: both engines; products stay inside DECIMAL(38) unreduced.
_EP = "CAST(l_extendedprice AS DECIMAL(18,4))"
_DISC = "CAST(l_discount AS DECIMAL(9,4))"
_TAX = "CAST(l_tax AS DECIMAL(9,4))"
_QTY = "CAST(l_quantity AS DECIMAL(18,4))"
#: revenue := extendedprice * (1 - discount), exact.
REVENUE = f"{_EP} * (1 - {_DISC})"
#: charge := revenue * (1 + tax), exact. The intermediate is re-cast to
#: DECIMAL(18,6) (lossless: price 2dp × rate 2dp → ≤4 fractional
#: digits) so the second product stays inside DECIMAL(38) in BOTH
#: engines — without it Spark's (29,8)×(10,4) result needs precision 40
#: and rounds the scale down, while DuckDB spills to DOUBLE, and the
#: two SUMs drift apart (round-2 local hash mismatch on sum_charge).
CHARGE = f"CAST({REVENUE} AS DECIMAL(18,6)) * (1 + {_TAX})"


def _dsum(expr: str) -> str:
    """Compared-output form of a DECIMAL aggregate: quantize to 2 dp in
    exact decimal space via ROUND (half-away-from-zero in BOTH engines
    — DuckDB's decimal->decimal CAST truncates, so never quantize with
    a cast), THEN cast to DOUBLE.
    Casting a wide decimal sum straight to DOUBLE is engine-divergent:
    DuckDB converts via int128 -> double -> divide-by-10^scale, which
    double-rounds once the scaled integer exceeds 2^53 (measured: Q1's
    scale-10 sum_charge came back 4e-8 off the correctly-rounded value
    Spark/Python produce). At 2 dp the scaled money sums stay far below
    2^53, so the final cast is exact everywhere."""
    return f"CAST(ROUND(SUM({expr}), 2) AS DOUBLE)"


def _dt_lit(df: DataFrame, col: str, day: str) -> Column:
    """Literal for comparing against a stored date-ish column, typed to
    match the column (timestamp_ntz / timestamp / date / bigint nanos)
    so the predicate pushes into the parquet scan un-cast."""
    kind = dict(df.dtypes)[col]
    if kind == "bigint":  # nanos-as-long fixture encoding
        import datetime as dt

        from ..sources.tables import date_to_nanos

        return F.lit(date_to_nanos(dt.date.fromisoformat(day)))
    if kind == "date":
        return F.expr(f"DATE '{day}'")
    if kind == "timestamp_ntz":
        return F.expr(f"TIMESTAMP_NTZ '{day} 00:00:00'")
    return F.expr(f"TIMESTAMP '{day} 00:00:00'")  # session tz pinned UTC


@register(
    "rel_q1_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
       {_dsum(_QTY)} AS sum_qty,
       {_dsum(_EP)} AS sum_base_price,
       {_dsum(REVENUE)} AS sum_disc_price,
       {_dsum(CHARGE)} AS sum_charge,
       CAST(SUM({_QTY}) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM({_DISC}) AS DOUBLE) / COUNT(*) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
)
def rel_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-scan pricing summary. Pure scan→partial
    agg→4-row final agg; the shipdate bound and the 6-column projection
    push to the scan. The canonical whole-stage-codegen aggregate."""
    li = load_raw(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= _dt_lit(li, "l_shipdate", "2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(_dsum(_QTY)).alias("sum_qty"),
            F.expr(_dsum(_EP)).alias("sum_base_price"),
            F.expr(_dsum(REVENUE)).alias("sum_disc_price"),
            F.expr(_dsum(CHARGE)).alias("sum_charge"),
            (F.expr(f"CAST(SUM({_QTY}) AS DOUBLE)") / F.count("*")).alias("avg_qty"),
            (F.expr(f"CAST(SUM({_DISC}) AS DOUBLE)") / F.count("*")).alias(
                "avg_disc"
            ),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "rel_q3_shipping_priority",
    f"""SELECT l_orderkey,
       {_dsum(REVENUE)} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM({REVENUE}) DESC, l_orderkey
LIMIT 10""",
)
def rel_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ orders ⋈ lineitem,
    top-10 open orders by outstanding revenue. The filtered customer
    dim broadcasts (no shuffle); orders⋈lineitem is the one shuffle
    join. LIMIT is deterministic: exact-decimal sort key + orderkey
    tiebreak."""
    cust = load_raw(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_raw(spark, sf_dir, "orders")
    orders = orders.filter(
        F.col("o_orderdate") < _dt_lit(orders, "o_orderdate", "1998-06-01")
    )
    li = load_raw(spark, sf_dir, "lineitem")
    li = li.filter(F.col("l_shipdate") > _dt_lit(li, "l_shipdate", "1998-06-01"))
    rev = F.expr(f"SUM({REVENUE})")
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                F.col("o_custkey") == F.col("c_custkey"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(rev, 2).cast("double").alias("revenue"),
            rev.alias("_rk"),
        )
        .orderBy(F.col("_rk").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "rel_q5_local_supplier_volume",
    f"""SELECT n_name, {_dsum(REVENUE)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name""",
)
def rel_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join — revenue by nation where the
    customer and the supplier share the nation (the "local" predicate).
    region→nation, supplier, and customer are all broadcast dims; the
    only shuffle join is orders⋈lineitem. At 100 TB the star arms stay
    broadcast (dims are small by definition); AQE splits any skewed
    orderkey."""
    nation = load_raw(spark, sf_dir, "nation")
    region = load_raw(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = load_raw(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = load_raw(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_raw(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= _dt_lit(orders, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _dt_lit(orders, "o_orderdate", "1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = load_raw(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.expr(_dsum(REVENUE)).alias("revenue"))
    )


@register(
    "rel_q4_order_priority",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority""",
)
def rel_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a **left-semi join** (never a count
    subquery per row): orders in a quarter having at least one lineitem
    shipped after the order date, counted by priority. The semi-join
    shuffles on orderkey and short-circuits on first match — no
    duplicate blow-up, no distinct needed."""
    orders = load_raw(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= _dt_lit(orders, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _dt_lit(orders, "o_orderdate", "1996-04-01"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_raw(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "rel_q10_returned_items",
    f"""SELECT c_custkey, c_name,
       {_dsum(REVENUE)} AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY SUM({REVENUE}) DESC, c_custkey
LIMIT 20""",
)
def rel_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    a half-year window. customer and nation broadcast; deterministic
    LIMIT via exact-decimal key + custkey tiebreak."""
    cust = load_raw(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_raw(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_raw(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= _dt_lit(orders, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _dt_lit(orders, "o_orderdate", "1996-07-01"))
    ).select("o_orderkey", "o_custkey")
    li = load_raw(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = F.expr(f"SUM({REVENUE})")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(rev, 2).cast("double").alias("revenue"),
            rev.alias("_rk"),
        )
        .orderBy(F.col("_rk").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "rel_q14_promo_share",
    f"""SELECT CAST(100.0 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE}
                       ELSE CAST(0 AS DECIMAL(9,4)) END), 2) AS DOUBLE)
       / CAST(ROUND(SUM({REVENUE}), 2) AS DOUBLE) AS DOUBLE) AS promo_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""",
)
def rel_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts.
    part broadcasts against the date-pruned lineitem scan; the
    conditional and total sums are exact decimals, divided once as
    doubles (identical in both engines)."""
    part = load_raw(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_raw(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _dt_lit(li, "l_shipdate", "1996-03-01"))
        & (F.col("l_shipdate") < _dt_lit(li, "l_shipdate", "1996-04-01"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    promo = F.expr(
        f"SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE} "
        f"ELSE CAST(0 AS DECIMAL(9,4)) END)"
    )
    total = F.expr(f"SUM({REVENUE})")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.round(promo, 2).cast("double")
                / F.round(total, 2).cast("double")
            )
            .cast("double")
            .alias("promo_share")
        )
    )


@register(
    "rel_q7_nation_volume",
    f"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       {_dsum(REVENUE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY cn.n_name, sn.n_name""",
)
def rel_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume — the SAME dimension
    joined in TWO roles (customer's nation, supplier's nation), the
    aliasing pattern every star schema needs. Both roles broadcast;
    the inequality predicate runs post-join on the two broadcast
    columns (it can't prune a scan — it relates two dims)."""
    nation = load_raw(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = load_raw(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_raw(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_raw(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= _dt_lit(orders, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _dt_lit(orders, "o_orderdate", "1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    li = load_raw(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.expr(_dsum(REVENUE)).alias("revenue"))
    )


@register(
    "rel_q2_min_cost_part",
    """SELECT p_partkey, p_brand, min_price,
       CAST(n_offers AS BIGINT) AS n_offers
FROM (
  SELECT l_partkey AS p_partkey,
         MIN(l_extendedprice / l_quantity) AS min_price,
         COUNT(*) AS n_offers
  FROM lineitem GROUP BY l_partkey
)
JOIN part USING (p_partkey)
WHERE p_size >= 40""",
)
def rel_q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (decorrelated): cheapest observed unit price per
    part, restricted to large parts. The classic correlated
    ``WHERE price = (SELECT MIN(...) ...)`` is expressed directly as
    aggregate-then-join — the decorrelation Catalyst would have to
    perform, written as the plan you want: one partial-aggregated
    groupBy on the fact, one broadcast dim join, no per-row subquery.
    Unit price is a double ratio of two stored doubles — identical
    operand bits and one IEEE division in both engines, so MIN is
    hash-stable without quantization."""
    li = load_raw(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    )
    part = load_raw(spark, sf_dir, "part").filter(F.col("p_size") >= 40).select(
        "p_partkey", "p_brand"
    )
    agg = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.min("unit").alias("min_price"), F.count("*").alias("n_offers")
    )
    return agg.join(F.broadcast(part), "p_partkey").select(
        "p_partkey", "p_brand", "min_price", "n_offers"
    )


@register(
    "rel_q6_revenue_change",
    f"""SELECT {_dsum(f'{_EP} * {_DISC}')} AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24""",
)
def rel_q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical **selective-scan** aggregate —
    what-if revenue delta from eliminating a discount band. No join,
    no groupBy: the whole query is predicate pushdown (date range,
    discount band, quantity cap all reach the scan) + one exact-DECIMAL
    map-side sum. The query benchmarks say the most about scan/pruning
    throughput."""
    li = load_raw(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _dt_lit(li, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < _dt_lit(li, "l_shipdate", "1997-01-01"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.expr(_dsum(f'{_EP} * {_DISC}')).alias("revenue_delta"))
    )


@register(
    "rel_q18_large_orders",
    f"""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM({_QTY}) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM({_QTY}) > 150
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey""",
)
def rel_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: **HAVING over a fact aggregate** — orders whose
    total quantity exceeds a threshold, joined back to their customer.
    The aggregate-then-filter runs entirely before the joins (Catalyst
    keeps the HAVING on the aggregate, so only qualifying orderkeys
    reach the join); customer broadcasts. Exact-DECIMAL quantity sums
    make the threshold test engine-identical at the boundary."""
    li = load_raw(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr(f"SUM({_QTY})").alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > 150)
    )
    orders = load_raw(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_raw(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
    )


@register(
    "rel_q13_customer_distribution",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count""",
)
def rel_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: **left-outer join + double aggregation** — the
    distribution of order counts per customer, keeping zero-order
    customers (the outer join is the point; Q13 is the only TPC-H query
    that needs one). The non-urgent predicate lives in the JOIN
    condition, not WHERE, so customers whose orders are all urgent
    still count as 0. ``COUNT(o_orderkey)`` counts non-null matches in
    both engines. Plan: one shuffle join on custkey (orders filtered
    before the join), one partial-aggregated count per customer, then a
    tiny second aggregate on the count value — at 100 TB the second
    groupBy has at most a few thousand distinct keys."""
    cust = load_raw(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_raw(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "rel_q15_top_supplier",
    f"""WITH rev AS (
  SELECT l_suppkey AS s_suppkey, SUM({REVENUE}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier USING (s_suppkey)
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""",
)
def rel_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: **aggregate view + MAX-equality subquery** —
    the supplier(s) with the highest revenue in a quarter. The revenue
    view is computed once and reused for both the MAX scalar and the
    equality filter (Spark: same DataFrame object → AQE reuses the
    exchange). Because revenue is an exact DECIMAL sum, the equality
    against MAX is bit-identical in both engines — with double sums
    this query is the canonical cross-engine flake. The 1-row MAX
    broadcasts; supplier broadcasts; the only shuffle is the suppkey
    aggregate."""
    li = load_raw(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _dt_lit(li, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < _dt_lit(li, "l_shipdate", "1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.expr(f"SUM({REVENUE})").alias("total_rev"))
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = load_raw(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), "s_suppkey")
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "rel_q17_small_quantity_revenue",
    f"""SELECT CAST(ROUND(SUM({_EP}), 2) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey,
         SUM({_QTY}) AS sum_qty, COUNT(*) AS cnt_qty
  FROM lineitem GROUP BY l_partkey
) a ON a_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND {_QTY} * 5 * cnt_qty < sum_qty""",
)
def rel_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: **decorrelated per-group AVG subquery** —
    revenue from orders below 20% of the part's average quantity.
    The correlated ``l_quantity < 0.2 * (SELECT AVG(l_quantity) ...)``
    is decorrelated into aggregate-then-join, and the boundary test is
    cross-multiplied into exact-DECIMAL integer arithmetic
    (``qty * 5 * cnt < sum``) — an AVG of doubles differs between
    Spark's partial aggregation and DuckDB's single pass in the last
    ulp, which would flip boundary rows. Plan: one suppkey-free fact
    self-aggregate (partial map-side), broadcast of the filtered part
    dim, shuffle join on partkey, single-row decimal sum."""
    li = load_raw(spark, sf_dir, "lineitem")
    part = (
        load_raw(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.expr(f"SUM({_QTY})").alias("sum_qty"),
        F.count("*").alias("cnt_qty"),
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.expr(f"{_QTY} * 5 * cnt_qty < sum_qty"))
        .agg(
            (F.expr(f"CAST(ROUND(SUM({_EP}), 2) AS DOUBLE)") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "rel_q19_disjunctive_revenue",
    f"""SELECT {_dsum(REVENUE)} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)""",
)
def rel_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: **disjunctive (OR-of-ANDs) predicate pushdown**.
    Catalyst factors the common conjuncts out of the disjunction: the
    lineitem scan gets ``l_quantity BETWEEN 1 AND 30`` and the part
    scan gets the brand/size disjunction as PushedFilters, so both
    sides prune before the join instead of evaluating the OR on the
    full cross section. Part broadcasts; single-row exact-decimal sum.
    The query is the standard test that an engine doesn't give up on
    pushdown the moment predicates stop being simple conjunctions."""
    li = load_raw(spark, sf_dir, "lineitem")
    part = load_raw(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(F.expr(_dsum(REVENUE)).alias("revenue"))


@register(
    "rel_q22_inactive_rich_customers",
    """WITH bal AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS sum_bal,
         COUNT(*) AS cnt_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS totacctbal
FROM customer, bal
WHERE CAST(c_acctbal AS DECIMAL(18,4)) * cnt_bal > sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey""",
)
def rel_q22_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: **global-average subquery + anti-join** —
    customers with above-average balance who never placed an urgent
    order, grouped by nation (standing in for the phone country code
    the fixture schema doesn't carry; the urgency predicate replaces
    Q22's "no orders at all", which is vacuous on the fixtures where
    every customer has orders). The above-average test is
    cross-multiplied into exact DECIMAL (``bal * cnt > sum``) for the
    same boundary-determinism reason as Q17. The 1-row global aggregate
    broadcasts; ``NOT EXISTS`` is a left-anti join against the
    filtered, projected orders custkeys — at 100 TB that anti-join
    shuffles on custkey, and AQE converts it to broadcast when the
    filtered rich side is small."""
    cust = load_raw(spark, sf_dir, "customer")
    bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.expr("SUM(CAST(c_acctbal AS DECIMAL(18,4)))").alias("sum_bal"),
        F.count("*").alias("cnt_bal"),
    )
    orders = (
        load_raw(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = cust.crossJoin(F.broadcast(bal)).filter(
        F.expr("CAST(c_acctbal AS DECIMAL(18,4)) * cnt_bal > sum_bal")
    )
    return (
        rich.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.expr(
                "CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)"
            ).alias("totacctbal"),
        )
    )


@register(
    "rel_q8_market_share",
    f"""WITH all_nations AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {REVENUE} AS volume,
         s_nationkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CASE WHEN s_nationkey = 8 THEN volume
                           ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
         AS nation_volume,
       {_dsum("volume")} AS total_volume,
       ROUND(CAST(ROUND(SUM(CASE WHEN s_nationkey = 8 THEN volume
                                 ELSE CAST(0 AS DECIMAL(18,6)) END), 6)
                  AS DOUBLE)
             / CAST(ROUND(SUM(volume), 6) AS DOUBLE), 6) AS mkt_share
FROM all_nations
GROUP BY o_year""",
)
def rel_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: **market share within group** — nation 8's
    share of PROMO-part revenue sold into ASIA, by order year. The
    numerator and denominator are both exact-DECIMAL sums over the
    same joined relation (one star join, one aggregate — no
    self-join); the share divides the two after a 6-dp decimal
    quantization on each, so the single double division sees identical
    operands in both engines. Six-way star: region→nation, customer,
    supplier, part all broadcast; orders⋈lineitem is the one shuffle
    join, with the date range pushed to the orders scan and the type
    filter pushed to part."""
    nation = load_raw(spark, sf_dir, "nation")
    region = load_raw(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        load_raw(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = load_raw(spark, sf_dir, "orders")
    orders = orders.filter(
        (F.col("o_orderdate") >= _dt_lit(orders, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _dt_lit(orders, "o_orderdate", "1998-01-01"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    part = (
        load_raw(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = load_raw(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_raw(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.expr(REVENUE)
    nation_vol = F.sum(
        F.when(F.col("s_nationkey") == 8, vol).otherwise(
            F.expr("CAST(0 AS DECIMAL(18,6))")
        )
    )
    total_vol = F.sum(vol)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("o_year").cast("long").alias("o_year"))
        .agg(
            F.round(nation_vol, 2).cast("double").alias("nation_volume"),
            F.round(total_vol, 2).cast("double").alias("total_volume"),
            F.round(
                F.round(nation_vol, 6).cast("double")
                / F.round(total_vol, 6).cast("double"),
                6,
            ).alias("mkt_share"),
        )
    )


#: Q9 profit terms: revenue minus a retail-cost stand-in for the absent
#: partsupp.ps_supplycost (the fixture carries no partsupp table). Both
#: factors re-cast to DECIMAL(18,6) (lossless at fixture magnitudes) so
#: the difference stays inside DECIMAL(38) in both engines, as CHARGE
#: does for its product.
_COST = f"CAST(CAST(p_retailprice AS DECIMAL(18,4)) * {_QTY} AS DECIMAL(18,6))"
_PROFIT = f"CAST({REVENUE} AS DECIMAL(18,6)) - {_COST}"


@register(
    "rel_q9_product_profit",
    f"""SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       {_dsum(_PROFIT)} AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year""",
)
def rel_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: **product-type profit by nation and year** — the
    widest unfiltered-fact star in the suite (lineitem joined to four
    other tables with no date pruning; only the part-name LIKE cuts the
    fact). The fixture has no partsupp, so supply cost is stood in by
    ``p_retailprice × quantity`` (same join arms, same aggregate
    shape). The LIKE-filtered part dim and supplier→nation broadcast;
    orders⋈lineitem is the one shuffle join; profit is an exact-DECIMAL
    difference so the per-(nation, year) sums hash identically. At
    100 TB this query is the partial-aggregation stress test: ~25
    nations × ~7 years of final groups, millions of map-side partials."""
    li = load_raw(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    orders = load_raw(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    supp = load_raw(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_raw(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = (
        load_raw(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.expr(_dsum(_PROFIT)).alias("sum_profit"))
    )


@register(
    "rel_q11_important_stock",
    f"""WITH v AS (
  SELECT l_partkey AS p_partkey,
         SUM({_EP}) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_8'
  GROUP BY l_partkey
)
SELECT p_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS value
FROM v
WHERE val * (SELECT COUNT(*) FROM v) > 2 * (SELECT SUM(val) FROM v)""",
)
def rel_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: **fraction-of-global-total threshold** — parts
    whose traded value through one nation's suppliers exceeds twice the
    nation's mean per-part value (partsupp value stood in by lineitem
    extendedprice through the supplier arm; TPC-H scales Q11's
    ``0.0001/SF`` fraction with data size — anchoring on the mean is
    the scale-free equivalent, non-trivial at every fixture SF). The
    per-part aggregate is computed ONCE and reused for both the scalar
    total and the filter (same DataFrame object → AQE reuses the
    exchange, exactly the Q15 pattern); the threshold is
    cross-multiplied into exact DECIMAL (``val × cnt > 2 × total``) so
    the boundary never flips between engines. Supplier/nation
    broadcast; one partkey shuffle aggregate; the 1-row total
    broadcasts back."""
    nation = load_raw(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_8"
    )
    supp = load_raw(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_raw(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    v = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.expr(f"SUM({_EP})").alias("val"))
    )
    total = v.agg(
        F.sum("val").alias("total_val"), F.count("*").alias("n_parts")
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val") * F.col("n_parts") > 2 * F.col("total_val"))
        .select(
            "p_partkey", F.round("val", 2).cast("double").alias("value")
        )
    )


@register(
    "rel_q12_late_lines_by_class",
    """SELECT l_linestatus AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus""",
)
def rel_q12_late_lines_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: **late-shipment count split by order priority**
    — lines shipped more than 90 days after their order date in one
    year, counted per line status (standing in for the l_shipmode the
    fixture doesn't carry) and split urgent/other with conditional
    sums. The join-condition comparison between two fact-side columns
    (``l_shipdate > o_orderdate + 90d``) can only run post-join, but
    the one-year shipdate range still prunes the lineitem scan; the
    orderkey shuffle join is the only exchange before a 2-row final
    aggregate."""
    li = load_raw(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _dt_lit(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < _dt_lit(li, "l_shipdate", "1997-01-01"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = load_raw(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.expr("l_shipdate > o_orderdate + INTERVAL '90' DAY"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "rel_q16_supplier_part_counts",
    """SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#23'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size""",
)
def rel_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: **COUNT(DISTINCT) + NOT-IN exclusion** — how
    many distinct suppliers ship each qualifying (brand, type, size)
    combination, excluding blacklisted suppliers (negative account
    balance standing in for Q16's complaint-comment scan; the supplier
    relationship comes through lineitem since the fixture has no
    partsupp). The NOT IN is a **left-anti join** against the tiny
    filtered supplier list (broadcast — safe here because s_suppkey is
    never NULL, which is what makes NOT IN and anti-join equivalent);
    part's brand/type/size predicates push to its scan. The distinct
    count shuffles (group-keys × suppkey) pairs once — Spark's two-phase
    distinct aggregate — which at 100 TB is bounded by distinct pairs,
    not fact rows."""
    part = (
        load_raw(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#23")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_raw(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_raw(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "rel_q20_dominant_suppliers",
    f"""WITH shipped AS (
  SELECT l_suppkey, l_partkey, SUM({_QTY}) AS qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%blue%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
), tot AS (
  SELECT l_partkey AS t_partkey, SUM(qty) AS total_qty
  FROM shipped GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN shipped ON l_suppkey = s_suppkey
JOIN tot ON t_partkey = l_partkey
WHERE n_name = 'NATION_8' AND qty * 4 > total_qty""",
)
def rel_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: **nested-IN semi-join chain** — one nation's
    suppliers who shipped more than a quarter of a qualifying part's
    total volume in a year (Q20's ``ps_availqty > 0.5 × shipped qty``
    re-anchored on shipped share, since the fixture has no partsupp;
    the 25% bar keeps the answer non-empty at every fixture SF).
    The correlated fraction-of-total subquery is decorrelated into
    aggregate-then-join: per-(supplier, part) quantities joined to
    per-part totals derived from the SAME aggregate (exchange reuse),
    threshold cross-multiplied into exact DECIMAL (``qty × 4 >
    total``). The name-LIKE part filter and year range prune the fact
    scan; nation-filtered supplier broadcasts; the DISTINCT collapses a
    supplier qualifying via several parts — a left-semi in spirit,
    written as joins because the probe side also carries the output
    columns."""
    part = (
        load_raw(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    li = load_raw(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _dt_lit(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < _dt_lit(li, "l_shipdate", "1997-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.expr(f"SUM({_QTY})").alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    nation = load_raw(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_8"
    )
    supp = load_raw(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        shipped.join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("qty") * 4 > F.col("total_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "rel_q21_waiting_suppliers",
    """WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_o AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM lo GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_o
JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 100""",
)
def rel_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: **suppliers who kept orders waiting** — on
    finalized multi-supplier orders, the supplier who was the ONLY late
    one ("late" = shipped >60 days after the order date, standing in
    for the receipt-vs-commit dates the fixture doesn't carry), ranked
    by how many orders they alone held up. Q21's EXISTS(other supplier)
    / NOT EXISTS(other LATE supplier) pair of correlated self-joins is
    decorrelated into ONE aggregate over the order's lines:
    ``n_supp ≥ 2`` IS the exists, ``n_late = 1`` IS the not-exists, and
    ``MAX(CASE late)`` recovers the unique culprit — one orderkey
    shuffle instead of two extra fact self-joins (the naive plan reads
    lineitem three times; at 100 TB that is 3× scan + 3× shuffle).
    Supplier broadcasts onto the tiny aggregate; top-100 is
    deterministic via the suppkey tiebreak."""
    orders = (
        load_raw(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_raw(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.expr(
            "CASE WHEN l_shipdate > o_orderdate + INTERVAL '60' DAY "
            "THEN 1 ELSE 0 END"
        ).alias("late"),
    )
    per_o = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    supp = load_raw(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_o.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(100)
    )


# ---------------------------------------------- entity resolution

#: Digit positions of the 9-digit customer-name suffix masked by the
#: blocking passes (chars 10..18 of ``Customer#%09d``). Dropping one
#: position per pass gives EXACT recall for substitution-distance-1
#: pairs whose differing digit lies in positions 6-9 — the range that
#: varies at fixture scales; higher positions would add passes, not a
#: different shape.
ER_MASK_POSITIONS = (6, 7, 8, 9)


@register(
    "rel_entity_blocking",
    f"""WITH keys AS (
  SELECT c_custkey, c_name, p,
         substr(c_name, 1, 9 + p - 1) || '_' || substr(c_name, 9 + p + 1)
           AS bkey
  FROM customer
  CROSS JOIN (SELECT unnest([{", ".join(map(str, ER_MASK_POSITIONS))}]) AS p)
), pairs AS (
  SELECT DISTINCT a.c_custkey AS ck_a, b.c_custkey AS ck_b,
                  a.c_name AS name_a, b.c_name AS name_b
  FROM keys a
  JOIN keys b ON a.bkey = b.bkey AND a.p = b.p
            AND a.c_custkey < b.c_custkey
)
SELECT ck_a, ck_b, name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
FROM pairs
WHERE levenshtein(name_a, name_b) <= 1""",
)
def rel_entity_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Entity resolution via multi-pass blocking** — the fuzzy-match
    family: candidate near-duplicate customer identities from
    drop-one-position blocking keys (mask one digit of the 9-digit
    name suffix per pass), verified by exact Levenshtein ≤ 1. Classic
    ER shape: blocking bounds the candidate set (each key bucket holds
    ≤ 10 names — the 10 values of the masked digit), the expensive
    string distance runs ONLY on candidates, and the union of passes
    restores recall a single key would lose. For pure substitution
    typos in the masked range the recall is exact by construction;
    insertions/transpositions would need q-gram keys — more passes,
    same plan.

    Plan: one projection fans each name into |passes| keys, one
    equi-join on (pass, key) — hash-partitioned buckets, never
    all-pairs — then the verify filter. Both engines implement the
    same classic Levenshtein (cross-checked on fixture and planted
    typos in pytest)."""
    cust = load_raw(spark, sf_dir, "customer").select("c_custkey", "c_name")
    poss = spark.createDataFrame(
        [(p,) for p in ER_MASK_POSITIONS], "p int"
    )
    keys = cust.crossJoin(F.broadcast(poss)).select(
        "c_custkey",
        "c_name",
        "p",
        F.concat(
            F.expr("substr(c_name, 1, 9 + p - 1)"),
            F.lit("_"),
            F.expr("substr(c_name, 9 + p + 1)"),
        ).alias("bkey"),
    )
    a = keys.select(
        F.col("c_custkey").alias("ck_a"),
        F.col("c_name").alias("name_a"),
        "p",
        "bkey",
    )
    b = keys.select(
        F.col("c_custkey").alias("ck_b"),
        F.col("c_name").alias("name_b"),
        "p",
        "bkey",
    )
    pairs = (
        a.join(b, ["p", "bkey"])
        .filter(F.col("ck_a") < F.col("ck_b"))
        .select("ck_a", "ck_b", "name_a", "name_b")
        .distinct()
    )
    lev = F.levenshtein("name_a", "name_b")
    return pairs.filter(lev <= 1).select(
        "ck_a",
        "ck_b",
        "name_a",
        "name_b",
        lev.cast("long").alias("lev"),
    )


# ------------------------------------------------ market-basket pairs

#: Basket-pair mining output cap (deterministic rank tie-break).
BASKET_TOP = 50

_BASKET_ORACLE = f"""WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pop AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS pop FROM b GROUP BY l_partkey
),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
pairs AS (
  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS co_orders
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY x.l_partkey, y.l_partkey
)
SELECT part_a, part_b, co_orders,
       ROUND(co_orders * n.n_orders
             / CAST(pa.pop * pb.pop AS DOUBLE), 6) AS lift
FROM pairs
JOIN pop pa ON part_a = pa.l_partkey
JOIN pop pb ON part_b = pb.l_partkey
CROSS JOIN n
ORDER BY co_orders DESC, part_a ASC, part_b ASC
LIMIT {BASKET_TOP}"""


@register("rel_basket_pairs", _BASKET_ORACLE)
def rel_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**Market-basket pair mining** on the order side: part pairs
    co-purchased in the same order, with lift against independent
    popularity — cf_association_rules' shape transplanted from click
    baskets to transactions. The pair join is the inverted-index
    pattern keyed on l_orderkey, so work is Σ(basket size)² with
    baskets ≤ ~13 items — bounded fan-out per key, never an item×item
    cross; popularity and the 1-row order count broadcast into the
    lift. Top-{BASKET_TOP} with a fully pinned tie-break."""
    # NOTE (r13): five consumers (pop, order total, both pair sides)
    # over the basket relation; the r12 persist MEASURED 1.7x slower
    # than re-running the pruned scan+distinct (2.89 vs 1.71 s
    # min-of-5) — reverted; at 100 TB materialize the basket relation
    # once at the pipeline level (s19 pattern). OPTIMIZATION_r13.md.
    b = load_raw(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    pop = b.groupBy("l_partkey").agg(F.count("*").alias("pop"))
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    x = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    y = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        x.join(y, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("co_orders"))
    )
    out = (
        pairs.join(
            F.broadcast(pop.select(F.col("l_partkey").alias("part_a"),
                                   F.col("pop").alias("pop_a"))), "part_a")
        .join(
            F.broadcast(pop.select(F.col("l_partkey").alias("part_b"),
                                   F.col("pop").alias("pop_b"))), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "co_orders",
            F.round(
                F.col("co_orders") * F.col("n_orders")
                / (F.col("pop_a") * F.col("pop_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("co_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP)
    )
    return out
