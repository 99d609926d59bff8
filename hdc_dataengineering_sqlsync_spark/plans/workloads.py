"""Composite analytics workloads — multi-operator queries in the shape real
users run (TPC-H Q3/Q10 forms over the driver's TPC-H-ish testdata). Each
composes scan pushdown + selective joins + aggregation + top-k, so plan
regressions anywhere in the chain surface here (basis [G]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

_Q3_ORACLE = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate  > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@query("wl_unshipped_revenue", "2.x workloads", _Q3_ORACLE)
def wl_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders placed before a date but
    (partly) shipped after it, for one market segment. Both date/segment
    filters push into the scans; the segment filter makes customer small
    enough that AQE broadcasts it."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1994-10-01'
  AND o_orderdate <  DATE '1995-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("wl_returned_items", "2.x workloads", _Q10_ORACLE)
def wl_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned items in
    one quarter. Quarter + returnflag predicates push down; nation
    broadcasts."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1994-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_view_click_purchase
"""


@query("wl_event_funnel", "2.12 workloads", _FUNNEL_ORACLE)
def wl_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: users whose first view precedes a click precedes a
    purchase (each stage strictly after the previous stage's first hit).
    Three keyed min-aggregations chained by semi-filtering joins — each
    stage's frame shrinks, so the plan cost is dominated by the first scan;
    event-time comparisons stay exact (timestamp equality/order, no FP)."""
    e = load(spark, sf_dir, "events")
    # v and c (per-user first-hit frames, |users| rows) each feed the next
    # stage AND their own census count; checkpoint them so each stage scans
    # the fact once — the r10 plan audit caught the chain recomputing
    # (6 fact scans in one plan without this).
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=True)
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=True)
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


_Q5_ORACLE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate <  DATE '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("wl_local_supplier_volume", "2.12 workloads", _Q5_ORACLE)
def wl_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the customer and the line's
    supplier share a nation, restricted to one region and a two-year order
    window. The region/nation dims broadcast (tiny); the date filter pushes
    into the orders scan; the c_nationkey = s_nationkey residual rides the
    equi-join rather than forcing a separate shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         cast(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("wl_volume_shipping", "2.12 workloads", _Q7_ORACLE)
def wl_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between a pair of nations, by direction
    and year. Nation filters broadcast into both sides of the supplier/
    customer lookups so the disjunctive pair predicate is evaluated on tiny
    broadcast rows, not post-shuffle."""
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        F.col("supp_nation") == "NATION_7"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q9_ORACLE = """
SELECT nation, o_year,
       sum(amount_e4) / 10000.0 AS sum_profit
FROM (
  SELECT n_name AS nation,
         cast(year(o_orderdate) AS INTEGER) AS o_year,
         cast(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - cast(round(l_discount * 100, 0) AS BIGINT)) AS amount_e4
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("wl_product_profit", "2.12 workloads", _Q9_ORACLE)
def wl_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (sans partsupp, which the testdata lacks): revenue from
    parts whose name matches a pattern, per supplier nation per order year.
    The LIKE filter prunes part before its broadcast join; supplier/nation
    broadcast; only orders<->lineitem shuffles.

    Determinism: price/discount are 2-decimal values, so the per-line amount
    is reconstructed as exact integer 1e-4 units (price_cents * (100 -
    discount_pct)) and summed as int64 — associative, engine-identical —
    then scaled back once by a single identical division (no final round —
    Spark's repr-tie HALF_UP and DuckDB's binary-value decimal cast disagree
    exactly on .xx5 sums, observed at sf0.001). At unbounded scale the
    int64 headroom (~9e18) caps per-group volume at ~$9e14; a decimal(38,4)
    sum is the drop-in widening."""
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long"))
            ).alias("amount_e4"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("amount_e4") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("wl_customer_distribution", "2.12 workloads", _Q13_ORACLE)
def wl_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer, including
    zero-order customers via the left outer join (count(o_orderkey) skips
    nulls). Two-level aggregation: the second groupBy keys on the tiny
    distinct count domain, so it collapses to a near-free shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q14_ORACLE = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
"""


@query("wl_promo_revenue", "2.12 workloads", _Q14_ORACLE)
def wl_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue from promo parts.
    Conditional aggregation (sum-CASE) in a single pass; the month predicate
    pushes into the lineitem scan and part broadcasts."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("date"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))) / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
ORDER BY total_revenue DESC, s_suppkey
LIMIT 5
"""


@query("wl_top_supplier", "2.12 workloads", _Q15_ORACLE)
def wl_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top suppliers by one quarter's revenue (deterministic
    top-5 with a unique-key tiebreak instead of the spec's ties-included
    scalar-max, per SURVEY §2 convention 2). Aggregate lineitem first —
    the join input is then |suppliers| rows, and supplier broadcasts."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    return (
        rev.join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.col("total_revenue").desc(), "s_suppkey")
        .limit(5)
    )


_Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
  )
"""


@query("wl_small_qty_revenue", "2.12 workloads", _Q17_ORACLE)
def wl_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity is under 20%
    of the part's average, for one brand. The correlated scalar average is
    decorrelated into a per-part aggregate joined back; quantities are
    integral doubles so the avg threshold is bit-identical across engines.
    Brand filter first: the per-part average only needs lines of surviving
    parts, so the aggregate runs on the semi-joined subset, not all of
    lineitem."""
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    li = load(spark, sf_dir, "lineitem")
    brand_lines = li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    part_avg = brand_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_lines.join(F.broadcast(part_avg), brand_lines.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey,
       cast(o_orderdate AS DATE) AS o_orderdate,
       o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > 150
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@query("wl_large_volume_customer", "2.12 workloads", _Q18_ORACLE)
def wl_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold, with
    their customer. Pre-aggregate lineitem by order BEFORE joining (the
    HAVING filter runs on the slim aggregate, shrinking the join input);
    quantities are integral doubles, so the > threshold is exact."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            F.round(F.col("qty"), 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@query("wl_disjunctive_join", "2.12 workloads", _Q19_ORACLE)
def wl_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity conjunct
    bundles. The brand/size disjunction pre-filters part before broadcast
    (Catalyst pushes the part-only OR-branches down); the mixed
    part-x-lineitem residual evaluates post-join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


_Q22_ORACLE = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("wl_global_sales", "2.12 workloads", _Q22_ORACLE)
def wl_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey standing in for the phone prefix): customers
    with above-average positive balance and no orders, per nation. The scalar
    average broadcasts as a 1-row cross join; the NOT EXISTS is a left-anti
    join against the distinct buyer keyset. The threshold is rounded to 2dp
    on both sides (decimal-cast normalization) so the > comparison cannot
    straddle an engine-specific ulp."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    thresh = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, s_name, s_acctbal, n_name, supply_cost,
         row_number() OVER (PARTITION BY p_partkey ORDER BY supply_cost, s_suppkey) AS rn
  FROM part JOIN ps ON p_partkey = l_partkey JOIN eu ON l_suppkey = s_suppkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type IN ('LARGE', 'MEDIUM')
)
SELECT s_acctbal, s_name, n_name, p_partkey, round(supply_cost, 2) AS supply_cost
FROM cand WHERE rn = 1
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("wl_min_cost_supplier", "2.12 workloads", _Q2_ORACLE)
def wl_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (the testdata lacks partsupp, so the part<->supplier
    association is the distinct (l_partkey, l_suppkey) pairs observed in
    lineitem and "supply cost" is each pair's min l_extendedprice): for one
    part size-band/type bundle, the cheapest in-region supplier per part. The correlated
    min-cost subquery decorrelates into a per-part row_number window with a
    (cost, suppkey) tiebreak; min() is exact on doubles (no summation-order
    hazard). The pair aggregate shuffles on (partkey, suppkey) — everything
    after runs on |parts x region suppliers| rows, and the dims broadcast."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & F.col("p_type").isin("LARGE", "MEDIUM")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.min("l_extendedprice").alias("supply_cost"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("p_partkey").orderBy("supply_cost", "s_suppkey")
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(eu), ps.l_suppkey == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", F.round("supply_cost", 2).alias("supply_cost"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("wl_order_priority", "2.12 workloads", _Q4_ORACLE)
def wl_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (no l_commitdate/l_receiptdate in the testdata, so
    "late" is l_shipdate more than 90 days after the order date): orders in
    one quarter with at least one late line, counted per priority. The
    EXISTS is a left-semi join with a non-equi residual riding the orderkey
    equi-join; the quarter filter pushes into the orders scan and shrinks
    the semi-join's probe side before the shuffle."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


@query("wl_forecast_revenue", "2.12 workloads", _Q6_ORACLE)
def wl_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta if mid-range discounts were dropped for
    small quantities in one year. Pure scan-side query — all three
    predicates push into the parquet scan, no join, no pre-agg shuffle
    (one-row global aggregate). The discount bounds compare exactly: the
    data's discounts are 0.01-step doubles and both engines parse the same
    literals to the same doubles."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


_Q8_ORACLE = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_12' THEN volume ELSE 0.0 END) / sum(volume), 4) AS mkt_share
FROM (
  SELECT cast(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("wl_market_share", "2.12 workloads", _Q8_ORACLE)
def wl_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a product type's revenue
    sold into a region, per year. Eight-table join where everything except
    orders<->lineitem<->customer broadcasts; the share is a conditional-sum /
    total-sum ratio in one aggregation pass (no second scan for the
    denominator). Groups only exist where volume > 0, so the ratio never
    divides by zero."""
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_12", F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q11_ORACLE = """
WITH vals AS (
  SELECT l_partkey AS partkey,
         cast(sum(cast(round(l_extendedprice * 100, 0) AS BIGINT) * cast(l_quantity AS BIGINT)) AS BIGINT) AS value_e2
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'AFRICA'
  GROUP BY l_partkey
)
SELECT partkey, round(value_e2 / 100.0, 2) AS stock_value
FROM vals
WHERE value_e2 * 1000 > (SELECT cast(sum(value_e2) AS BIGINT) FROM vals)
ORDER BY stock_value DESC, partkey
"""


@query("wl_important_stock", "2.12 workloads", _Q11_ORACLE)
def wl_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (value = shipped price x quantity from one region's
    suppliers, standing in for partsupp supplycost x availqty): parts whose
    held value exceeds 1/1000 of the region total. Per-line value is exact
    int64 1e-2-dollar units (price_cents x integral quantity), so the sums
    and the threshold compare are bit-identical across engines — the spec's
    float-fraction HAVING would straddle ulps. The scalar total broadcasts
    as a 1-row cross join over the reused per-part aggregate (computed
    once, consumed twice). At unbounded scale the int64 headroom caps a
    part's value at ~$9e16; decimal(38,2) is the drop-in widening."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    region_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    line_val = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long") * F.col("l_quantity").cast("long")
    )
    vals = (
        li.join(F.broadcast(region_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(line_val).alias("value_e2"))
    )
    total = vals.agg(F.sum("value_e2").alias("total"))
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.col("value_e2") * 1000 > F.col("total"))
        .select("partkey", F.round(F.col("value_e2") / 100.0, 2).alias("stock_value"))
        .orderBy(F.col("stock_value").desc(), "partkey")
    )


_Q12_ORACLE = """
SELECT l_returnflag AS ship_class,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("wl_shipmode_priority", "2.12 workloads", _Q12_ORACLE)
def wl_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_returnflag stands in for the testdata's missing
    l_shipmode; the receipt-lag predicates collapse to a shipdate year):
    urgent vs non-urgent line counts per ship class. Both lineitem
    predicates push into the scan; the priority split is a pair of
    conditional sums in one aggregation over the orderkey join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("wl_parts_supplier", "2.12 workloads", _Q16_ORACLE)
def wl_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (association via distinct lineitem pairs; "complaint"
    suppliers = s_acctbal < 2000, a deterministic stand-in for the spec's
    comment LIKE): how many suppliers can furnish each surviving
    brand/type/size bucket. The NOT IN is a left-anti join against a tiny
    broadcast keyset (supplier keys are non-null, so NOT IN == anti join);
    the pair-distinct and the count-distinct shuffle on the same keys."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    complaints = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 2000.0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(complaints), pairs.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_Q20_ORACLE = """
SELECT s_name, n_name, r_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 60.0
  )
ORDER BY s_name
"""


@query("wl_potential_promotion", "2.12 workloads", _Q20_ORACLE)
def wl_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp availqty, so a supplier qualifies when it
    shipped >60 units of some matching part in the year — same nested
    IN-chain, threshold on the shipped aggregate itself): suppliers heavily
    moving a named part family, with their nation/region (no region
    predicate — the supplier dim is sparse at small SF and a region cut
    degenerates to zero rows). The part-name filter
    broadcasts into a semi join before the (suppkey, partkey) aggregate;
    the HAVING output collapses to a distinct supplier keyset that semi-
    joins the supplier dim with its broadcast nation/region lookups. Quantities are integral
    doubles, so the threshold compare is exact."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%")).select("p_partkey")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    heavy = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        )
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 60.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "n_name", "r_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("wl_suppliers_waiting", "2.12 workloads", _Q21_ORACLE)
def wl_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >60 days after the order date, for
    want of receipt/commit dates; no nation filter — the 10-supplier dim
    would degenerate to one row): late lines on finished multi-supplier
    orders where theirs was the ONLY late supplier. The EXISTS / NOT EXISTS
    pair decorrelates into two windowed distinct-supplier counts over the
    orderkey partition (sole shuffle; both window frames reuse it): a line
    qualifies iff it is late, the order has >1 distinct suppliers, and
    exactly 1 distinct late supplier (necessarily the line's own)."""
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    lines = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
        )
    )
    return (
        lines.where(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )
