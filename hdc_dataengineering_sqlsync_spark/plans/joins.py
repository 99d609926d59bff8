"""SURVEY.md §2.3 — joins.

Scale notes: every equi-join here shuffles on its key (or broadcasts the
small side); the theta join is brand-blocked so it never degenerates to a
full cross product; the as-of join is a single window pass (one shuffle by
user) instead of a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load


@query(
    "join_inner_equi",
    "2.3 joins",
    """
    SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("c_mktsegment")
    )


_MULTIWAY_ORACLE = """
SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def _multiway(spark: SparkSession, sf_dir: str, hint: bool) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    if hint:
        n, r = F.broadcast(n), F.broadcast(r)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("r_name")
    )


@query("join_multiway_chain", "2.3 joins", _MULTIWAY_ORACLE, bench=True)
def join_multiway_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape. AQE converts the dimension joins to broadcast at
    runtime; the fact-fact lineitem⋈orders join shuffles on orderkey."""
    return _multiway(spark, sf_dir, hint=False)


@query("join_broadcast_hint", "2.3 joins", _MULTIWAY_ORACLE)
def join_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logical result with explicit broadcast hints on the dimension
    tables — the 100 TB-safe form (never shuffles the fact table for dims).
    Physical-plan difference asserted in tests/test_plans.py."""
    return _multiway(spark, sf_dir, hint=True)


@query(
    "join_left_outer",
    "2.3 joins",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey HAVING count(o_orderkey) = 0 ORDER BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .where(F.col("n_orders") == 0)
        .orderBy("c_custkey")
    )


_DIFF_ORACLE = """
WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'),
     b AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000)
SELECT CASE WHEN a.o_orderkey IS NULL THEN 'right_only'
            WHEN b.o_orderkey IS NULL THEN 'left_only'
            ELSE 'both' END AS side,
       count(*) AS n
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
GROUP BY side ORDER BY side
"""


@query("join_full_outer_diff", "2.3 joins", _DIFF_ORACLE, bench=True)
def join_full_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer classify — the core table-diff shape the sync engine is
    built on (see operators/diff.py for the full row-digest version)."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("a_key"), "o_totalprice"
    )
    b = o.where(F.col("o_totalprice") > 100000).select(F.col("o_orderkey").alias("b_key"))
    side = (
        F.when(F.col("a_key").isNull(), "right_only")
        .when(F.col("b_key").isNull(), "left_only")
        .otherwise("both")
    )
    return (
        a.join(b, a.a_key == b.b_key, "full")
        .select(side.alias("side"))
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("side")
    )


@query(
    "join_left_semi",
    "2.3 joins",
    """
    SELECT count(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_left_anti",
    "2.3 joins",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — delete detection in sync terms (rows gone from source)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey").orderBy("c_custkey")
    )


@query(
    "join_cross",
    "2.3 joins",
    "SELECT r_name, s_name FROM region CROSS JOIN supplier ORDER BY r_name, s_name",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    s = load(spark, sf_dir, "supplier")
    return r.crossJoin(s).select("r_name", "s_name").orderBy("r_name", "s_name")


@query(
    "join_theta_range",
    "2.3 joins",
    """
    SELECT p1.p_brand, count(*) AS n_pairs
    FROM part p1 JOIN part p2
      ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
    GROUP BY p1.p_brand ORDER BY p1.p_brand
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join with an equi prefix: Spark hashes on p_brand and applies the
    size residual — blocked by brand, so pair count stays bounded at scale."""
    p1 = load(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand1"), F.col("p_size").alias("size1")
    )
    p2 = load(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand2"), F.col("p_size").alias("size2")
    )
    return (
        p1.join(p2, (p1.brand1 == p2.brand2) & (p1.size1 < p2.size2))
        .groupBy(F.col("brand1").alias("p_brand"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("p_brand")
    )


@query(
    "join_interval",
    "2.3 joins",
    """
    SELECT count(*) AS n, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + interval residual: the equi key carries the shuffle, the range
    predicate is evaluated post-match (no range-explosion)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return li.join(o, cond).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


_ASOF_ORACLE = """
SELECT event_id, prior_view_ts FROM (
  SELECT event_id, event_type,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
  FROM events
) WHERE event_type = 'purchase'
ORDER BY event_id
"""


@query("join_asof_prior_event", "2.3 joins", _ASOF_ORACLE)
def join_asof_prior_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via window rewrite: latest strictly-prior 'view' per user
    for each 'purchase'. One shuffle on user_id + one sorted window pass —
    the scalable form (a naive range join would be quadratic per user).
    The reference's "apply latest version <= v" sync semantics is this same
    as-of shape. Generic operator: operators/asof.py.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_view = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (
        e.select("event_id", "event_type", prior_view.alias("prior_view_ts"))
        .where(F.col("event_type") == "purchase")
        .select("event_id", "prior_view_ts")
        .orderBy("event_id")
    )


@query(
    "join_null_safe_eq",
    "2.3 joins",
    """
    WITH a AS (SELECT o_orderkey, nullif(o_orderpriority, '5-LOW') AS p FROM orders),
    b AS (SELECT o_orderkey, nullif(o_orderpriority, '5-LOW') AS p FROM orders)
    SELECT coalesce(a.p, '<null>') AS prio, count(*) AS n
    FROM a JOIN b ON a.p IS NOT DISTINCT FROM b.p AND a.o_orderkey = b.o_orderkey
    GROUP BY prio ORDER BY prio
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing — the semantics a sync diff needs when a
    nullable column participates in the key. Self-join on (nullable prio,
    orderkey) so row counts stay linear."""
    o = load(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    a = o.select("o_orderkey", prio.alias("p"))
    b = o.select(F.col("o_orderkey").alias("k2"), prio.alias("p2"))
    return (
        a.join(b, a["p"].eqNullSafe(b["p2"]) & (a["o_orderkey"] == b["k2"]))
        .groupBy(F.coalesce(a["p"], F.lit("<null>")).alias("prio"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prio")
    )


@query(
    "join_right_outer",
    "2.3 joins",
    """
    SELECT n_name, count(c_custkey) AS n_customers
    FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER: every nation appears even with zero customers (null
    extension counted as 0 by count(c_custkey)) — completes the join-type
    surface next to left/full/semi/anti/cross."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy("n_name")
    )


@query(
    "join_bucketed_colocate",
    "2.3 joins",
    """
    SELECT o_orderpriority, count(*) AS n_lines, round(sum(l_quantity), 2) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_bucketed_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join through bucketed storage: both tables are written
    bucketed (and sorted) on the order key with equal bucket counts, so the
    SortMergeJoin reads matching bucket files pairwise with NO Exchange and
    no per-query sort on either side (sources/bucketing.py; zero-exchange
    property pinned by tests/test_plans.py::test_bucketed_join_has_no_exchange).
    At 100 TB this converts every repeated join on the same key from a
    full two-sided shuffle into a local merge — the storage-level analog of
    the reference's PK-clustered sync tables. The write cost is paid once;
    this query pays it inline only because the driver contract is
    self-contained per call."""
    from pathlib import Path

    from hdc_dataengineering_sqlsync_spark.sources.bucketing import bucketed_join, write_bucketed

    tag = Path(sf_dir).name.replace(".", "_")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    t_o, t_li = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    write_bucketed(o, t_o, ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(li, t_li, ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    return (
        bucketed_join(spark, t_o, t_li, on=["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )
