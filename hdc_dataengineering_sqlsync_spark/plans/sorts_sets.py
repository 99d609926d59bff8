"""SURVEY.md §2.6 — sorts, limits, top-k, set operations.

Null placement is explicit everywhere (Spark ASC defaults NULLS FIRST,
DuckDB NULLS LAST — FIXTURES.md hazard #5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load


@query(
    "sort_limit_topk",
    "2.6 sorts/sets",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    bench=True,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit plans as TakeOrderedAndProject (per-
    partition heaps + driver merge), never a full sort — the only global-sort
    shape that survives 100 TB."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "sort_multi_nulls",
    "2.6 sorts/sets",
    """
    SELECT o_orderkey, nullif(o_orderpriority, '5-LOW') AS prio
    FROM orders
    ORDER BY prio ASC NULLS LAST, o_orderkey LIMIT 20
    """,
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("prio"))
        .orderBy(F.col("prio").asc_nulls_last(), F.col("o_orderkey"))
        .limit(20)
    )


_SEG_A = "SELECT c_name FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"
_SEG_B = "SELECT c_name FROM customer WHERE c_mktsegment = 'BUILDING'"


@query(
    "set_union_all",
    "2.6 sorts/sets",
    f"SELECT count(*) AS n FROM ({_SEG_A} UNION ALL {_SEG_B})",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_name")
    b = c.where(F.col("c_mktsegment") == "BUILDING").select("c_name")
    return a.unionByName(b).agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct",
    "2.6 sorts/sets",
    f"SELECT count(*) AS n FROM ({_SEG_A} UNION {_SEG_B})",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_name")
    b = c.where(F.col("c_mktsegment") == "BUILDING").select("c_name")
    return a.unionByName(b).distinct().agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect",
    "2.6 sorts/sets",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op).orderBy("o_custkey")


@query(
    "set_except",
    "2.6 sorts/sets",
    """
    SELECT DISTINCT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT (Spark .subtract): customers with orders but no 'F'
    order."""
    o = load(spark, sf_dir, "orders")
    all_cust = o.select("o_custkey").distinct()
    f_cust = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_cust.subtract(f_cust).orderBy("o_custkey")


@query(
    "set_except_all",
    "2.6 sorts/sets",
    """
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) GROUP BY o_custkey HAVING count(*) >= 2 ORDER BY o_custkey
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics, Spark .exceptAll): per-customer order
    multiplicities survive the subtraction — customers keeping >= 2
    non-cancelled-out rows. Complements set_except's DISTINCT form."""
    o = load(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        o.select("o_custkey")
        .exceptAll(f)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("o_custkey")
        .orderBy("o_custkey")
    )


@query(
    "set_intersect_all",
    "2.6 sorts/sets",
    """
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY o_custkey HAVING count(*) >= 2 ORDER BY o_custkey
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, Spark .intersectAll): each customer
    keeps min(total orders, open orders) rows — those with >= 2 surviving.
    Completes the set-op family (union/union all/except/except all/
    intersect already declared)."""
    o = load(spark, sf_dir, "orders")
    open_o = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        o.select("o_custkey")
        .intersectAll(open_o)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("o_custkey")
        .orderBy("o_custkey")
    )
