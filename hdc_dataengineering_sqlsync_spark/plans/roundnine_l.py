"""SURVEY.md §2 round-9 batch L: quantified ALL-comparison rewrite,
ISO-week calendar boundary handling, runtime-discovered pivot columns.

  subq_quantified_all   `> ALL (...)` via the aggregate rewrite Spark needs
  fn_isoweek_boundaries ISO year-week rollup where Jan 1 belongs to week 52/53
  agg_pivot_dynamic     pivot on a column set discovered at run time

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------- 2.3 joins/subqueries: quantified comparison (> ALL) rewrite

_QALL_ORACLE = """
SELECT c.c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n_dominant,
       CAST(min(o.o_orderkey) AS BIGINT) AS min_orderkey
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_totalprice > ALL (
  SELECT o2.o_totalprice FROM orders o2 WHERE o2.o_orderpriority = '1-URGENT'
    AND year(o2.o_orderdate) = 1997
)
GROUP BY c.c_mktsegment ORDER BY seg
"""


@query("subq_quantified_all", "2.3 joins", _QALL_ORACLE)
def subq_quantified_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison — orders whose price beats ALL 1997 urgent
    orders. DuckDB runs the SQL-standard `> ALL (subquery)` natively;
    Spark SQL has no quantified-comparison syntax, so the engine applies
    THE standard rewrite: `x > ALL (S)` ≡ `x > max(S)` when S is
    non-empty and null-free (and the empty-S/null edge cases are what
    the rewrite must preserve — here the subquery is provably non-empty
    and the column non-null, the precondition stated in the docstring
    because a silent rewrite under nulls changes semantics).

    Scale shape: the subquery collapses to a 1-row MAX aggregate
    broadcast-crossed into the fact scan as a scalar filter — quantified
    comparison costs ONE tiny aggregate, never a per-row probe; then one
    broadcast customer join and a keyed census."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    thresh = (
        o.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1997)
        )
        .agg(F.max("o_totalprice").alias("mx"))
    )
    return (
        o.crossJoin(F.broadcast(thresh))
        .where(F.col("o_totalprice") > F.col("mx"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_dominant"),
            F.min("o_orderkey").alias("min_orderkey"),
        )
        .orderBy("seg")
    )


# ------ 2.7 scalar functions: ISO week-date rollup across year boundaries

_ISOWEEK_ORACLE = """
WITH d AS (
  SELECT o_orderdate AS dt,
         CAST(isoyear(o_orderdate) AS INT) AS iso_year,
         CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
boundary AS (
  SELECT *, CAST(year(dt) AS INT) AS cal_year FROM d
  WHERE CAST(year(dt) AS INT) <> iso_year
)
SELECT iso_year, iso_week,
       CAST(count(*) AS BIGINT) AS n_boundary_orders,
       CAST(min(dt) AS DATE) AS first_dt,
       CAST(max(dt) AS DATE) AS last_dt,
       CAST(SUM(cents) AS BIGINT) AS rev_cents
FROM boundary
GROUP BY iso_year, iso_week ORDER BY iso_year, iso_week
"""


@query("fn_isoweek_boundaries", "2.7 scalar functions", _ISOWEEK_ORACLE)
def fn_isoweek_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 week-date rollup restricted to the rows that PROVE the
    calendar semantics: orders whose ISO year differs from their calendar
    year — the Dec-29..Jan-3 slivers where Jan 1 can belong to week 52/53
    of the PREVIOUS iso-year (and Dec 31 to week 1 of the next). A weekly
    report keyed on (year(dt), weekofyear(dt)) silently splits these
    weeks in two; keying on (isoyear, isoweek) is the fix, and this qid
    pins both engines agreeing on every boundary row. Spark spells
    isoyear as extract(YEAROFWEEK), DuckDB as isoyear() — same standard.

    Scale shape: pure map-side calendar arithmetic + one keyed census;
    the boundary filter prunes to a few days per year."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("dt"),
        F.expr("CAST(extract(YEAROFWEEK FROM o_orderdate) AS INT)").alias(
            "iso_year"
        ),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    return (
        o.where(F.year("dt").cast("int") != F.col("iso_year"))
        .groupBy("iso_year", "iso_week")
        .agg(
            F.count(F.lit(1)).alias("n_boundary_orders"),
            F.min("dt").cast("date").alias("first_dt"),
            F.max("dt").cast("date").alias("last_dt"),
            F.sum("cents").alias("rev_cents"),
        )
        .orderBy("iso_year", "iso_week")
    )


# ------ 2.4 aggregations: pivot on runtime-discovered columns

_DYNPIVOT_ORACLE = """
SELECT c.c_mktsegment AS seg,
       CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
            AS BIGINT) AS "1-URGENT",
       CAST(SUM(CASE WHEN o.o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS "2-HIGH",
       CAST(SUM(CASE WHEN o.o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)
            AS BIGINT) AS "3-MEDIUM",
       CAST(SUM(CASE WHEN o.o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)
            AS BIGINT) AS "4-NOT SPECIFIED",
       CAST(SUM(CASE WHEN o.o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
            AS BIGINT) AS "5-LOW"
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment ORDER BY seg
"""


@query("agg_pivot_dynamic", "2.4 aggregations", _DYNPIVOT_ORACLE)
def agg_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot — the spread-to-columns report where the column set
    is DISCOVERED at run time (contrast `agg_pivot`'s hard-coded value
    list): phase 1 collects the distinct pivot values (a bounded,
    driver-sized domain — the legitimate collect), phase 2 passes them to
    `pivot(col, values)` so Spark skips its own inference pass AND the
    output column order is deterministic (sorted), which an
    inference-order pivot does not guarantee. The oracle hard-codes the
    same columns — the point of the qid is that the runtime-discovered
    set must land on exactly that schema.

    Scale shape: phase 1 is a map-side-combinable distinct over the
    pivot column only (column-pruned scan); phase 2 is one keyed agg
    with the pivot CASE expansion map-side — two passes over ONE column
    plus one over the facts, never a shuffle per pivot value."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    values = sorted(
        r[0]
        for r in o.select("o_orderpriority").distinct().collect()
    )
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .pivot("o_orderpriority", values)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("seg")
    )
