"""Pivot / unpivot / distribution windows — reshape surface a reference user
expects from an analytics engine (SURVEY.md §2 extensions; basis [G]).

Pivot compiles to a single hash aggregate with one conditional-agg column per
(pinned) pivot value — identical to the oracle's CASE formulation, and
scale-safe because the pivot values are declared, never discovered by an
extra pass. Unpivot is Spark's builtin melt (one map-side expand, no
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS status_f,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS status_o,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS status_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("agg_pivot", "2.4 aggregations", _PIVOT_ORACLE)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders: one revenue column per order status, rows = priority.
    Pivot values are pinned (no discovery pass) so this is a single
    conditional hash-agg — the CASE-sum plan, auto-generated."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    ).orderBy("o_orderpriority")


_UNPIVOT_ORACLE = """
SELECT o_orderkey, metric, round(val, 2) AS val
FROM (
  SELECT o_orderkey, 'price' AS metric, o_totalprice AS val FROM orders
  UNION ALL
  SELECT o_orderkey, 'key100' AS metric, CAST(o_orderkey % 100 AS DOUBLE) AS val FROM orders
)
WHERE o_orderkey <= 1000
ORDER BY o_orderkey, metric
"""


@query("agg_unpivot", "2.4 aggregations", _UNPIVOT_ORACLE)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) two derived measures to long form — map-side expand,
    no shuffle; the oracle states the equivalent UNION ALL."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    wide = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        (F.col("o_orderkey") % 100).cast("double").alias("key100"),
    )
    return (
        wide.unpivot("o_orderkey", ["price", "key100"], "metric", "val")
        .select("o_orderkey", "metric", F.round("val", 2).alias("val"))
        .orderBy("o_orderkey", "metric")
    )


_PCT_ORACLE = """
SELECT c_mktsegment, c_custkey,
       round(percent_rank() OVER w, 4) AS pct,
       round(cume_dist() OVER w, 4) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_mktsegment, c_custkey
"""


@query("win_pct_cume", "2.5 windows", _PCT_ORACLE)
def win_pct_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over (segment, balance) — the distribution
    windows missing from win_ranking; unique ordering key keeps both
    deterministic."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.percent_rank().over(w), 4).alias("pct"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    ).orderBy("c_mktsegment", "c_custkey")
