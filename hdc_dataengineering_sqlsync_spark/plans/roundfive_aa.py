"""SURVEY.md §2 round-5 additions, batch JJ.

Kaplan-Meier survival estimation over customer lifetimes. Registered
after ``roundfive_z`` (plans/__init__.py) so the qids append to the END
of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# S(t) = Π_{i<=t} (1 - d_i/n_i), computed as exp of the ORDERED running
# sum of logs — one shared expression per term; the cumulative sum runs
# in the same t-order in both engines.
_KM_TERM = "ln(1.0 - cast(d as double) / cast(n_risk as double))"

_KM_ORACLE = f"""
WITH spans AS (
  SELECT o_custkey AS cust,
         MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS f,
         MAX(year(o_orderdate) * 12 + month(o_orderdate)) AS l
  FROM orders GROUP BY o_custkey
),
horizon AS (
  SELECT MAX(year(o_orderdate) * 12 + month(o_orderdate)) AS end_mo
  FROM orders
),
labeled AS (
  SELECT l - f + 1 AS duration,
         CASE WHEN end_mo - l > 3 THEN 1 ELSE 0 END AS churned
  FROM spans CROSS JOIN horizon
),
km AS (
  SELECT duration AS t,
         CAST(SUM(churned) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS ended_here
  FROM labeled GROUP BY duration
),
risk AS (
  SELECT t, d,
         CAST(SUM(ended_here) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_risk
  FROM km
)
SELECT CAST(t AS BIGINT) AS t, n_risk, d,
       round(exp(SUM({_KM_TERM}) OVER (ORDER BY t
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4) AS survival
FROM risk
ORDER BY t
"""


@query("wl_survival_kaplan_meier", "2.12 composite workloads", _KM_ORACLE)
def wl_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over customer active lifetimes.

    The censoring-aware retention curve (the statistically honest form
    of `wl_retention_cohorts`): a customer's duration is months from
    first to last order; customers still ordering near the dataset
    horizon are CENSORED (their lifetime is a lower bound, not an
    event), those dark for >3 months churned. The product-limit
    estimator S(t) = Π(1 − dᵢ/nᵢ) multiplies only over observed-event
    months, which is exactly how censoring avoids the naive-churn-rate
    bias. Risk sets and event counts are exact integers (the at-risk
    count is a DESCENDING cumulative sum over the duration histogram —
    no per-customer window); S(t) is exp of the ORDERED running sum of
    shared-string log terms, identical accumulation order in both
    engines, round(4).

    Scale shape: per-customer spans are one keyed min/max agg; the KM
    table is a duration histogram (≤ #months rows) — all windows run
    over that tiny table, never the fact stream."""
    mo = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    spans = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.min(mo).alias("f"), F.max(mo).alias("l"))
    )
    horizon = load(spark, sf_dir, "orders").agg(F.max(mo).alias("end_mo"))
    labeled = spans.crossJoin(F.broadcast(horizon)).select(
        (F.col("l") - F.col("f") + 1).alias("duration"),
        F.when(F.col("end_mo") - F.col("l") > 3, 1).otherwise(0).alias("churned"),
    )
    km = labeled.groupBy(F.col("duration").alias("t")).agg(
        F.sum("churned").alias("d"), F.count(F.lit(1)).alias("ended_here")
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = km.select(
        "t", "d", F.sum("ended_here").over(w_desc).alias("n_risk")
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return risk.select(
        F.col("t").cast("long").alias("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d"),
        F.round(
            F.exp(F.sum(F.expr(_KM_TERM)).over(w_asc)), 4
        ).alias("survival"),
    ).orderBy("t")
