"""SURVEY.md §2.4 — aggregations.

All money/avg values rounded to 2, stats to 4 (convention 1). Oracle SQL
casts DuckDB's wider aggregate types down to Spark's output types
(convention 6): DuckDB ``sum(INTEGER)`` is HUGEINT -> ``cast(... as bigint)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  round(avg(l_quantity), 2)                                          AS avg_qty,
  round(avg(l_extendedprice), 2)                                     AS avg_price,
  round(avg(l_discount), 2)                                          AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("agg_pricing_summary", "2.4 aggregations", _Q1_ORACLE, bench=True)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship query (also ``entry()``).

    Scan -> pushed filter -> project -> hash aggregate. Catalyst plans the
    partial (map-side) + final aggregate automatically; at 100 TB this is a
    single shuffle keyed on the 6 (flag, status) groups after near-total
    map-side reduction, so it scales with input size, not group count.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
