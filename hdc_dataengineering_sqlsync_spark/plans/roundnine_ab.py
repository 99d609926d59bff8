"""SURVEY.md §2 round-9 batch AB: repeat-purchase rate, WoW volume
anomalies, try_cast null-on-failure contract.

  wl_repeat_purchase_rate  multi-month buyers per brand, exact bps
  dq_volume_anomaly_wow    week-over-week spike/drop flags, cross-mult
  fn_try_cast_contract     which malformed inputs null out, pinned

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: repeat-purchase (multi-month buyer) rate

_REPEAT_ORACLE = """
WITH buyer_months AS (
  SELECT p.p_brand AS brand, o.o_custkey AS ck,
         CAST(count(DISTINCT date_trunc('month', o.o_orderdate)) AS BIGINT)
           AS n_months
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
)
SELECT brand,
       CAST(count(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN n_months >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(max(n_months) AS BIGINT) AS max_months,
       CAST(SUM(CASE WHEN n_months >= 2 THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS repeat_bps
FROM buyer_months GROUP BY brand ORDER BY brand
"""


@query("wl_repeat_purchase_rate", "2.12 composite workloads", _REPEAT_ORACLE)
def wl_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate — the loyalty KPI brand managers rank on:
    per brand, the share of buyers who purchased in TWO OR MORE
    distinct months (a count-distinct-of-months per (brand, customer),
    then a threshold census — deliberately not 'two orders', which
    same-day splits inflate). Exact integer bps.

    Scale shape: the two-level reduction every loyalty metric needs —
    (brand, customer) month-distinct first (one shuffle on the pair
    key), then a brand-grain fold; the month-distinct uses the same
    shuffle the pair grouping already pays; dims broadcast."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    bm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("brand", F.col("o_custkey").alias("ck"))
        .agg(
            F.countDistinct(F.trunc("o_orderdate", "month")).alias(
                "n_months"
            )
        )
    )
    return (
        bm.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_buyers"),
            F.sum(F.when(F.col("n_months") >= 2, 1).otherwise(0)).alias(
                "n_repeat"
            ),
            F.max("n_months").alias("max_months"),
            F.expr(
                "SUM(CASE WHEN n_months >= 2 THEN 1 ELSE 0 END) * 10000"
                " DIV count(*)"
            ).alias("repeat_bps"),
        )
        .orderBy("brand")
    )


# ------ 2.6 data quality: week-over-week volume anomaly flags

_WOW_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', o_orderdate) AS wk,
         CAST(count(*) AS BIGINT) AS n
  FROM orders WHERE year(o_orderdate) BETWEEN 1994 AND 1996
  GROUP BY 1
),
lagged AS (
  SELECT wk, n, lag(n) OVER (ORDER BY wk) AS pn
  FROM weekly
),
flags AS (
  SELECT wk, n, pn,
         CASE WHEN pn IS NULL THEN 0
              WHEN abs(n - pn) * 10 > 3 * pn THEN 1 ELSE 0 END AS flagged
  FROM lagged
)
SELECT CAST(year(wk) AS INT) AS yr,
       CAST(count(*) AS BIGINT) AS n_weeks,
       CAST(SUM(flagged) AS BIGINT) AS n_flagged,
       min(CASE WHEN flagged = 1 THEN CAST(wk AS DATE) END)
         AS first_flagged_week,
       CAST(COALESCE(max(CASE WHEN flagged = 1
                              THEN abs(n - pn) * 10000 // pn END), 0)
            AS BIGINT) AS worst_change_bps
FROM flags GROUP BY 1 ORDER BY yr
"""


@query("dq_volume_anomaly_wow", "2.6 data quality", _WOW_ORACLE)
def dq_volume_anomaly_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week volume anomaly flags — the first monitor every
    ingestion pipeline grows (did this week's row count move more than
    30% against last week?): the threshold test is CROSS-MULTIPLIED
    (|n−prev|·10 > 3·prev) so no rate is ever computed in float — a
    pipeline alarm must not depend on rounding — and the reported worst
    change closes with one integral bps division.

    Scale shape: week-grain map-side reduction (fact rows → ~156
    cells); the lag window and census run on those cells only."""
    weekly = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").between(1994, 1996))
        .groupBy(F.date_trunc("week", "o_orderdate").alias("wk"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lagged = weekly.select(
        "wk", "n", F.lag("n").over(Window.orderBy("wk")).alias("pn")
    )
    flags = lagged.select(
        "wk",
        "n",
        "pn",
        F.when(F.col("pn").isNull(), 0)
        .when(F.abs(F.col("n") - F.col("pn")) * 10 > 3 * F.col("pn"), 1)
        .otherwise(0)
        .alias("flagged"),
    )
    return (
        flags.groupBy(F.year("wk").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_weeks"),
            F.sum("flagged").alias("n_flagged"),
            F.min(
                F.when(F.col("flagged") == 1, F.col("wk").cast("date"))
            ).alias("first_flagged_week"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("flagged") == 1,
                        F.expr("abs(n - pn) * 10000 DIV pn"),
                    )
                ),
                F.lit(0),
            ).alias("worst_change_bps"),
        )
        .orderBy("yr")
    )


# ------ 2.7 scalar functions: try_cast null-on-failure contract

# The '1.5'→BIGINT case is deliberately EXCLUDED: Spark try_cast yields
# NULL (string must be integral) while DuckDB TRY_CAST rounds to 2 — a
# real cross-engine divergence this qid documents by omission; every
# case below agrees (probed).
_TRY_CAST_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         CASE k % 6 WHEN 0 THEN '123' WHEN 1 THEN '12x' WHEN 2 THEN ''
                    WHEN 3 THEN ' 42 ' WHEN 4 THEN '9999999999999999999999'
                    ELSE '-7' END AS int_s,
         CASE k % 4 WHEN 0 THEN '1995-02-30' WHEN 1 THEN '1995-13-01'
                    WHEN 2 THEN '1995-06-15' ELSE '1.2.3' END AS date_s
  FROM orders WHERE o_orderkey <= 600
),
casted AS (
  SELECT k, int_s, date_s,
         TRY_CAST(int_s AS BIGINT) AS iv,
         TRY_CAST(date_s AS DATE) AS dv
  FROM src
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN iv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_int_null,
       CAST(SUM(COALESCE(iv, 0)) AS BIGINT) AS int_sum,
       CAST(SUM(CASE WHEN dv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_date_null,
       CAST(count(DISTINCT dv) AS BIGINT) AS n_date_distinct
FROM casted
"""


@query("fn_try_cast_contract", "2.7 scalar functions", _TRY_CAST_ORACLE)
def fn_try_cast_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_cast contract, pinned per input class: junk suffix
    ('12x'), empty string, and int64 overflow null out; surrounding
    whitespace (' 42 ') is trimmed and parses; negative parses; invalid
    calendar dates (Feb 30, month 13) null out while a well-formed date
    parses. One class is documented by EXCLUSION: '1.5'→BIGINT is NULL
    in Spark (integral strings only) but rounds to 2 in DuckDB — the
    probe-found divergence a migration must know about, which is why it
    cannot appear in a shared-oracle census.

    Scale shape: generation + casts are map-side scalar work; one
    scalar census row."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 600)
        .select(
            F.col("o_orderkey").alias("k"),
            F.expr(
                "CASE o_orderkey % 6 WHEN 0 THEN '123' WHEN 1 THEN '12x'"
                " WHEN 2 THEN '' WHEN 3 THEN ' 42 '"
                " WHEN 4 THEN '9999999999999999999999' ELSE '-7' END"
            ).alias("int_s"),
            F.expr(
                "CASE o_orderkey % 4 WHEN 0 THEN '1995-02-30'"
                " WHEN 1 THEN '1995-13-01' WHEN 2 THEN '1995-06-15'"
                " ELSE '1.2.3' END"
            ).alias("date_s"),
        )
    )
    casted = src.select(
        F.expr("try_cast(int_s AS BIGINT)").alias("iv"),
        F.expr("try_cast(date_s AS DATE)").alias("dv"),
    )
    return casted.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0)).alias(
            "n_int_null"
        ),
        F.sum(F.coalesce("iv", F.lit(0))).alias("int_sum"),
        F.sum(F.when(F.col("dv").isNull(), 1).otherwise(0)).alias(
            "n_date_null"
        ),
        F.countDistinct("dv").alias("n_date_distinct"),
    )
