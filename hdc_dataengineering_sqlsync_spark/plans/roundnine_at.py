"""SURVEY.md §2 round-9 batch AT: hash-chain ledger audit, olympic mean,
YTD / prior-YTD growth.

  sync_hash_chain_audit  tamper-evident md5 chain per month partition
  agg_olympic_mean       drop-one-min-one-max mean, exact integral
  wl_ytd_pytd_growth     the BI comparative staple, exact cents

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.6 sync & dataops: tamper-evident hash chain per partition

_CHAIN_ORACLE = """
WITH RECURSIVE src AS (
  SELECT date_trunc('month', o_orderdate) AS mon, o_orderkey AS k,
         row_number() OVER (PARTITION BY date_trunc('month', o_orderdate)
                            ORDER BY o_orderkey) AS rn,
         count(*) OVER (PARTITION BY date_trunc('month', o_orderdate))
           AS n
  FROM orders WHERE year(o_orderdate) = 1997
),
chain AS (
  SELECT mon, rn, n, md5('genesis|' || CAST(k AS VARCHAR)) AS h
  FROM src WHERE rn = 1
  UNION ALL
  SELECT s.mon, s.rn, s.n, md5(c.h || '|' || CAST(s.k AS VARCHAR))
  FROM chain c JOIN src s ON s.mon = c.mon AND s.rn = c.rn + 1
)
SELECT CAST(mon AS DATE) AS month, CAST(n AS BIGINT) AS n_records,
       h AS chain_digest
FROM chain WHERE rn = n ORDER BY month
"""

_CHAIN_SCHEMA = T.StructType(
    [
        T.StructField("month", T.DateType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("chain_digest", T.StringType()),
    ]
)


def _chain_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("k")
    h = None
    for k in pdf["k"]:
        if h is None:
            h = hashlib.md5(f"genesis|{int(k)}".encode()).hexdigest()
        else:
            h = hashlib.md5(f"{h}|{int(k)}".encode()).hexdigest()
    return pd.DataFrame(
        [
            {
                "month": pdf["mon"].iloc[0],
                "n_records": len(pdf),
                "chain_digest": h,
            }
        ]
    )


@query("sync_hash_chain_audit", "2.6 sync & dataops", _CHAIN_ORACLE)
def sync_hash_chain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident hash chain — the audit-log integrity device
    (each record's digest commits to everything before it, so any
    insertion, deletion, or reorder changes the final digest): one
    md5 chain per month partition over the ordered record keys,
    inherently sequential WITHIN a partition and embarrassingly
    parallel ACROSS partitions — exactly the applyInPandas shape, with
    the DuckDB oracle walking the identical chain as a recursive CTE.
    Matching final digests prove both engines visited the same records
    in the same order — the strongest order-sensitive check in the
    catalog (every other census is order-free by design; this one is
    order-DEFINED).

    Scale shape: one shuffle on the month key; O(records) sequential
    hashing per partition in one Arrow batch; 12 output rows."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1997)
        .select(
            F.trunc("o_orderdate", "month").alias("mon"),
            F.col("o_orderkey").alias("k"),
        )
    )
    return (
        src.groupBy("mon")
        .applyInPandas(_chain_group, schema=_CHAIN_SCHEMA)
        .orderBy("month")
    )


# ------ 2.4 aggregations: olympic (drop-min-drop-max) mean

_OLYMPIC_ORACLE = """
WITH vals AS (
  SELECT p.p_brand AS brand,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(l.l_shipdate) = 1997
),
mom AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS s,
         CAST(min(cents) AS BIGINT) AS lo,
         CAST(max(cents) AS BIGINT) AS hi
  FROM vals GROUP BY brand HAVING count(*) >= 3
)
SELECT brand, n, lo AS dropped_min, hi AS dropped_max,
       CAST((s - lo - hi) // (n - 2) AS BIGINT) AS olympic_mean_cents
FROM mom ORDER BY brand
"""


@query("agg_olympic_mean", "2.4 aggregations", _OLYMPIC_ORACLE)
def agg_olympic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Olympic mean — drop exactly one min and one max, average the rest
    (the commodity-pricing and judging-panel rule; the cheap cousin of
    agg_winsorized_mean that needs NO percentile pass): (Σ − min − max)
    over n−2, entirely inside one map-combinable aggregate (sum, min,
    max, count all combine), closed with one integral division.

    Scale shape: ONE keyed 4-moment agg over the broadcast part join —
    no window, no second pass; the cheapest robust mean there is."""
    li = load(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1997)
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    vals = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "brand",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    mom = (
        vals.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("decimal(38,0)").alias("s"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
        .where(F.col("n") >= 3)
    )
    return mom.select(
        "brand",
        "n",
        F.col("lo").alias("dropped_min"),
        F.col("hi").alias("dropped_max"),
        F.expr("CAST((s - lo - hi) DIV (n - 2) AS BIGINT)").alias(
            "olympic_mean_cents"
        ),
    ).orderBy("brand")


# ------ 2.12 composite: YTD / prior-YTD comparative growth

_YTD_ORACLE = """
WITH monthly AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS m,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS mtd
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2
),
ytd AS (
  SELECT yr, m, mtd,
         CAST(SUM(mtd) OVER (PARTITION BY yr ORDER BY m) AS BIGINT) AS ytd
  FROM monthly
)
SELECT CAST(a.m AS INT) AS month_1997,
       a.mtd AS mtd_cents,
       a.ytd AS ytd_cents,
       b.ytd AS pytd_cents,
       CAST((a.ytd - b.ytd) * 10000 // b.ytd AS BIGINT) AS yoy_ytd_bps
FROM ytd a JOIN ytd b ON b.yr = 1996 AND b.m = a.m
WHERE a.yr = 1997
ORDER BY month_1997
"""


@query("wl_ytd_pytd_growth", "2.12 composite workloads", _YTD_ORACLE)
def wl_ytd_pytd_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YTD vs prior-YTD — the comparative every BI dashboard leads with
    (month-to-date, year-to-date, same-point-last-year, growth): YTD is
    a per-year running sum over month cells, PY-YTD one self-join on
    the month index, and YoY growth closes in exact integer bps — the
    'are we ahead of last year AT THIS POINT' number, which a plain
    yearly total cannot answer mid-year.

    Scale shape: month cells reduce map-side; the running sum and the
    month self-join run on 24 cells."""
    o = load(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(1996, 1997)
    )
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("m")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("mtd")
    )
    wy = Window.partitionBy("yr").orderBy("m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ytd = monthly.select("yr", "m", "mtd", F.sum("mtd").over(wy).alias("ytd"))
    a = ytd.where(F.col("yr") == 1997).select(
        F.col("m").alias("ma"), F.col("mtd").alias("mtd_a"),
        F.col("ytd").alias("ytd_a"),
    )
    b = ytd.where(F.col("yr") == 1996).select(
        F.col("m").alias("mb"), F.col("ytd").alias("ytd_b")
    )
    return (
        a.join(b, a.ma == b.mb)
        .select(
            F.col("ma").cast("int").alias("month_1997"),
            F.col("mtd_a").alias("mtd_cents"),
            F.col("ytd_a").alias("ytd_cents"),
            F.col("ytd_b").alias("pytd_cents"),
            F.expr("(ytd_a - ytd_b) * 10000 DIV ytd_b").alias(
                "yoy_ytd_bps"
            ),
        )
        .orderBy("month_1997")
    )
