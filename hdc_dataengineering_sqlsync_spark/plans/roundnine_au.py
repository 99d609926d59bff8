"""SURVEY.md §2 round-9 batch AU: discount response curve, quota
attainment, PN-counter CRDT.

  wl_discount_response_curve  demand index by discount depth bucket
  wl_quota_attainment         YTD vs pro-rated plan, exact bps
  sync_crdt_pncounter         inc/dec counter merge (two G-counters)

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: discount-depth response curve

_RESPONSE_ORACLE = """
WITH lines AS (
  SELECT CASE WHEN l_discount = 0 THEN '0-none'
              WHEN l_discount <= 0.03 THEN '1-shallow'
              WHEN l_discount <= 0.06 THEN '2-medium'
              ELSE '3-deep' END AS depth,
         CAST(round(l_quantity) AS BIGINT) AS qty
  FROM lineitem WHERE year(l_shipdate) = 1996
),
buckets AS (
  SELECT depth, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(qty) AS BIGINT) AS qty_units,
         CAST(SUM(qty) * 1000 // count(*) AS BIGINT) AS qty_per_line_milli
  FROM lines GROUP BY depth
),
base AS (
  SELECT qty_per_line_milli AS b FROM buckets WHERE depth = '0-none'
)
SELECT depth, n_lines, qty_units, qty_per_line_milli,
       CAST(qty_per_line_milli * 10000 // (SELECT b FROM base) AS BIGINT)
         AS index_vs_none_bps
FROM buckets ORDER BY depth
"""


@query(
    "wl_discount_response_curve", "2.12 composite workloads",
    _RESPONSE_ORACLE,
)
def wl_discount_response_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-depth response curve — the promo-planning table ('does a
    deep discount move MORE units per line than a shallow one?'):
    quantity-per-line by discount bucket, each bucket indexed against
    the no-discount baseline in exact bps (per-line intensity, not
    total volume — the mix-free read). All integral: milli units per
    line by one division per bucket, the index by one more against the
    broadcast baseline.

    Scale shape: bucketing is map-side scalar work; one keyed census to
    4 buckets; the baseline is a 1-row broadcast scalar."""
    lines = (
        load(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1996)
        .select(
            F.when(F.col("l_discount") == 0, "0-none")
            .when(F.col("l_discount") <= 0.03, "1-shallow")
            .when(F.col("l_discount") <= 0.06, "2-medium")
            .otherwise("3-deep")
            .alias("depth"),
            F.round("l_quantity").cast("long").alias("qty"),
        )
    )
    buckets = lines.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("qty").alias("qty_units"),
        F.expr("SUM(qty) * 1000 DIV count(*)").alias("qty_per_line_milli"),
    )
    base = buckets.where(F.col("depth") == "0-none").select(
        F.col("qty_per_line_milli").alias("b")
    )
    return (
        buckets.crossJoin(F.broadcast(base))
        .select(
            "depth",
            "n_lines",
            "qty_units",
            "qty_per_line_milli",
            F.expr("qty_per_line_milli * 10000 DIV b").alias(
                "index_vs_none_bps"
            ),
        )
        .orderBy("depth")
    )


# ------ 2.12 composite: quota attainment vs pro-rated plan

_QUOTA_ORACLE = """
WITH monthly AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS m,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2
),
plan_ AS (
  -- annual quota = prior-year total grown 10%, exact integer cents
  SELECT CAST(SUM(cents) * 11 // 10 AS BIGINT) AS annual_quota
  FROM monthly WHERE yr = 1996
),
ytd AS (
  SELECT m, CAST(SUM(cents) OVER (ORDER BY m) AS BIGINT) AS ytd
  FROM monthly WHERE yr = 1997
)
SELECT CAST(y.m AS INT) AS month_1997,
       y.ytd AS ytd_cents,
       CAST(p.annual_quota * y.m // 12 AS BIGINT) AS prorated_quota_cents,
       CAST(y.ytd * 10000 // (p.annual_quota * y.m // 12) AS BIGINT)
         AS attainment_bps
FROM ytd y CROSS JOIN plan_ p
ORDER BY month_1997
"""


@query("wl_quota_attainment", "2.12 composite workloads", _QUOTA_ORACLE)
def wl_quota_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota attainment vs the pro-rated plan — sales ops' monthly
    scoreboard: the annual quota (prior year grown 10%, exact integral
    ×11//10) pro-rates linearly by month (quota·m/12, integral), and
    YTD attainment closes in exact bps — 'are we at 98% of where the
    plan says we should be by June', the mid-year number a plain
    year-end comparison cannot give.

    Scale shape: month cells reduce map-side; the quota is a 1-row
    broadcast; the running sum and ratios run on 12 cells."""
    monthly = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    plan = (
        monthly.where(F.col("yr") == 1996)
        .agg(F.expr("CAST(SUM(cents) * 11 DIV 10 AS BIGINT)").alias("q"))
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    ytd = (
        monthly.where(F.col("yr") == 1997)
        .select("m", "cents")
        .select("m", F.sum("cents").over(w).alias("ytd"))
    )
    return (
        ytd.crossJoin(F.broadcast(plan))
        .select(
            F.col("m").cast("int").alias("month_1997"),
            F.col("ytd").alias("ytd_cents"),
            F.expr("q * m DIV 12").alias("prorated_quota_cents"),
            F.expr("ytd * 10000 DIV (q * m DIV 12)").alias(
                "attainment_bps"
            ),
        )
        .orderBy("month_1997")
    )


# ------ 2.6 sync & dataops: PN-counter CRDT merge

_PN_ORACLE = """
WITH ops AS (
  SELECT o_orderkey % 4 AS replica,
         CASE WHEN o_orderkey % 7 < 5 THEN 'inc' ELSE 'dec' END AS op,
         o_orderkey % 13 + 1 AS amt,
         o_orderkey % 3 AS site  -- each replica's state observed at 3 sites
  FROM orders WHERE o_orderkey <= 6000
),
site_state AS (
  -- per (site, replica): the G-counter pair that site has observed
  SELECT site, replica,
         CAST(SUM(CASE WHEN op = 'inc' THEN amt ELSE 0 END) AS BIGINT)
           AS inc_v,
         CAST(SUM(CASE WHEN op = 'dec' THEN amt ELSE 0 END) AS BIGINT)
           AS dec_v
  FROM ops GROUP BY site, replica
),
merged AS (
  -- CRDT join: element-wise MAX of each replica's inc and dec entries
  SELECT replica, CAST(max(inc_v) AS BIGINT) AS inc_m,
         CAST(max(dec_v) AS BIGINT) AS dec_m
  FROM site_state GROUP BY replica
)
SELECT CAST(count(*) AS BIGINT) AS n_replicas,
       CAST(SUM(inc_m) AS BIGINT) AS total_inc,
       CAST(SUM(dec_m) AS BIGINT) AS total_dec,
       CAST(SUM(inc_m) - SUM(dec_m) AS BIGINT) AS counter_value
FROM merged
"""


@query("sync_crdt_pncounter", "2.6 sync & dataops", _PN_ORACLE)
def sync_crdt_pncounter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PN-counter merge — the increment/decrement CRDT (two G-counters:
    one for incs, one for decs; the value is their difference),
    completing the CRDT family next to sync_crdt_gcounter and
    sync_crdt_orset: per-site observed states merge by element-wise MAX
    per replica slot — order-free and idempotent, which is the whole
    point (the census is the post-merge converged value every site
    must agree on).

    Scale shape: per-(site, replica) states are one keyed agg; the
    merge is a keyed MAX over replica slots — both map-combinable; the
    value is a 4-number fold."""
    ops = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 6000)
        .select(
            (F.col("o_orderkey") % 4).alias("replica"),
            F.when(F.col("o_orderkey") % 7 < 5, "inc")
            .otherwise("dec")
            .alias("op"),
            (F.col("o_orderkey") % 13 + 1).alias("amt"),
            (F.col("o_orderkey") % 3).alias("site"),
        )
    )
    site_state = ops.groupBy("site", "replica").agg(
        F.sum(F.when(F.col("op") == "inc", F.col("amt")).otherwise(0)).alias(
            "inc_v"
        ),
        F.sum(F.when(F.col("op") == "dec", F.col("amt")).otherwise(0)).alias(
            "dec_v"
        ),
    )
    merged = site_state.groupBy("replica").agg(
        F.max("inc_v").alias("inc_m"), F.max("dec_v").alias("dec_m")
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_replicas"),
        F.sum("inc_m").alias("total_inc"),
        F.sum("dec_m").alias("total_dec"),
        (F.sum("inc_m") - F.sum("dec_m")).alias("counter_value"),
    )
