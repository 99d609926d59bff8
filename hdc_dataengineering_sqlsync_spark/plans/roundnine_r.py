"""SURVEY.md §2 round-9 batch R: Little's-law audit, peak open-order
concurrency, tiered fee schedule.

  wl_littles_law_check    L vs λ·W per month from exact order-day censuses
  wl_peak_open_orders     max concurrent open orders via +1/−1 deltas
  wl_tiered_fee_schedule  progressive bracket fees, exact integer cents

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------- 2.12 composite: Little's law (L = λ·W) audited on real data

_LITTLE_ORACLE = """
WITH ship AS (
  SELECT l_orderkey AS k, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
),
iv AS (
  SELECT o.o_orderdate AS d0, s.ship AS d1
  FROM orders o JOIN ship s ON s.k = o.o_orderkey
),
months AS (
  SELECT DISTINCT date_trunc('month', o_orderdate) AS mon
  FROM orders WHERE year(o_orderdate) = 1995
),
arr AS (
  SELECT date_trunc('month', d0) AS mon,
         CAST(count(*) AS BIGINT) AS n_arrivals,
         CAST(SUM(date_diff('day', d0, d1) + 1) AS BIGINT) AS sojourn_days
  FROM iv WHERE year(d0) = 1995 GROUP BY 1
),
occ AS (
  SELECT m.mon,
         CAST(SUM(date_diff('day',
                            GREATEST(iv.d0, CAST(m.mon AS DATE)),
                            LEAST(iv.d1, CAST(m.mon AS DATE)
                                         + INTERVAL 1 MONTH - INTERVAL 1 DAY))
                  + 1) AS BIGINT) AS open_order_days
  FROM months m JOIN iv
    ON iv.d0 <= CAST(m.mon AS DATE) + INTERVAL 1 MONTH - INTERVAL 1 DAY
   AND iv.d1 >= CAST(m.mon AS DATE)
  GROUP BY 1
)
SELECT CAST(a.mon AS DATE) AS month, a.n_arrivals, a.sojourn_days,
       o.open_order_days,
       CAST(o.open_order_days * 1000
            // date_diff('day', CAST(a.mon AS DATE),
                         CAST(a.mon AS DATE) + INTERVAL 1 MONTH)
            AS BIGINT) AS l_milli,
       CAST(a.sojourn_days * 1000
            // date_diff('day', CAST(a.mon AS DATE),
                         CAST(a.mon AS DATE) + INTERVAL 1 MONTH)
            AS BIGINT) AS lambda_w_milli
FROM arr a JOIN occ o ON o.mon = a.mon
ORDER BY month
"""


@query("wl_littles_law_check", "2.12 composite workloads", _LITTLE_ORACLE)
def wl_littles_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law (L = λ·W) audited, not assumed: per 1995 month, the
    time-average number of open orders L (total open-order-days inside the
    month clipped exactly to its boundaries, over month length) next to
    λ·W computed from arrivals (which telescopes to sojourn-days of the
    month's arrivals over month length). The two agree only in steady
    state — the per-month gap IS the backlog-drift signal queueing
    dashboards page on. Every figure is an exact integer day census;
    the milli-order averages close with one integral division each.

    Scale shape: order intervals derive from ONE orderkey-keyed
    aggregate over lineitem (co-partitioned join with orders); the
    occupancy census joins the fact against a ~12-row broadcast month
    dim (each order lands in the few months it overlaps — no explosion);
    both censuses are map-side combinable keyed aggregates."""
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.max("l_shipdate").alias("ship"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    iv = o.join(ship, o.o_orderkey == ship.k).select(
        F.col("o_orderdate").alias("d0"), F.col("ship").alias("d1")
    )
    months = (
        o.where(F.year("o_orderdate") == 1995)
        .select(F.trunc("o_orderdate", "month").alias("mon"))
        .distinct()
    )
    arr = (
        iv.where(F.year("d0") == 1995)
        .groupBy(F.trunc("d0", "month").alias("mon"))
        .agg(
            F.count(F.lit(1)).alias("n_arrivals"),
            F.sum(F.datediff("d1", "d0") + 1).alias("sojourn_days"),
        )
    )
    m_end = F.date_sub(F.add_months(F.col("mon"), 1), 1)
    occ = (
        F.broadcast(months)
        .join(iv, (iv.d0 <= m_end) & (iv.d1 >= F.col("mon")))
        .groupBy("mon")
        .agg(
            F.sum(
                F.datediff(
                    F.least("d1", m_end), F.greatest("d0", F.col("mon"))
                )
                + 1
            ).alias("open_order_days")
        )
    )
    dim = F.datediff(F.add_months(arr.mon, 1), arr.mon)
    return (
        arr.join(occ, "mon")
        .select(
            F.col("mon").cast("date").alias("month"),
            "n_arrivals",
            "sojourn_days",
            "open_order_days",
            F.expr("open_order_days * 1000").cast("long")
            .alias("_l"),
            F.expr("sojourn_days * 1000").cast("long").alias("_lw"),
            dim.alias("_dim"),
        )
        .select(
            "month",
            "n_arrivals",
            "sojourn_days",
            "open_order_days",
            F.expr("_l DIV _dim").alias("l_milli"),
            F.expr("_lw DIV _dim").alias("lambda_w_milli"),
        )
        .orderBy("month")
    )


# -------- 2.12 composite: peak concurrent open orders via interval deltas

_PEAK_ORACLE = """
WITH ship AS (
  SELECT l_orderkey AS k, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
),
iv AS (
  SELECT o.o_orderdate AS d0, s.ship AS d1
  FROM orders o JOIN ship s ON s.k = o.o_orderkey
),
delta AS (
  SELECT d, CAST(SUM(x) AS BIGINT) AS net FROM (
    SELECT d0 AS d, 1 AS x FROM iv
    UNION ALL
    SELECT d1 + INTERVAL 1 DAY, -1 FROM iv
  ) GROUP BY 1
),
lvl AS (
  SELECT CAST(d AS DATE) AS d,
         CAST(SUM(net) OVER (ORDER BY d) AS BIGINT) AS open_d
  FROM delta
),
m AS (
  SELECT date_trunc('month', d) AS mon, d, open_d,
         max(open_d) OVER (PARTITION BY date_trunc('month', d)) AS pk
  FROM lvl WHERE year(d) = 1995
)
SELECT CAST(mon AS DATE) AS month,
       CAST(max(pk) AS BIGINT) AS peak_open,
       min(CASE WHEN open_d = pk THEN d END) AS peak_day,
       CAST(max_by(open_d, d) AS BIGINT) AS eom_open
FROM m GROUP BY mon ORDER BY month
"""


@query("wl_peak_open_orders", "2.12 composite workloads", _PEAK_ORACLE)
def wl_peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency — the capacity question Little's law averages
    away: the MAX number of simultaneously open orders per 1995 month,
    the day it first peaked, and the level carried out of the month.
    Classic sweep-line: +1 on the order date, −1 the day after last
    ship, prefix-sum over day-grain deltas; the step function only moves
    on delta days, so the month max is the max over its delta days plus
    the carried level (every day here carries arrivals, and both engines
    evaluate the identical step function, so the census is exact).

    Scale shape: intervals from one orderkey-keyed aggregate; deltas
    reduce map-side to DAY grain (~2,400 rows for 7 years — the prefix
    sum runs on that tiny series, one partition by design, NOT on the
    fact table; at 100 TB the day-grain table is still ~2,400 rows)."""
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.max("l_shipdate").alias("ship"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    iv = o.join(ship, o.o_orderkey == ship.k).select(
        F.col("o_orderdate").alias("d0"), F.col("ship").alias("d1")
    )
    delta = (
        iv.select(F.col("d0").alias("d"), F.lit(1).alias("x"))
        .unionAll(
            iv.select(F.date_add("d1", 1).alias("d"), F.lit(-1).alias("x"))
        )
        .groupBy("d")
        .agg(F.sum("x").alias("net"))
    )
    from pyspark.sql import Window

    lvl = delta.select(
        F.col("d").cast("date").alias("d"),
        F.sum("net")
        .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .alias("open_d"),
    )
    m = lvl.where(F.year("d") == 1995).select(
        F.trunc("d", "month").alias("mon"),
        "d",
        "open_d",
        F.max("open_d")
        .over(Window.partitionBy(F.trunc("d", "month")))
        .alias("pk"),
    )
    return (
        m.groupBy(F.col("mon").cast("date").alias("month"))
        .agg(
            F.max("pk").alias("peak_open"),
            F.min(F.when(F.col("open_d") == F.col("pk"), F.col("d"))).alias(
                "peak_day"
            ),
            F.max_by("open_d", "d").alias("eom_open"),
        )
        .orderBy("month")
    )


# ---------- 2.12 composite: progressive (tiered) fee schedule, exact cents

_TIER_ORACLE = """
WITH spend AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
fee AS (
  SELECT ck, cents,
         LEAST(cents, 100000000) AS t1,
         LEAST(GREATEST(cents - 100000000, 0), 150000000) AS t2,
         GREATEST(cents - 250000000, 0) AS t3,
         CASE WHEN cents > 250000000 THEN 3
              WHEN cents > 100000000 THEN 2 ELSE 1 END AS tier
  FROM spend
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(SUM(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
       CAST(SUM(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_t2,
       CAST(SUM(CASE WHEN tier = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_t3,
       CAST(SUM(cents) AS BIGINT) AS spend_cents,
       CAST(SUM((t1 * 50 + t2 * 125 + t3 * 200) // 10000) AS BIGINT)
         AS fee_cents
FROM fee f JOIN customer c ON c.c_custkey = f.ck
GROUP BY 1 ORDER BY segment
"""


@query("wl_tiered_fee_schedule", "2.12 composite workloads", _TIER_ORACLE)
def wl_tiered_fee_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive bracket pricing — the tax-bracket shape every royalty,
    take-rate, and volume-discount contract uses: lifetime spend split
    into brackets (first $1M at 50 bps, next $1.5M at 125 bps, excess at
    200 bps), fee computed per customer with ONE integral division (the
    contract rounds per account, not per segment — summing before
    dividing would under-collect), then a segment census of tier
    membership and exact fee totals.

    Scale shape: per-customer spend is one keyed map-combinable
    aggregate; bracket math is per-row scalar; the segment rollup joins
    customer on its key (co-partitioned at scale) and reduces to 5
    rows."""
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    fee = spend.select(
        "ck",
        "cents",
        F.expr("LEAST(cents, 100000000)").alias("t1"),
        F.expr("LEAST(GREATEST(cents - 100000000, 0), 150000000)").alias("t2"),
        F.expr("GREATEST(cents - 250000000, 0)").alias("t3"),
        F.expr(
            "CASE WHEN cents > 250000000 THEN 3"
            " WHEN cents > 100000000 THEN 2 ELSE 1 END"
        ).alias("tier"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        fee.join(c, fee.ck == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.when(F.col("tier") == 1, 1).otherwise(0)).alias("n_t1"),
            F.sum(F.when(F.col("tier") == 2, 1).otherwise(0)).alias("n_t2"),
            F.sum(F.when(F.col("tier") == 3, 1).otherwise(0)).alias("n_t3"),
            F.sum("cents").alias("spend_cents"),
            F.sum(
                F.expr("(t1 * 50 + t2 * 125 + t3 * 200) DIV 10000")
            ).alias("fee_cents"),
        )
        .orderBy("segment")
    )
