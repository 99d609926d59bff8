"""SURVEY.md §2 round-9 batch F: winsorized robust mean, max drawdown
from a running peak, and the chain-ladder loss-development triangle.

  agg_winsorized_mean   p05/p95-clamped mean, exact integer cents
  ts_drawdown_max       worst peak-to-trough drop per monthly series
  wl_loss_dev_triangle  origin x dev-age cumulative triangle + link ratios

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------- 2.4 aggregations: winsorized mean (robust location)

_WINSOR_ORACLE = """
WITH v AS (
  SELECT c_mktsegment AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
census AS (
  SELECT seg, cents, count(*) AS t FROM v GROUP BY 1, 2
),
ranked AS (
  SELECT seg, cents, t,
         sum(t) OVER (PARTITION BY seg ORDER BY cents) AS cum,
         sum(t) OVER (PARTITION BY seg) AS n
  FROM census
),
bounds AS (
  SELECT seg,
         min(CASE WHEN 100 * cum >= 5 * n THEN cents END) AS lo,
         min(CASE WHEN 100 * cum >= 95 * n THEN cents END) AS hi
  FROM ranked GROUP BY seg
)
SELECT c.seg,
       CAST(b.lo AS BIGINT) AS lo_cents,
       CAST(b.hi AS BIGINT) AS hi_cents,
       CAST(sum(c.t) AS BIGINT) AS n_rows,
       CAST(sum(c.t * least(greatest(c.cents, b.lo), b.hi))
            // sum(c.t) AS BIGINT) AS winsor_mean_cents
FROM census c JOIN bounds b USING (seg)
GROUP BY c.seg, b.lo, b.hi
ORDER BY c.seg
"""


@query("agg_winsorized_mean", "2.4 aggregations", _WINSOR_ORACLE)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean — the robust location estimate that clamps (not
    drops, unlike a trimmed mean) everything outside [p05, p95] to the
    fence values before averaging: the standard way heavy-tailed revenue
    is summarized without letting a single whale move the mean. Fences
    are exact type-1 discrete quantiles (`100·cum ≥ k·n`, the
    agg_percentile_disc integer test) of customer account balance per
    market segment — balances are SIGNED (TPC-H draws them down to
    −999.99), which is exactly when clamping matters — so there is no
    floating point anywhere: clamp and mean run in int64 cents with an
    integral DIV (trunc-toward-zero on both engines).

    Scale shape: the sort collapses to a DISTINCT-VALUE census before the
    cumulative window (runs over |distinct balances|, not |rows|); the
    per-group fence table is group-count-sized and broadcast back onto
    the census — one shuffle on the group key, no row-level re-sort, and
    the final clamp-sum is map-side combinable."""
    cust = load(spark, sf_dir, "customer")
    census = (
        cust.select(
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("seg", "cents")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    wcum = Window.partitionBy("seg").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("seg")
    ranked = census.select(
        "seg",
        "cents",
        "t",
        F.sum("t").over(wcum).alias("cum"),
        F.sum("t").over(wall).alias("n"),
    )
    fence = lambda k, name: F.min(  # noqa: E731
        F.when(100 * F.col("cum") >= k * F.col("n"), F.col("cents"))
    ).alias(name)
    bounds = ranked.groupBy("seg").agg(fence(5, "lo"), fence(95, "hi"))
    clamped = census.join(F.broadcast(bounds), "seg").select(
        "seg",
        "lo",
        "hi",
        "t",
        (F.col("t") * F.least(F.greatest("cents", "lo"), F.col("hi"))).alias("w"),
    )
    return (
        clamped.groupBy("seg", "lo", "hi")
        .agg(
            F.sum("t").alias("n_rows"),
            # widen the clamp-sum: Σ t·cents is total-revenue-sized and
            # would wrap int64 around ~10^19 cents (the
            # mix_budget_apportion_lr class); DECIMAL(38,0) DIV is exact
            # and returns long
            F.sum(F.col("w").cast("decimal(38,0)")).alias("wsum"),
        )
        .select(
            "seg",
            F.col("lo").alias("lo_cents"),
            F.col("hi").alias("hi_cents"),
            "n_rows",
            F.expr("wsum DIV n_rows").alias("winsor_mean_cents"),
        )
        .orderBy("seg")
    )


# ------------- 2.10 time series: max drawdown from the running peak

_DRAWDOWN_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority AS pri, date_trunc('month', o_orderdate) AS mon,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM orders GROUP BY 1, 2
),
path AS (
  SELECT pri, mon, rev,
         max(rev) OVER (PARTITION BY pri ORDER BY mon
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak
  FROM monthly
),
dd AS (
  SELECT pri, mon, rev, peak, peak - rev AS drawdown,
         row_number() OVER (PARTITION BY pri
                            ORDER BY peak - rev DESC, mon) AS rn
  FROM path
)
SELECT pri,
       CAST(drawdown AS BIGINT) AS max_dd_cents,
       CAST(peak AS BIGINT) AS peak_cents,
       CAST(mon AS DATE) AS trough_month,
       CAST(drawdown * 10000 // peak AS BIGINT) AS max_dd_bps
FROM dd WHERE rn = 1 ORDER BY pri
"""


@query("ts_drawdown_max", "2.10 streaming/time series", _DRAWDOWN_ORACLE)
def ts_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown — the worst peak-to-trough drop of each monthly
    revenue series, measured against the RUNNING peak (a cummax window,
    the one cumulative shape the catalog's sum-based windows don't
    exercise): the risk metric every portfolio/revenue dashboard carries,
    with the trough month and the drop in integer basis points of the
    peak it fell from.

    Scale shape: month-grain map-side reduction first, so the cummax and
    the argmax-by-drawdown rank share one tiny (series)-keyed exchange;
    ×10000 is widened to DECIMAL(38,0) before DIV (the
    mix_budget_apportion_lr overflow class — peaks are unbounded cents)."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("rev"))
    wpeak = Window.partitionBy("pri").orderBy("mon").rowsBetween(
        Window.unboundedPreceding, 0
    )
    path = monthly.withColumn("peak", F.max("rev").over(wpeak)).withColumn(
        "drawdown", F.col("peak") - F.col("rev")
    )
    ranked = path.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("pri").orderBy(F.col("drawdown").desc(), "mon")
        ),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "pri",
            F.col("drawdown").alias("max_dd_cents"),
            F.col("peak").alias("peak_cents"),
            F.col("mon").cast("date").alias("trough_month"),
            F.expr(
                "CAST(drawdown AS DECIMAL(38,0)) * 10000 DIV peak"
            ).alias("max_dd_bps"),
        )
        .orderBy("pri")
    )


# ------- 2.12 composite: loss-development triangle (chain-ladder ATA)

_TRIANGLE_ORACLE = """
WITH li AS (
  SELECT (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS origin_ym,
         (year(l.l_shipdate) * 12 + month(l.l_shipdate))
           - (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS dev,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE year(o.o_orderdate) = 1994
),
inc AS (
  SELECT origin_ym, least(dev, 6) AS dev, SUM(cents) AS paid
  FROM li GROUP BY 1, 2
),
grid AS (
  SELECT o.origin_ym, d.dev, coalesce(i.paid, 0) AS paid
  FROM (SELECT DISTINCT origin_ym FROM inc) o
  CROSS JOIN (SELECT unnest(range(0, 7)) AS dev) d
  LEFT JOIN inc i ON i.origin_ym = o.origin_ym AND i.dev = d.dev
),
cum AS (
  SELECT origin_ym, dev,
         SUM(paid) OVER (PARTITION BY origin_ym ORDER BY dev) AS cum_paid
  FROM grid
)
SELECT a.dev AS dev_from,
       CAST(a.dev + 1 AS BIGINT) AS dev_to,
       CAST(count(*) AS BIGINT) AS n_origins,
       CAST(SUM(a.cum_paid) AS BIGINT) AS sum_cum_from,
       CAST(SUM(b.cum_paid) AS BIGINT) AS sum_cum_to,
       CAST(SUM(b.cum_paid) * 10000 // SUM(a.cum_paid) AS BIGINT) AS ata_bps
FROM cum a JOIN cum b ON b.origin_ym = a.origin_ym AND b.dev = a.dev + 1
GROUP BY a.dev ORDER BY dev_from
"""


@query("wl_loss_dev_triangle", "2.12 composite workloads", _TRIANGLE_ORACLE)
def wl_loss_dev_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development triangle — revenue recognized by (origin
    month, development age), cumulated along the age axis, then the
    volume-weighted age-to-age link ratios (Σ cum_{d+1} / Σ cum_d over
    the 1994 origins, integer bps) that actuaries and finance teams use
    to project unbilled runoff. Dev age = calendar months from order to
    ship, capped at 6 so the triangle has a fixed rectangular support.

    Scale shape: the fact join reduces to a (origin, dev) cell grid —
    144 rows per year regardless of fact volume — BEFORE the dense
    cross-grid fill and the cumulative window, so the triangle algebra
    runs on cells; the dev→dev+1 pairing is a self equi-join on the tiny
    cumulated grid. ×10000 widened to DECIMAL(38,0) before DIV."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    o = load(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1994).select(
        "o_orderkey", "o_orderdate"
    )
    ym = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    inc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            ym("o_orderdate").alias("origin_ym"),
            F.least(ym("l_shipdate") - ym("o_orderdate"), F.lit(6))
            .cast("long")
            .alias("dev"),
            "cents",
        )
        .groupBy("origin_ym", "dev")
        .agg(F.sum("cents").alias("paid"))
    )
    origins = inc.select("origin_ym").distinct()
    devs = spark.range(0, 7).select(F.col("id").alias("dev"))
    grid = (
        origins.crossJoin(F.broadcast(devs))
        .join(inc, ["origin_ym", "dev"], "left")
        .select("origin_ym", "dev", F.coalesce("paid", F.lit(0)).alias("paid"))
    )
    wcum = Window.partitionBy("origin_ym").orderBy("dev").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        "origin_ym", "dev", F.sum("paid").over(wcum).alias("cum_paid")
    )
    a, b = cum.alias("a"), cum.alias("b")
    return (
        a.join(
            b,
            (F.col("b.origin_ym") == F.col("a.origin_ym"))
            & (F.col("b.dev") == F.col("a.dev") + 1),
        )
        .groupBy(F.col("a.dev").alias("dev_from"))
        .agg(
            F.count(F.lit(1)).alias("n_origins"),
            F.sum("a.cum_paid").alias("sum_cum_from"),
            F.sum("b.cum_paid").alias("sum_cum_to"),
        )
        .select(
            "dev_from",
            (F.col("dev_from") + 1).cast("long").alias("dev_to"),
            "n_origins",
            "sum_cum_from",
            "sum_cum_to",
            F.expr(
                "CAST(sum_cum_to AS DECIMAL(38,0)) * 10000 DIV sum_cum_from"
            ).alias("ata_bps"),
        )
        .orderBy("dev_from")
    )
