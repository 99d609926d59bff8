"""SURVEY.md §2 round-9 batch E: reset-on-event running totals, WAPE
forecast accuracy, two-hop reach.

  win_cumsum_reset      running spend that resets at each purchase event
  ts_forecast_wape      revenue WAPE of the year-ago seasonal-naive
  graph_two_hop_reach   distinct 2-hop neighborhood size, top-k

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------- 2.5 windows: conditional-reset running total


@query(
    "win_cumsum_reset",
    "2.5 windows",
    """
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_reset
  FROM events
),
grp AS (
  SELECT user_id, ts, event_id, cents, is_reset,
         coalesce(SUM(is_reset) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS g
  FROM ev
),
run AS (
  SELECT user_id, ts, event_id, is_reset,
         SUM(cents) OVER (PARTITION BY user_id, g ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running
  FROM grp
),
ranked AS (
  SELECT user_id, is_reset, running,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM run
)
SELECT user_id,
       CAST(SUM(is_reset) AS BIGINT) AS n_resets,
       CAST(MAX(running) AS BIGINT) AS max_running_cents,
       CAST(MAX(CASE WHEN rn = 1 THEN running END) AS BIGINT)
         AS last_running_cents
FROM ranked GROUP BY user_id ORDER BY user_id
""",
)
def win_cumsum_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total that RESETS on a marker event — 'spend up to and
    including each purchase', the conditional accumulator every
    loyalty/credit pipeline needs and plain cumulative windows can't
    express directly. The classic rewrite: the cumulative count of PRIOR
    reset markers is a group id — the reset row CLOSES its own group (its
    spend lands in the period it ends) and the next row starts the new
    one — then an ordinary cumsum runs within (user, group). All exact
    integer cents.

    Scale shape: the group-id and rank windows share the (user)-keyed
    exchange; the within-group cumsum re-keys on (user, group) — one
    extra keyed exchange, still no self-join and no iteration; the final
    per-user rollup is map-side combinable."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_reset"),
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grp = ev.withColumn(
        "g",
        F.coalesce(
            F.sum("is_reset").over(order.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    run_w = (
        Window.partitionBy("user_id", "g")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = grp.withColumn("running", F.sum("cents").over(run_w)).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        ),
    )
    return (
        run.groupBy("user_id")
        .agg(
            F.sum("is_reset").alias("n_resets"),
            F.max("running").alias("max_running_cents"),
            F.max(F.when(F.col("rn") == 1, F.col("running"))).alias(
                "last_running_cents"
            ),
        )
        .orderBy("user_id")
    )


# -------- 2.10 time series: WAPE of the year-ago seasonal-naive forecast

_WAPE_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(l_shipdate) AS INT) AS yr, CAST(month(l_shipdate) AS INT) AS mon,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2
),
scored AS (
  SELECT a.mon, a.rev AS actual, f.rev AS forecast,
         abs(a.rev - f.rev) AS abs_err
  FROM monthly a JOIN monthly f ON f.yr = 1995 AND f.mon = a.mon
  WHERE a.yr = 1996
)
SELECT CAST((mon + 2) // 3 AS INT) AS quarter,
       CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err_cents,
       CAST(SUM(actual) AS BIGINT) AS sum_actual_cents,
       CAST(SUM(abs_err) * 10000 // SUM(actual) AS BIGINT) AS wape_bps
FROM scored GROUP BY 1 ORDER BY quarter
"""


@query("ts_forecast_wape", "2.10 streaming/time series", _WAPE_ORACLE)
def ts_forecast_wape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAPE (weighted absolute percentage error) of the year-ago
    seasonal-naive forecast — THE forecast-accuracy KPI demand planners
    report, because unweighted MAPE explodes on small months: 1996
    monthly revenue scored against its 1995 counterpart, Σ|err| / Σactual
    per quarter in exact integer basis points (the count-MAE backtest is
    `ts_seasonal_naive_forecast`; this is the revenue-weighted accuracy
    view).

    Scale shape: month-grain map-side reduction, then a 12-row self
    equi-join on the month key and a 4-row census — the calendar-join
    backtest shape that shards by date range at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    monthly = (
        li.where(F.year("l_shipdate").isin(1995, 1996))
        .groupBy(
            F.year("l_shipdate").alias("yr"), F.month("l_shipdate").alias("mon")
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("rev")
        )
    )
    a = monthly.where(F.col("yr") == 1996).select("mon", F.col("rev").alias("actual"))
    f = monthly.where(F.col("yr") == 1995).select(
        "mon", F.col("rev").alias("forecast")
    )
    return (
        a.join(F.broadcast(f), "mon")
        .select(
            F.expr("(mon + 2) DIV 3").cast("int").alias("quarter"),
            F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
            "actual",
        )
        .groupBy("quarter")
        .agg(
            F.sum("abs_err").alias("sum_abs_err_cents"),
            F.sum("actual").alias("sum_actual_cents"),
        )
        .select(
            "quarter",
            "sum_abs_err_cents",
            "sum_actual_cents",
            # widen before *10000: quarterly cents × 1e4 exceeds int64 from
            # ~2 TB of revenue upward (the mix_budget_apportion_lr class);
            # DIV on decimal(38,0) is exact and returns long
            F.expr(
                "CAST(sum_abs_err_cents AS DECIMAL(38,0)) * 10000"
                " DIV sum_actual_cents"
            ).alias("wape_bps"),
        )
        .orderBy("quarter")
    )


# ------------- 2.12 composite: two-hop reach (neighborhood size)

_REACH_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
reach AS (
  SELECT a.s AS supp, count(DISTINCT b.s) AS reach2
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.s <> b.s
  GROUP BY a.s
)
SELECT supp, CAST(reach2 AS BIGINT) AS reach2
FROM reach ORDER BY reach2 DESC, supp LIMIT 20
"""


@query("graph_two_hop_reach", "2.12 composite workloads", _REACH_ORACLE)
def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach — the SIZE of each supplier's 2-hop neighborhood
    (how many other suppliers it touches through shared customers): the
    influence-surface metric behind contagion/exposure analyses, distinct
    from the pairwise scores (`graph_jaccard_linkpred`) and weighted
    walks (`graph_katz_2step`) because it is a DISTINCT-count over the
    blocked pair expansion.

    Scale shape: the same customer-blocked self-join discipline as the
    link-prediction family (pairs only materialize through shared
    customers, never all-pairs), one distinct-count keyed agg, top-k as
    TakeOrdered."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = pairs.alias("a"), pairs.alias("b")
    return (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") != F.col("b.s")))
        .groupBy(F.col("a.s").alias("supp"))
        .agg(F.countDistinct(F.col("b.s")).alias("reach2"))
        .orderBy(F.col("reach2").desc(), "supp")
        .limit(20)
    )
