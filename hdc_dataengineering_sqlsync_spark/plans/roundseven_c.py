"""SURVEY.md §2 round-7 batch C: rolling robust statistics, an RSI
indicator, a cross-table temporal audit, and UniMax-style epoch planning.

  win_rolling_median7      exact rolling median (doubled-integer idiom)
  ts_rsi_sma14             RSI (SMA variant) in half-up integer bps
  dq_temporal_consistency  order->ship lag classes incl. violation census
  mix_upsample_epochs      equal-allocation mixture epochs with a cap
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------- 2.5 windows: exact rolling median over 7-day frames

_ROLLMED_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
),
w AS (
  SELECT day,
         count(*) OVER fr AS n,
         list_sort(list(cents) OVER fr) AS a
  FROM daily
  WINDOW fr AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day,
       CAST(n AS BIGINT) AS n,
       CAST(a[CAST((n + 1) // 2 AS INT)] + a[CAST(n // 2 + 1 AS INT)] AS BIGINT)
         AS med2_cents
FROM w ORDER BY day
"""


@query("win_rolling_median7", "2.5 windows", _ROLLMED_ORACLE)
def win_rolling_median7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling MEDIAN over the trailing 7-day frame of the 1995 daily
    revenue series — the robust twin of ts_bollinger_bands' rolling mean
    (one outlier day cannot move it). The frame's values collect into a
    sorted array and the doubled-median idiom (lower-mid + upper-mid, an
    exact int64 = 2x the median) avoids the .5 float midpoint entirely.

    Scale shape: the fact stream reduces to the daily grain map-side
    FIRST; the window runs over |days| rows (365 here) and the per-row
    array is the bounded 7-element frame — at 100 TB partition by series
    id (the ts_rollup_cascade argument) and the per-series sort stays
    tiny. A windowed collect over an UNBOUNDED frame would be the
    anti-pattern; the bounded frame keeps state O(w)."""
    o = load(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    daily = (
        o.select(
            F.to_date("o_orderdate").alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    fr = Window.orderBy("day").rowsBetween(-6, 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.array_sort(F.collect_list("cents").over(fr)).alias("a"),
    )
    return w.select(
        "day",
        "n",
        (
            F.element_at("a", ((F.col("n") + 1) / 2).cast("int"))
            + F.element_at("a", (F.col("n") / 2 + 1).cast("int"))
        ).cast("long").alias("med2_cents"),
    ).orderBy("day")


# --------------------------- 2.10 time series: RSI (SMA-14) indicator

_RSI_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
),
d AS (
  SELECT day, cents - lag(cents) OVER (ORDER BY day) AS delta FROM daily
),
g AS (
  SELECT day,
         greatest(delta, 0) AS gain,
         greatest(-delta, 0) AS loss
  FROM d WHERE delta IS NOT NULL
),
w AS (
  SELECT day,
         count(*) OVER fr AS n,
         sum(gain) OVER fr AS sg,
         sum(loss) OVER fr AS sl
  FROM g
  WINDOW fr AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(n AS BIGINT) AS n,
       CAST(sg AS BIGINT) AS sum_gain_cents,
       CAST(sl AS BIGINT) AS sum_loss_cents,
       CAST(CASE WHEN sg + sl = 0 THEN 5000
                 ELSE (sg * 20000 + (sg + sl)) // (2 * (sg + sl)) END AS BIGINT)
         AS rsi_bps
FROM w ORDER BY day
"""


@query("ts_rsi_sma14", "2.10 streaming/time series", _RSI_ORACLE)
def ts_rsi_sma14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (simple-moving-average variant) over the
    1995 daily revenue series: day-over-day deltas split into gains and
    losses, summed over the trailing 14-row frame, RSI = gains/(gains+
    losses) in half-up integer bps (10000 = all-gains; a flat frame pins
    to 5000 by convention — the division-by-zero case handled identically
    in both engines). Wilder's recursive smoothing is deliberately NOT
    used: it makes every value depend on the entire history (a sequential
    scan); the SMA form is windowable and the standard approximation.

    Scale shape: map-side daily reduction, then one lag + one bounded
    frame over |days| rows — partition by series id at 100 TB; all
    arithmetic exact int64 cents."""
    o = load(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    daily = (
        o.select(
            F.to_date("o_orderdate").alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    delta = F.col("cents") - F.lag("cents").over(Window.orderBy("day"))
    g = (
        daily.select("day", delta.alias("delta"))
        .where(F.col("delta").isNotNull())
        .select(
            "day",
            F.greatest(F.col("delta"), F.lit(0)).alias("gain"),
            F.greatest(-F.col("delta"), F.lit(0)).alias("loss"),
        )
    )
    fr = Window.orderBy("day").rowsBetween(-13, 0)
    w = g.select(
        "day",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("gain").over(fr).alias("sg"),
        F.sum("loss").over(fr).alias("sl"),
    )
    return w.select(
        "day",
        "n",
        F.col("sg").alias("sum_gain_cents"),
        F.col("sl").alias("sum_loss_cents"),
        F.expr(
            "cast(case when sg + sl = 0 then 5000"
            " else (sg * 20000 + (sg + sl)) div (2 * (sg + sl)) end as bigint)"
        ).alias("rsi_bps"),
    ).orderBy("day")


# ------------------- 2.8 sync core: cross-table temporal consistency

_TEMPORAL_ORACLE = """
WITH j AS (
  SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
c AS (
  SELECT CASE WHEN lag_d < 0 THEN 'violation_ship_before_order'
              WHEN lag_d <= 7 THEN 'week'
              WHEN lag_d <= 30 THEN 'month'
              ELSE 'late' END AS lag_class,
         count(*) AS n_lines
  FROM j GROUP BY 1
),
t AS (SELECT sum(n_lines) AS total FROM c)
SELECT lag_class, CAST(n_lines AS BIGINT) AS n_lines,
       CAST((n_lines * 20000 + t.total) // (2 * t.total) AS BIGINT) AS share_bps
FROM c, t ORDER BY lag_class
"""


@query("dq_temporal_consistency", "2.8 sync core", _TEMPORAL_ORACLE)
def dq_temporal_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-TABLE temporal-ordering audit: order->ship lag classes over
    the orders⋈lineitem join, with ship-before-order as an explicit
    violation class — the referential-TIME check dq_constraint_report's
    single-table rules and FK-existence checks cannot express (a child row
    can exist, be non-null, and still claim to ship before its parent was
    placed). Census in half-up integer bps of all lines.

    Scale shape: the join is the standard orders⋈lineitem equi-shuffle
    (or colocates when both are bucketed by orderkey — join_bucketed_
    colocate's layout); lag math is map-side date arithmetic and the
    census is a 4-row aggregate."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag_d = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    cls = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(lag_d < 0, "violation_ship_before_order")
            .when(lag_d <= 7, "week")
            .when(lag_d <= 30, "month")
            .otherwise("late")
            .alias("lag_class")
        )
        .groupBy("lag_class")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    t = cls.agg(F.sum("n_lines").alias("total"))
    return (
        cls.crossJoin(F.broadcast(t))
        .select(
            "lag_class",
            "n_lines",
            F.expr("cast((n_lines * 20000 + total) div (2 * total) as bigint)").alias(
                "share_bps"
            ),
        )
        .orderBy("lag_class")
    )


# ------------------------ 2.9 llm-data: mixture epoch planning (UniMax)

_EPOCH_CAP = 4

_EPOCHS_ORACLE = f"""
WITH per AS (
  SELECT lang, CAST(sum(len(string_split_regex(lower(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang
),
t AS (SELECT sum(n_tokens) AS total, count(*) AS n_langs FROM per)
SELECT lang, n_tokens,
       CAST(t.total // t.n_langs AS BIGINT) AS target_tokens,
       CAST(least((t.total // t.n_langs + n_tokens - 1) // n_tokens,
                  {_EPOCH_CAP}) AS BIGINT) AS epochs,
       CAST(least(t.total // t.n_langs,
                  n_tokens * least((t.total // t.n_langs + n_tokens - 1) // n_tokens,
                                   {_EPOCH_CAP})) AS BIGINT) AS alloc_tokens
FROM per, t ORDER BY lang
"""


@query("mix_upsample_epochs", "2.9 llm-data", _EPOCHS_ORACLE)
def mix_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style mixture epoch planning: the token budget splits EQUALLY
    across languages, each language repeats ceil(target/available) epochs
    capped at 4 (the UniMax repeat cap that stops low-resource langs from
    memorization-grade duplication); alloc = min(target, available×epochs).
    One-shot allocation — production UniMax redistributes capped
    languages' unused budget in a driver-side loop over the #langs-row
    table (documented, not declared: the redistribution is iterative
    water-filling over a tiny table, not a data-scale op). All integers:
    ceil via (a+b-1) div b, no float share anywhere.

    Scale shape: ONE map-side token-count aggregate to #langs rows; the
    plan math is a broadcast total over that tiny table. Companion to
    mix_temperature_weights (smooth rebalance) — this is the hard-cap
    variant actually used for multilingual pretraining."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.lower("text"), r"\s+"))).cast("long").alias("n_tokens")
    )
    t = per.agg(F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_langs"))
    return (
        per.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "n_tokens",
            F.expr("cast(total div n_langs as bigint)").alias("target_tokens"),
            F.expr(
                f"cast(least((total div n_langs + n_tokens - 1) div n_tokens,"
                f" {_EPOCH_CAP}) as bigint)"
            ).alias("epochs"),
            F.expr(
                f"cast(least(total div n_langs,"
                f" n_tokens * least((total div n_langs + n_tokens - 1) div n_tokens,"
                f" {_EPOCH_CAP})) as bigint)"
            ).alias("alloc_tokens"),
        )
        .orderBy("lang")
    )
