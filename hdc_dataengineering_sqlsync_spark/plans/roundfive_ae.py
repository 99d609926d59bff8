"""SURVEY.md §2 round-5 additions, batch NN.

Exact-percentile machinery: a Hampel rolling-median outlier filter over
the daily revenue series (two exact-median window passes, integer-exact
decision rule) and dyadic-quantile fulfillment-latency quartiles. Both
lean on a probed parity: Spark ``percentile`` and DuckDB
``quantile_cont`` interpolate with the identical ``(n-1)*p`` position
formula, and for dyadic p (k/4) over integer data every intermediate is
an exact binary fraction — bit-identical doubles on both engines, no
rounding needed. Registered after ``roundfive_ad`` (plans/__init__.py)
so the qids append to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Hampel filter: flag day t iff |y_t - med(window)| > 3 * 1.4826 * MAD.
# Medians over integer cents are .5-granular, so DOUBLED medians are
# integers; the decision rule cross-multiplies to stay integer-exact:
#   2|dev| * 10000 > 44478 * 2*MAD      (3 * 1.4826 = 4.4478 exactly)
# — no float ever decides a flag, the same discipline as the XYZ/ABC
# class boundaries.
_HAMPEL_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
med AS (
  SELECT day, y,
         CAST(2 * quantile_cont(y, 0.5) OVER
              (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
              AS BIGINT) AS med2
  FROM daily
),
dev AS (
  SELECT day, y, med2, abs(2 * y - med2) AS d2 FROM med
),
mad AS (
  SELECT day, y, med2, d2,
         CAST(2 * quantile_cont(d2, 0.5) OVER
              (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
              AS BIGINT) AS mad4
  FROM dev
)
SELECT day, y AS y_cents,
       CAST(med2 AS DOUBLE) / 2 AS med,
       CAST(mad4 AS DOUBLE) / 4 AS mad
FROM mad
WHERE d2 * 20000 > 44478 * mad4
ORDER BY day
"""


@query("ts_hampel_outliers", "2.10 streaming", _HAMPEL_ORACLE)
def ts_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel rolling-median outlier filter over the daily revenue series.

    The robust anomaly detector ops teams actually deploy (z-scores
    break on the outliers they hunt; `ts_anomaly_zscore` is the fragile
    baseline): flag day t iff |y_t − med±3d| > 3·1.4826·MAD±3d, both
    statistics EXACT rolling medians via percentile windows. Medians of
    integer cents are .5-granular, so the pipeline carries DOUBLED
    medians (integers); MAD of doubled deviations is quartered, and the
    flag rule cross-multiplies (2|dev|·10000 > 44478·2MAD) so ZERO
    floats participate in any decision — a boundary day cannot flap
    between engines.

    Scale shape: the fact table reduces first to #days rows; both
    window passes run over that tiny ordered series. Per-key Hampel at
    100 TB (millions of series) keys the same windows by series id —
    partition-parallel, no global sort. Exact-median windows over a
    bounded ROWS frame are O(frame log frame) per row on reduced data,
    the right trade against sketch medians which would not be
    deterministic across engines."""
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("y"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    med = daily.select(
        "day", "y",
        (2 * F.expr("percentile(y, 0.5)").over(w)).cast("long").alias("med2"),
    )
    dev = med.select(
        "day", "y", "med2", F.abs(2 * F.col("y") - F.col("med2")).alias("d2")
    )
    mad = dev.select(
        "day", "y", "med2", "d2",
        (2 * F.expr("percentile(d2, 0.5)").over(w)).cast("long").alias("mad4"),
    )
    return (
        mad.where(F.col("d2") * 20000 > 44478 * F.col("mad4"))
        .select(
            "day",
            F.col("y").alias("y_cents"),
            (F.col("med2").cast("double") / 2).alias("med"),
            (F.col("mad4").cast("double") / 4).alias("mad"),
        )
        .orderBy("day")
    )


# Quartiles use dyadic p = k/4: (n-1)*p and the interpolation fraction
# are exact binary fractions over integer day-lags, so lo + frac*(hi-lo)
# is bit-identical in Spark percentile and DuckDB quantile_cont — the
# doubles compare equal with NO rounding.
_LATENCY_ORACLE = """
WITH lag AS (
  SELECT o_orderpriority AS prio,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) AS BIGINT) AS days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT prio,
       COUNT(*) AS n,
       quantile_cont(days, 0.25) AS p25,
       quantile_cont(days, 0.50) AS p50,
       quantile_cont(days, 0.75) AS p75,
       CAST(MAX(days) AS BIGINT) AS worst
FROM lag GROUP BY prio ORDER BY prio
"""


@query("wl_latency_quartiles", "2.12 composite workloads", _LATENCY_ORACLE)
def wl_latency_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency quartiles per order priority, exact and float-safe.

    The fulfillment-SLA report: p25/p50/p75/max of (shipdate −
    orderdate) days per order priority — does URGENT actually ship
    faster? Quantiles are EXACT (percentile, not
    approx_percentile) and deliberately DYADIC: with p ∈ {¼,½,¾} the
    rank position (n−1)p and the interpolation weight are exact binary
    fractions, so the interpolated double is bit-identical across
    engines — the only probe-proven way to compare raw quantile doubles
    with no rounding step at all. (p90/p99 would ride 0.9/0.99, which
    are NOT binary-representable; that variant needs a rounding
    convention and lives with `agg_percentile`.)

    Scale shape: the join is the fact-to-fact orderkey equi-join Spark
    shuffles on the key; exact per-group percentiles sort within each
    priority group only — 5 groups × bounded-range integer lags means
    the per-group state collapses to a count-by-value map at any corpus
    size (the engine's percentile on ints exploits this)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("days"),
    )
    return (
        lag.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(days, 0.25D)").alias("p25"),
            F.expr("percentile(days, 0.50D)").alias("p50"),
            F.expr("percentile(days, 0.75D)").alias("p75"),
            F.max("days").alias("worst"),
        )
        .orderBy("prio")
    )
