"""SURVEY.md §2 — time-series operators over the events stream: spine
gap-filling and event-time trailing windows. Both are standard telemetry/
feature-engineering shapes a sync'd events table feeds downstream.

Cross-engine determinism: all event-time arithmetic is exact integer
microseconds (`unix_micros` / `epoch_us`) — never float epoch seconds, which
would make window membership flap at boundaries (SURVEY §2 conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

_GAPFILL_ORACLE = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n, round(sum(value), 2) AS total
  FROM events WHERE event_type = 'purchase' GROUP BY h
),
lim AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM lim)
SELECT spine.h AS bucket_ts,
       CAST(coalesce(b.n, 0) AS BIGINT) AS n,
       coalesce(b.total, 0.0) AS total
FROM spine LEFT JOIN b ON spine.h = b.h
ORDER BY bucket_ts
"""


@query("ts_gapfill_hourly", "2.10 streaming", _GAPFILL_ORACLE)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series for purchase events: aggregate per hour, then
    left-join onto a complete hour spine (explode(sequence(min, max, 1h)))
    so empty buckets surface as zeros — the densification step every
    downstream window/forecast op assumes. The spine is generated, not
    scanned: its size is the time span, independent of event volume."""
    e = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    b = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    spine = (
        b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    )
    return (
        spine.join(b, "h", "left")
        .select(
            F.col("h").alias("bucket_ts"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
        .orderBy("bucket_ts")
    )


_TRAILING_ORACLE = """
SELECT event_id,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 2) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


@query("win_range_time", "2.5 windows", _TRAILING_ORACLE)
def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour event-time window per user (count + rounded value
    sum) — the RANGE frame keyed on exact integer microseconds, so two
    events 3600.000001s apart are correctly outside each other's window on
    both engines. One shuffle on user_id, one sort within partitions."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum("value").over(w), 2).alias("sum_1h"),
        )
        .orderBy("event_id")
    )


_OHLC_ORACLE = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS h, value, ts, event_id
  FROM events WHERE event_type = 'purchase'
),
w AS (
  SELECT h, value,
         first_value(value) OVER (PARTITION BY h ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
         last_value(value) OVER (PARTITION BY h ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
  FROM b
)
SELECT h AS bucket_ts,
       round(min(o), 2) AS open, round(max(value), 2) AS high,
       round(min(value), 2) AS low, round(min(c), 2) AS close,
       count(*) AS n
FROM w GROUP BY h ORDER BY bucket_ts
"""


@query("ts_resample_ohlc", "2.10 streaming", _OHLC_ORACLE)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC resample of the purchase-value series: open/close via
    min_by/max_by on a (ts, event_id) struct — a single hash aggregate, no
    window sort — with the unique event_id breaking intra-hour timestamp
    ties deterministically (the oracle expresses the same pick as framed
    first/last_value since DuckDB's arg_min lacks composite keys). min/max/
    count ride the same aggregate, so the whole resample is one shuffle on
    the hour bucket."""
    e = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            F.round(F.expr("min_by(value, struct(ts, event_id))"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.expr("max_by(value, struct(ts, event_id))"), 2).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bucket_ts")
    )


_ZSCORE_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY event_type, h
),
scored AS (
  SELECT event_type, h, n,
         avg(n)         OVER w AS mu,
         stddev_samp(n) OVER w AS sigma
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, h AS bucket_ts, n,
       round((n - mu) / sigma, 4) AS zscore
FROM scored
WHERE sigma IS NOT NULL AND sigma > 1e-9 AND abs((n - mu) / sigma) > 2.0
ORDER BY event_type, bucket_ts
"""


@query("ts_anomaly_zscore", "2.10 streaming", _ZSCORE_ORACLE)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly event counts per type, z-scored
    against the trailing 24 fully-closed hours (frame ends at 1 PRECEDING so
    the current hour never contaminates its own baseline), flagging |z| > 2.
    Counts are exact integers, so mean/variance drift is sub-ulp and
    round(·,4) absorbs it; sigma≈0 buckets are excluded on both sides before
    the division. One shuffle (type+hour agg), one window sort per type."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    scored = hourly.select(
        "event_type",
        "h",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        scored.where(F.col("sigma").isNotNull() & (F.col("sigma") > 1e-9) & (F.abs(z) > 2.0))
        .select("event_type", F.col("h").alias("bucket_ts"), "n", F.round(z, 4).alias("zscore"))
        .orderBy("event_type", "bucket_ts")
    )


_EWMA_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY event_type, h
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hourly
)
SELECT a.event_type, a.h AS bucket_ts, a.n,
       round(sum(b.n * pow(0.6, a.rn - b.rn)) / sum(pow(0.6, a.rn - b.rn)), 4) AS ewma
FROM r a JOIN r b
  ON a.event_type = b.event_type AND b.rn BETWEEN a.rn - 9 AND a.rn
GROUP BY a.event_type, a.h, a.n
ORDER BY a.event_type, bucket_ts
"""


@query("ts_ewma", "2.10 streaming", _EWMA_ORACLE)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed exponential moving average (decay 0.6 per observed bucket,
    last 10 buckets) of hourly event counts per type. Spark side: one window
    collect_list over a ROWS -9..0 frame, then a sequential higher-order
    `aggregate` over the reversed list — weights are generated positionally
    in the lambda, never materialized, and the whole series needs one sort
    per type (no self-join). The oracle expresses the same math as a bounded
    rn-range self-join, which DuckDB can write but which would be the wrong
    plan at scale. round(·,4) absorbs the engines' differing summation
    order over the ≤10 products."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-9, 0)
    ewma = F.expr(
        "aggregate(reverse(xs), "
        "named_struct('s', cast(0.0 as double), 'w', cast(0.0 as double), 'k', 0), "
        "(acc, x) -> named_struct("
        "  's', acc.s + x * pow(0.6, acc.k), "
        "  'w', acc.w + pow(0.6, acc.k), "
        "  'k', acc.k + 1), "
        "acc -> acc.s / acc.w)"
    )
    return (
        hourly.select("event_type", "h", "n", F.collect_list("n").over(w).alias("xs"))
        .select(
            "event_type",
            F.col("h").alias("bucket_ts"),
            "n",
            F.round(ewma, 4).alias("ewma"),
        )
        .orderBy("event_type", "bucket_ts")
    )
