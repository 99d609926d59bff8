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
