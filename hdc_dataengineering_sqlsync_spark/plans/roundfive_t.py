"""SURVEY.md §2 round-5 additions, batch CC.

Multi-resolution rollup cascade (continuous-aggregate discipline).
Registered after ``roundfive_s`` (plans/__init__.py) so the qids append
to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

_CASCADE_ORACLE = """
WITH raw AS (
  SELECT event_type,
         epoch_us(ts) // 60000000 AS m,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
minute AS (
  SELECT event_type, m, COUNT(*) AS n, SUM(cents) AS cents
  FROM raw GROUP BY event_type, m
),
hour AS (
  SELECT event_type, m // 60 AS h, SUM(n) AS n, SUM(cents) AS cents
  FROM minute GROUP BY event_type, m // 60
),
day AS (
  SELECT event_type, h // 24 AS d, SUM(n) AS n, SUM(cents) AS cents
  FROM hour GROUP BY event_type, h // 24
)
SELECT 'a_minute' AS level, CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(n) AS BIGINT) AS total_n,
       CAST(SUM(cents) AS BIGINT) AS total_cents FROM minute
UNION ALL
SELECT 'b_hour', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT),
       CAST(SUM(cents) AS BIGINT) FROM hour
UNION ALL
SELECT 'c_day', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT),
       CAST(SUM(cents) AS BIGINT) FROM day
ORDER BY level
"""


@query("ts_rollup_cascade", "2.10 streaming", _CASCADE_ORACLE)
def ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup CASCADE: each level aggregates the previous.

    The continuous-aggregate discipline (TimescaleDB hypertable rollups,
    druid/pinot star-trees): minute buckets build from raw ONCE, hourly
    builds FROM THE MINUTE LEVEL, daily from hourly — never from raw.
    That works because count/sum are associative partials (avg at any
    level = sum/count of partials; a naive avg-of-avgs would be wrong) —
    and it is what makes a 100 TB metrics store maintainable: the raw
    scan happens once per refresh window, coarser levels re-aggregate
    KB-scale partials. The census pins the lossless-re-aggregation
    property across all three levels: totals agree exactly, bucket
    counts strictly decrease.

    Scale shape: each level is MATERIALIZED — which is the point of the
    pattern (a continuous aggregate IS a stored table, refreshed
    incrementally): raw scans once into the minute table, and every
    coarser level re-aggregates the materialized partials of the level
    below (localCheckpoint here; an incrementally-maintained sink —
    `sync_incremental_agg` / `stream_sync_foreachbatch` — in
    deployment). The census plan therefore contains ZERO raw scans
    (plan-asserted)."""
    raw = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 60000000").alias("m"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    minute = (
        raw.groupBy("event_type", "m")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
        .localCheckpoint(eager=True)  # the materialized minute table
    )
    hour = (
        minute.groupBy("event_type", F.expr("m div 60").alias("h"))
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        .localCheckpoint(eager=True)  # materialized hourly rollup
    )
    day = hour.groupBy("event_type", F.expr("h div 24").alias("d")).agg(
        F.sum("n").alias("n"), F.sum("cents").alias("cents")
    )

    def census(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("level"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n").alias("total_n"),
            F.sum("cents").alias("total_cents"),
        ).select("level", "n_buckets", "total_n", "total_cents")

    return (
        census(minute, "a_minute")
        .unionByName(census(hour, "b_hour"))
        .unionByName(census(day, "c_day"))
        .orderBy("level")
    )
