"""SURVEY.md §2 round-5 additions, batch DD.

DST-boundary timezone conversion. Registered after ``roundfive_t``
(plans/__init__.py) so the qids append to the END of the never-checked
rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Deterministic probe times: a 10-hour fan of offsets around BOTH 2024
# America/New_York DST transitions (2024-03-10 07:00Z spring-forward,
# 2024-11-03 06:00Z fall-back), minted from customer keys.
_OFF = "(c_custkey * 37) % 600"

_DST_ORACLE = f"""
WITH probes AS (
  SELECT 'spring' AS anchor,
         TIMESTAMP '2024-03-10 02:00:00' + ({_OFF}) * INTERVAL 1 MINUTE AS ts_utc
  FROM customer
  UNION ALL
  SELECT 'fall',
         TIMESTAMP '2024-11-03 01:00:00' + ({_OFF}) * INTERVAL 1 MINUTE
  FROM customer
),
conv AS (
  SELECT anchor, ts_utc,
         CAST(ts_utc AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'
              AS TIMESTAMP) AS ts_local
  FROM probes
)
SELECT anchor,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT hour(ts_local)) AS BIGINT) AS n_local_hours,
       CAST(COUNT(DISTINCT epoch_us(ts_utc) - epoch_us(ts_local)) AS BIGINT)
         AS n_offsets,
       CAST(SUM(epoch_us(ts_local) // 1000000) AS BIGINT) AS local_epoch_s
FROM conv GROUP BY anchor ORDER BY anchor
"""


@query("fn_timezone_dst_convert", "2.7 scalar functions", _DST_ORACLE)
def fn_timezone_dst_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC→zone conversion ACROSS both DST transitions, engine-exact.

    The sync hazard that corrupts one hour of data twice a year: probe
    fans span the 2024 America/New_York spring-forward (02:30 local
    never exists — the plan's local hours skip it) and fall-back (01:30
    local exists TWICE — two UTC instants map to one wall time, which is
    why wall-clock timestamps are NOT a key). Both engines resolve the
    IANA rules identically (probed: the skipped hour and the ambiguous
    fold agree); n_offsets = 2 per anchor pins that each fan really
    crosses a transition, and the exact epoch sum would expose any
    one-hour drift on any row.

    Operationally: store UTC (the parquet convention this repo pins),
    convert at the EDGE for display/bucketing — `from_utc_timestamp` is
    map-side codegen, but a local-midnight day-bucket is 23 or 25 hours
    wide on transition days, which is exactly what this census makes
    visible.

    Scale shape: map-side conversion + a tiny keyed census."""
    c = load(spark, sf_dir, "customer")
    off = F.expr(_OFF)

    def fan(anchor: str, base: str) -> DataFrame:
        return c.select(
            F.lit(anchor).alias("anchor"),
            F.expr(f"TIMESTAMP '{base}' + make_dt_interval(0, 0, {_OFF}, 0)").alias(
                "ts_utc"
            ),
        )

    probes = fan("spring", "2024-03-10 02:00:00").unionByName(
        fan("fall", "2024-11-03 01:00:00")
    )
    conv = probes.select(
        "anchor",
        "ts_utc",
        F.from_utc_timestamp("ts_utc", "America/New_York").alias("ts_local"),
    )
    return (
        conv.groupBy("anchor")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.hour("ts_local")).alias("n_local_hours"),
            F.countDistinct(
                F.unix_micros("ts_utc") - F.unix_micros("ts_local")
            ).alias("n_offsets"),
            F.sum(F.expr("unix_micros(ts_local) div 1000000")).alias(
                "local_epoch_s"
            ),
        )
        .orderBy("anchor")
    )
