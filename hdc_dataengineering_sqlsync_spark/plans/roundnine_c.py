"""SURVEY.md §2 round-9 batch C: segment-migration matrix, windowed peak
prominence, stereo WAV channel balance.

  wl_segment_migration_matrix   spend-segment transitions between periods
  ts_peak_prominence            interior peaks with windowed prominence
  multimodal_audio_stereo_balance  stereo PCM decode + channel energy

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.registry import load

# ----------- 2.12 composite: customer spend-segment migration matrix

# fixed cent thresholds (probed at sf0.01: quartiles ~0.9e8/1.3e8/1.8e8,
# so both periods populate all three segments); customers absent from a
# period land in the 'none' segment, making new/churned visible
_SEG_SQL = (
    "CASE WHEN {c} < 90000000 THEN 'low' "
    "WHEN {c} < 150000000 THEN 'mid' ELSE 'high' END"
)

_MIGRATION_ORACLE = f"""
WITH p AS (
  SELECT o_custkey,
         CASE WHEN year(o_orderdate) < 1998 THEN 'early' ELSE 'late' END AS per,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
),
e AS (SELECT o_custkey, {_SEG_SQL.format(c="cents")} AS seg FROM p WHERE per = 'early'),
l AS (SELECT o_custkey, {_SEG_SQL.format(c="cents")} AS seg FROM p WHERE per = 'late')
SELECT coalesce(e.seg, 'none') AS seg_from,
       coalesce(l.seg, 'none') AS seg_to,
       CAST(count(*) AS BIGINT) AS n_customers
FROM e FULL OUTER JOIN l ON e.o_custkey = l.o_custkey
GROUP BY 1, 2 ORDER BY seg_from, seg_to
"""


@query("wl_segment_migration_matrix", "2.12 composite workloads", _MIGRATION_ORACLE)
def wl_segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-migration (transition) matrix — the retention-analytics
    view behind every 'customers moving down-market' dashboard: each
    customer's spend segment in an early and a late period, crossed into
    a from→to census; customers absent from one period surface as
    'none' (acquisition / churn rows), so the matrix is complete, not
    just the intersection. All arithmetic exact integer cents with fixed
    thresholds.

    Scale shape: ONE fact scan, ONE customer-keyed conditional aggregate
    (per-period sums as map-side-combinable CASE sums; a customer with no
    orders in a period gets a NULL sum → 'none'), then the 16-cell
    census. No join, no second scan — the plan-assertion test pins both.
    The full-outer-join formulation (two filtered aggregates re-joined)
    reads the fact table twice; this conditional-agg form is the one that
    survives a petabyte fact table."""
    o = load(spark, sf_dir, "orders")
    per_cust = (
        o.select(
            "o_custkey",
            F.when(F.year("o_orderdate") < 1998, "early").otherwise("late").alias("per"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("per") == "early", F.col("cents"))).alias("ce"),
            F.sum(F.when(F.col("per") == "late", F.col("cents"))).alias("cl"),
        )
    )
    seg_e = F.when(F.col("ce").isNull(), "none").otherwise(F.expr(_SEG_SQL.format(c="ce")))
    seg_l = F.when(F.col("cl").isNull(), "none").otherwise(F.expr(_SEG_SQL.format(c="cl")))
    return (
        per_cust.select(seg_e.alias("seg_from"), seg_l.alias("seg_to"))
        .groupBy("seg_from", "seg_to")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("seg_from", "seg_to")
    )


# --------------- 2.10 time series: windowed peak prominence (exact)

_PEAK_ORACLE = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS v
  FROM lineitem WHERE year(l_shipdate) = 1995
  GROUP BY 1
),
w AS (
  SELECT day, v,
         lag(v) OVER (ORDER BY day) AS pv,
         lead(v) OVER (ORDER BY day) AS nv,
         MIN(v) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
           AS lmin,
         MIN(v) OVER (ORDER BY day ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING)
           AS rmin,
         COUNT(*) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
           AS ln,
         COUNT(*) OVER (ORDER BY day ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING)
           AS rn
  FROM daily
)
SELECT day, CAST(v AS BIGINT) AS v_cents,
       CAST(v - greatest(lmin, rmin) AS BIGINT) AS prom_cents
FROM w
WHERE pv IS NOT NULL AND nv IS NOT NULL AND v > pv AND v > nv
  AND ln = 7 AND rn = 7
  AND v - greatest(lmin, rmin) >= 2000000
ORDER BY day
"""


@query("ts_peak_prominence", "2.10 streaming/time series", _PEAK_ORACLE)
def ts_peak_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection with WINDOWED prominence — the alerting primitive
    that separates 'a spike that matters' from daily jitter: a strict
    local maximum (beats both neighbors) whose height over the deeper of
    the two flanking 7-day valley floors clears a fixed threshold. This
    bounded-window variant of true path-based prominence is what a
    streaming monitor actually computes (full prominence needs the whole
    series; the window makes it incremental). Only interior peaks with
    FULL 7-day flanks qualify — the same frame-completeness rule in both
    engines, all exact integer cents.

    Scale shape: reduce to the daily grain map-side FIRST; the six
    window expressions (lag, lead, two mins, two frame counts) share ONE
    sort within the series partition (at 100 TB: partition by series id,
    as ts_bollinger_bands)."""
    li = load(spark, sf_dir, "lineitem")
    daily = (
        li.where(F.year("l_shipdate") == 1995)
        .select(
            F.col("l_shipdate").cast("date").alias("day"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("v"))
    )
    from pyspark.sql.window import Window

    order = Window.orderBy("day")
    lwin = order.rowsBetween(-7, -1)
    rwin = order.rowsBetween(1, 7)
    w = daily.select(
        "day",
        "v",
        F.lag("v").over(order).alias("pv"),
        F.lead("v").over(order).alias("nv"),
        F.min("v").over(lwin).alias("lmin"),
        F.min("v").over(rwin).alias("rmin"),
        F.count(F.lit(1)).over(lwin).alias("ln"),
        F.count(F.lit(1)).over(rwin).alias("rn"),
    )
    return (
        w.where(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("v") > F.col("pv"))
            & (F.col("v") > F.col("nv"))
            & (F.col("ln") == 7)
            & (F.col("rn") == 7)
            & (F.col("v") - F.greatest("lmin", "rmin") >= 2000000)
        )
        .select(
            "day",
            F.col("v").alias("v_cents"),
            (F.col("v") - F.greatest("lmin", "rmin")).alias("prom_cents"),
        )
        .orderBy("day")
    )


# -------- 2.9 llm-data: stereo WAV decode + channel-balance audit

_STEREO_SUBSET = "doc_id % 5 = 2"

_STEREO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy_l", T.LongType()),
        T.StructField("energy_r", T.LongType()),
        T.StructField("balance_bps", T.LongType()),
    ]
)

_STEREO_ORACLE = f"""
WITH m AS (SELECT doc_id, 64 + (doc_id % 4) * 32 AS n
           FROM documents WHERE {_STEREO_SUBSET}),
s AS (
  SELECT m.doc_id, m.n,
         (m.doc_id * 7 + i.i * 3) % 2001 - 1000 AS l,
         (m.doc_id * 11 + i.i * 5) % 2001 - 1000 AS r
  FROM m JOIN (SELECT unnest(range(0, 160)) AS i) i ON i.i < m.n
),
agg AS (
  SELECT doc_id, CAST(n AS INT) AS n_samples,
         CAST(SUM(l * l) AS BIGINT) AS energy_l,
         CAST(SUM(r * r) AS BIGINT) AS energy_r
  FROM s GROUP BY doc_id, n
)
SELECT doc_id AS media_id, n_samples, energy_l, energy_r,
       CAST(energy_l * 10000 // (energy_l + energy_r) AS BIGINT) AS balance_bps
FROM agg ORDER BY media_id
"""


@query("multimodal_audio_stereo_balance", "2.9 llm-data", _STEREO_ORACLE)
def multimodal_audio_stereo_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO audio decode, oracle-verified — the channel-interleave the
    mono qids never exercise: closed-form L/R int16 samples -> real
    2-channel RIFF bytes (encode_wav_stereo: frames L/R-interleaved per
    spec) -> decode_wav_stereo de-interleaves -> exact per-channel energy
    (Σs², int64) and the left-share balance in basis points — the
    channel-imbalance audit an audio-corpus pipeline runs to catch
    one-sided or swapped-channel recordings. A de-interleave bug swaps or
    mixes the energies and mismatches the oracle's closed form.

    Scale shape: encode+decode in ONE mapInPandas pass over repartitioned
    ids; payloads never shuffle — 4 scalar stats per clip leave the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            decode_wav_stereo,
            encode_wav_stereo,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                n = 64 + (m % 4) * 32
                i = np.arange(n, dtype=np.int64)
                left = ((m * 7 + i * 3) % 2001 - 1000).astype(np.int16)
                right = ((m * 11 + i * 5) % 2001 - 1000).astype(np.int16)
                blob = encode_wav_stereo(left, right)
                _, dl, dr = decode_wav_stereo(blob)
                el = int((dl.astype(np.int64) ** 2).sum())
                er = int((dr.astype(np.int64) ** 2).sum())
                rows.append((m, n, el, er, el * 10000 // (el + er)))
            yield pd.DataFrame(rows, columns=[f.name for f in _STEREO_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_STEREO_SUBSET)
    ids = docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    return sort_reduction(ids.mapInPandas(run, schema=_STEREO_SCHEMA), "media_id")
