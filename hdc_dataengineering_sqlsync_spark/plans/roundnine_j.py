"""SURVEY.md §2 round-9 batch J: update-mode streaming emissions, rolling
OLS trend windows, length-bucketed batch packing for training pipelines.

  stream_update_mode_replay  update-mode sink over a throttled multi-batch
                             replay; final state reconstructed from emissions
  win_rolling_ols_slope      12-point rolling regression slope, exact moments
  mix_length_bucketed_batching  padding-waste accounting per length bucket

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.10 streaming: UPDATE-mode emissions over a throttled replay

_UPDATE_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_final
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def drain_update_emissions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage events as FOUR files (tagged by source path+mtime+size so a
    regenerated fixture or trailing-slash sf_dir never reuses a stale
    stage), replay with maxFilesPerTrigger=1 through an update-mode
    windowed count, and return the memory sink's raw EMISSION LOG (one
    row per per-key update per micro-batch). Shared by the qid and the
    multiple-emissions unit test so they cannot drift apart."""
    import os

    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        run_to_memory,
        staged_copy_dir,
    )

    stage = staged_copy_dir(sf_dir, "update_replay")
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        load(spark, sf_dir, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(stage)

    stream = (
        spark.readStream.schema(load(spark, sf_dir, "events").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    counts = (
        # the staged files are NOT time-ordered (repartition shuffles rows),
        # so a tight watermark would silently drop whole early windows once
        # batch 1 advances it — the classic backfill foot-gun. For a replay
        # the watermark must be sized past the horizon; state still bounds
        # (the backfill setting, cf. stream_backfill_throttled).
        stream.withWatermark("ts", "400 days")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    view, q = run_to_memory(counts, mode="update")
    q.stop()
    return spark.table(view)


@query("stream_update_mode_replay", "2.10 streaming", _UPDATE_ORACLE)
def stream_update_mode_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode, exercised for real: the events table is staged
    as FOUR files and replayed with maxFilesPerTrigger=1, so the same
    hour window is updated across several micro-batches and the memory
    sink accumulates one row PER EMISSION (complete mode re-emits
    everything; append mode emits once at watermark close — update is
    the third semantics, the one a key-value serving sink consumes). The
    final state is reconstructed from the emission log by per-key max —
    counts only grow — and must equal the batch census: a lost or
    double-applied update breaks the reconstruction.

    Scale shape: one stateful keyed agg, state bounded by live windows ×
    types; the emission log is sink-side. The per-key max rollup is
    map-side combinable."""
    return (
        drain_update_emissions(spark, sf_dir)
        .groupBy("window_start", "event_type")
        .agg(F.max("n").alias("n_final"))
        .orderBy("window_start", "event_type")
    )


# -------- 2.5 windows: rolling OLS slope from exact windowed moments

_ROLLING_OLS_ORACLE = """
WITH monthly AS (
  SELECT p.p_brand AS brand, date_trunc('month', l.l_shipdate) AS mon,
         SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
seq AS (
  SELECT brand, mon, CAST(y AS BIGINT) AS y,
         CAST(row_number() OVER (PARTITION BY brand ORDER BY mon) AS BIGINT)
           AS x
  FROM monthly
),
frames AS (
  SELECT brand, mon, x, y,
         count(*) OVER wf AS n,
         SUM(x) OVER wf AS sx,
         SUM(y) OVER wf AS sy,
         SUM(x * y) OVER wf AS sxy,
         SUM(x * x) OVER wf AS sxx
  FROM seq
  WINDOW wf AS (PARTITION BY brand ORDER BY x
                ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
)
SELECT brand, CAST(mon AS DATE) AS month,
       CAST((n * sxy - sx * sy) * 1000
            // (n * sxx - sx * sx) AS BIGINT) AS slope_millicents
FROM frames WHERE n = 12 ORDER BY brand, month
"""


@query("win_rolling_ols_slope", "2.5 windows", _ROLLING_OLS_ORACLE)
def win_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 12-month OLS trend slope per brand — the moving
    trend-detector dashboards overlay on every revenue series, computed
    the moment-sum way: the window collects Σx, Σy, Σxy, Σx² over the
    trailing 12 rows (x = the series' own month rank, so all moments are
    exact int64) and the slope closes in ONE integral division
    (n·Σxy−Σx·Σy)·1000 div (n·Σxx−Σx²) — trunc on both engines, negative
    slopes included. Distinct from `wl_price_trend_slope` (global slope
    per group) and `wl_ols_two_factor` (multi-feature, no window): this
    is regression AS A WINDOW.

    Scale shape: fact rows reduce map-side to (brand, month) cells; four
    moment sums share ONE window frame spec over the cell series (a
    single sort per brand partition); the emit-gate n=12 never needs a
    second pass."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("brand"))
    monthly = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("brand", F.date_trunc("month", "l_shipdate").alias("mon"))
        .agg(F.sum("cents").alias("y"))
    )
    seq = monthly.withColumn(
        "x",
        F.row_number().over(Window.partitionBy("brand").orderBy("mon")).cast("long"),
    )
    wf = Window.partitionBy("brand").orderBy("x").rowsBetween(-11, 0)
    frames = seq.select(
        "brand",
        "mon",
        "x",
        "y",
        F.count(F.lit(1)).over(wf).alias("n"),
        F.sum("x").over(wf).alias("sx"),
        F.sum("y").over(wf).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wf).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wf).alias("sxx"),
    )
    return (
        frames.where(F.col("n") == 12)
        .select(
            "brand",
            F.col("mon").cast("date").alias("month"),
            F.expr(
                "(n * sxy - sx * sy) * 1000 DIV (n * sxx - sx * sx)"
            ).alias("slope_millicents"),
        )
        .orderBy("brand", "month")
    )


# ----- 2.9 llm-data: length-bucketed batching (padding-waste audit)

_BATCHING_ORACLE = """
WITH d AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
         CAST(n_chars // 256 AS BIGINT) AS bucket
  FROM documents
),
batched AS (
  SELECT bucket, len,
         CAST((row_number() OVER (PARTITION BY bucket
                                  ORDER BY len, doc_id) - 1) // 32 AS BIGINT)
           AS batch_id
  FROM d
),
per_batch AS (
  SELECT bucket, batch_id, count(*) AS bn,
         MAX(len) AS bmax, SUM(len) AS btot
  FROM batched GROUP BY bucket, batch_id
)
SELECT bucket,
       CAST(SUM(bn) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(SUM(bmax * bn - btot) AS BIGINT) AS waste_chars,
       CAST(SUM(bmax * bn - btot) * 10000 // SUM(bmax * bn) AS BIGINT)
         AS waste_bps
FROM per_batch GROUP BY bucket ORDER BY bucket
"""


@query("mix_length_bucketed_batching", "2.9 llm-data", _BATCHING_ORACLE, bench=True)
def mix_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch packing — the padding-waste control every
    LLM training pipeline runs: documents bucket by length band (256
    chars), sort within the bucket, and group into fixed-size batches of
    32 whose cost is batch_max × batch_size tokens; the report is the
    padding overhead (Σ(max−len)) per bucket in exact chars and bps. The
    deterministic (len, doc_id) order makes batch assignment — and
    therefore the waste — bit-reproducible, which is what makes training
    runs comparable.

    Scale shape: ONE window (row_number) partitioned by bucket — the
    parallelism is the bucket count, and within-bucket sort is exactly
    the work the batcher must do anyway; both rollups are map-side
    combinable. ×10000 stays in HUGEINT (oracle) / widens via the sum
    magnitudes staying ≪ int64 (chars, not cents)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("len"),
        F.expr("CAST(n_chars DIV 256 AS BIGINT)").alias("bucket"),
    )
    batched = d.withColumn(
        "batch_id",
        F.expr(
            "CAST((row_number() OVER (PARTITION BY bucket"
            " ORDER BY len, doc_id) - 1) DIV 32 AS BIGINT)"
        ),
    )
    per_batch = batched.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("bn"),
        F.max("len").alias("bmax"),
        F.sum("len").alias("btot"),
    )
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.sum("bn").alias("n_docs"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum(F.col("bmax") * F.col("bn") - F.col("btot")).alias("waste_chars"),
            F.expr(
                "CAST(sum(bmax * bn - btot) * 10000"
                " DIV sum(bmax * bn) AS BIGINT)"
            ).alias("waste_bps"),
        )
        .orderBy("bucket")
    )
