"""SURVEY.md §2 round-9 batch M: attribute control chart (p-chart),
stream-static dimension enrichment, checkpoint-restart exactly-once.

  dq_pchart_proportions   monthly return-rate p-chart, 3σ limits in integers
  stream_static_dim_join_replay  streaming events ⋈ static dim, drained
  stream_checkpoint_restart_exactly_once  two-run checkpoint recovery proof

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.8 sync core: p-chart (proportion control chart), exact

# |r/n − R/N| > 3·√(p̄(1−p̄)/n) with p̄ = R/N, cross-multiplied by n²N² so
# the 3σ test is (r·N − n·R)² > 9·n·R·(N−R) — pure integers, no σ ever
# computed (the ts_spc_western_electric discipline, applied to the
# ATTRIBUTE chart family: proportions, not means).

_PCHART_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', l_shipdate) AS mon,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS r
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(r) AS BIGINT) AS rr
  FROM monthly
)
SELECT CAST(m.mon AS DATE) AS month, m.n, m.r,
       CAST(m.r * 10000 // m.n AS BIGINT) AS rate_bps,
       CAST(t.rr * 10000 // t.nn AS BIGINT) AS center_bps,
       CASE WHEN CAST(m.r AS HUGEINT) * t.nn - CAST(m.n AS HUGEINT) * t.rr < 0
                 AND (CAST(m.r AS HUGEINT) * t.nn - CAST(m.n AS HUGEINT) * t.rr)
                     * (CAST(m.r AS HUGEINT) * t.nn - CAST(m.n AS HUGEINT) * t.rr)
                     > 9 * CAST(m.n AS HUGEINT) * t.rr * (t.nn - t.rr)
            THEN 'below'
            WHEN (CAST(m.r AS HUGEINT) * t.nn - CAST(m.n AS HUGEINT) * t.rr)
                 * (CAST(m.r AS HUGEINT) * t.nn - CAST(m.n AS HUGEINT) * t.rr)
                 > 9 * CAST(m.n AS HUGEINT) * t.rr * (t.nn - t.rr)
            THEN 'above'
            ELSE 'in' END AS control
FROM monthly m CROSS JOIN tot t
ORDER BY month
"""


@query("dq_pchart_proportions", "2.8 sync core", _PCHART_ORACLE)
def dq_pchart_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart — the ATTRIBUTE control chart (proportions, where
    `ts_spc_western_electric` charts means): monthly return-rate vs
    binomial 3σ limits around the grand rate, with σ NEVER computed —
    the test |r/n − R/N| > 3√(p̄(1−p̄)/n) cross-multiplies to
    (r·N − n·R)² > 9·n·R·(N−R) in exact wide integers (HUGEINT /
    DECIMAL(38,0); the square stays ≲10²⁰ through 1000× fixture scale —
    past ~10¹⁹ total rows divide both sides by N² first, same exactness,
    documented not needed here). Out-of-control months are labeled
    above/below, the signal a data platform uses to page on return-rate
    drift.

    Scale shape: month-grain map-side reduction, a broadcast 1-row grand
    total, and per-cell integer compares — nothing scales past the
    month-cell table."""
    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(F.date_trunc("month", "l_shipdate").alias("mon")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("r"),
    )
    tot = monthly.agg(F.sum("n").alias("nn"), F.sum("r").alias("rr"))
    dev = "(CAST(r AS DECIMAL(38,0)) * nn - CAST(n AS DECIMAL(38,0)) * rr)"
    lim = "9 * CAST(n AS DECIMAL(38,0)) * rr * (nn - rr)"
    return (
        monthly.crossJoin(F.broadcast(tot))
        .select(
            F.col("mon").cast("date").alias("month"),
            "n",
            "r",
            F.expr("r * 10000 DIV n").alias("rate_bps"),
            F.expr("rr * 10000 DIV nn").alias("center_bps"),
            F.expr(
                f"CASE WHEN {dev} < 0 AND {dev} * {dev} > {lim} THEN 'below' "
                f"WHEN {dev} * {dev} > {lim} THEN 'above' ELSE 'in' END"
            ).alias("control"),
        )
        .orderBy("month")
    )


# ------ 2.10 streaming: stream-static dimension join (enrichment)

_STATIC_JOIN_ORACLE = """
SELECT c.c_mktsegment AS seg, e.event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events e JOIN customer c ON c.c_custkey = e.user_id % 1000 + 1
GROUP BY 1, 2 ORDER BY seg, event_type
"""


@query("stream_static_dim_join_replay", "2.10 streaming", _STATIC_JOIN_ORACLE)
def stream_static_dim_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join — the enrichment shape the stream-stream qids
    never exercise: a live readStream of events joins a STATIC customer
    dimension (user→customer via the fixture's modular mapping), then a
    streaming aggregation rolls up per (segment, type). Stream-static
    inner joins are stateless (each micro-batch probes the static side;
    no watermark, no join state) — the planner broadcasts the dim under
    every trigger, which is exactly how a 100-TB pipeline enriches
    events against a dimension snapshot without stateful join overhead.

    Scale shape: stateless per-batch broadcast probe + one stateful
    keyed agg whose state is the (segment × type) cell table."""
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        read_events_stream,
        run_to_memory,
    )

    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = read_events_stream(spark, events_path(sf_dir))
    enriched = stream.join(
        F.broadcast(dim),
        F.col("c_custkey") == F.col("user_id") % 1000 + 1,
    )
    counts = (
        enriched.groupBy(F.col("c_mktsegment").alias("seg"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    view, q = run_to_memory(counts, mode="complete")
    q.stop()
    return spark.table(view).orderBy("seg", "event_type")


# --- 2.10 streaming: checkpoint restart — exactly-once across two runs

_RESTART_ORACLE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


@query(
    "stream_checkpoint_restart_exactly_once", "2.10 streaming", _RESTART_ORACLE
)
def stream_checkpoint_restart_exactly_once(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint RECOVERY, proven end-to-end: the events table is staged
    as two halves; run 1 drains half A through a file-sink pipeline with
    a checkpointLocation, the query STOPS, half B lands in the source
    dir, and run 2 — same checkpoint — picks up ONLY the new files. The
    output dir then holds each event exactly once: the per-type census
    (count == distinct event_ids == batch oracle) breaks if the restart
    re-reads old files (duplicates) or loses offsets (gaps). This is the
    operational property every production stream relies on and no other
    streaming qid pins.

    Scale shape: pass-through file pipeline (no state); the proof rollup
    is one keyed agg over the sink."""
    import os
    import shutil

    from hdc_dataengineering_sqlsync_spark.streaming.jobs import staged_copy_dir

    # tagged by source path+mtime+size (staged_copy_dir): a regenerated
    # fixture or a same-basename different tree re-stages instead of
    # serving a stale checkpointed output (review-r9 finding)
    root = staged_copy_dir(sf_dir, "ckpt_restart")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    done = os.path.join(root, "_ALL_DONE")
    ev = load(spark, sf_dir, "events")

    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(src)
        halves = [
            ev.where(F.col("event_id") % 2 == i).coalesce(1) for i in (0, 1)
        ]

        def drain() -> None:
            q = (
                spark.readStream.schema(ev.schema)
                .parquet(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()

        for i, half in enumerate(halves):
            half.write.parquet(os.path.join(src, f"half_{i}"))
            # the file source needs flat files under src; move them up
            part_dir = os.path.join(src, f"half_{i}")
            for f in os.listdir(part_dir):
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(part_dir, f),
                        os.path.join(src, f"half_{i}_{f}"),
                    )
            shutil.rmtree(part_dir)
            drain()  # run 1 sees half 0; run 2 (fresh query, same ckpt) only half 1
        open(done, "w").write("ok\n")

    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_id").alias("n_distinct"),
        )
        .orderBy("event_type")
    )
