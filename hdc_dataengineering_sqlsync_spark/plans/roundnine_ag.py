"""SURVEY.md §2 round-9 batch AG: batch session_window, forward as-of
join, bottom-k quantile sketch error.

  win_session_window_builtin  F.session_window in BATCH groupBy
  join_asof_next_event        forward-looking as-of (first event after)
  sketch_bottomk_quantile     hash bottom-k quantile vs exact, error bps

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.5 windows: the built-in session_window in BATCH mode

_SESSION_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events WHERE user_id % 11 = 5
),
g AS (
  SELECT user_id, es,
         -- Spark MERGES touching sessions (windows combine when next
         -- start <= current end = last + gap), so an event at EXACTLY
         -- last + gap stays in the session: new iff gap STRICTLY
         -- exceeded (found live at sf0.1 — one exact-1800s pair flips
         -- the census if this is >=)
         CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es)
                   > 1800 OR lag(es) OVER (PARTITION BY user_id
                                           ORDER BY es) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM ev
),
sess AS (
  SELECT user_id,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY es)
              AS BIGINT) AS sid,
         es
  FROM g
),
per_sess AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
         max(es) - min(es) AS dur_s
  FROM sess GROUP BY user_id, sid
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       CAST(SUM(dur_s) AS BIGINT) AS total_session_seconds
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


@query("win_session_window_builtin", "2.5 window functions", _SESSION_ORACLE)
def win_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN session_window in a plain batch groupBy — the same
    gap-merging semantics the streaming qids exercise, pinned on the
    batch path (session_window is not streaming-only, and the batch
    form is how backfills recompute what the stream produced): group by
    session_window(ts, '30 minutes') per user, then a per-user census
    that must equal the lag-based sessionization oracle — same session
    count, event totals, and summed in-session durations (Spark's
    window end is last-event + gap, so duration = window_end − gap −
    window_start at the second grain).

    Scale shape: session_window grouping is one keyed aggregation
    (hash shuffle on user + session assignment map-side within the
    sorted group); the census folds per user."""
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") % 11 == 5)
        .select(
            "user_id",
            F.expr(
                "timestamp_seconds(CAST(floor(unix_micros(CAST(ts AS"
                " TIMESTAMP)) / 1000000) AS BIGINT))"
            ).alias("tss"),
        )
    )
    per_sess = ev.groupBy(
        "user_id", F.session_window("tss", "30 minutes").alias("sw")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    dur = F.expr(
        "CAST(floor(unix_micros(sw.end) / 1000000) AS BIGINT)"
        " - 1800 - CAST(floor(unix_micros(sw.start) / 1000000) AS BIGINT)"
    )
    return (
        per_sess.select("user_id", "n_events", dur.alias("dur_s"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            F.sum("dur_s").alias("total_session_seconds"),
        )
        .orderBy("user_id")
    )


# ------ 2.3 joins: FORWARD as-of (first event at-or-after the probe)

_ASOF_FWD_ORACLE = """
WITH probes AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS pt
  FROM orders WHERE o_orderkey % 19 = 7 AND year(o_orderdate) = 1995
),
ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id
  FROM events
),
matched AS (
  SELECT p.k, p.ck,
         min(e.es) AS next_es
  FROM probes p LEFT JOIN ev e
    ON e.user_id = p.ck % 50 AND e.es >= p.pt % 100000 + 1704067200
  GROUP BY p.k, p.ck
)
SELECT CAST(count(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN next_es IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched,
       CAST(SUM(COALESCE(next_es, 0)) AS BIGINT) AS sum_next_es
FROM matched
"""


@query("join_asof_next_event", "2.3 joins", _ASOF_FWD_ORACLE)
def join_asof_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — 'the first event at-or-after each probe
    instant' (next heartbeat after a deploy, next trade after a quote):
    the mirror of join_asof_prior_event, completing the as-of family's
    direction coverage. Probe times map into the event stream's epoch
    range deterministically; unmatched probes (after the last event)
    surface as a counted null class, not dropped rows. The census
    (probe count, unmatched count, exact sum of matched next-event
    times) pins both the direction and the boundary (at-or-after, >=).

    Scale shape: expressed as a keyed min-aggregate over the
    range-filtered join (the relational form Catalyst optimizes freely);
    at scale the same semantics run as the bucketized range join the
    asof family documents — per-key event streams sorted once, probes
    merged in."""
    probes = (
        load(spark, sf_dir, "orders")
        .where((F.col("o_orderkey") % 19 == 7) & (F.year("o_orderdate") == 1995))
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.expr(
                "CAST(floor(unix_micros(CAST(o_orderdate AS TIMESTAMP))"
                " / 1000000) AS BIGINT)"
            ).alias("pt"),
        )
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 1000000)"
            " AS BIGINT)"
        ).alias("es"),
    )
    matched = (
        probes.join(
            ev,
            (ev.user_id == probes.ck % 50)
            & (ev.es >= probes.pt % 100000 + 1704067200),
            "left",
        )
        .groupBy("k", "ck")
        .agg(F.min("es").alias("next_es"))
    )
    return matched.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("next_es").isNull(), 1).otherwise(0)).alias(
            "n_unmatched"
        ),
        F.sum(F.coalesce("next_es", F.lit(0))).alias("sum_next_es"),
    )


# ---- 2.4 aggregations: bottom-k (KMV-style) quantile estimate vs exact

_BK_K = 256

_BK_ORACLE = f"""
WITH vals AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         (o_orderkey * 2654435761) % 4294967296 AS h
  FROM orders
),
sample_ AS (
  SELECT v FROM vals ORDER BY h, v LIMIT {_BK_K}
),
est AS (
  SELECT CAST(min(CASE WHEN 100 * rn >= 50 * {_BK_K} THEN v END) AS BIGINT)
    AS p50_est
  FROM (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM sample_)
),
exact AS (
  SELECT CAST(min(CASE WHEN 100 * cum >= 50 * n THEN v END) AS BIGINT)
    AS p50_exact
  FROM (
    SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
           CAST(SUM(c) OVER () AS BIGINT) AS n
    FROM (SELECT v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY v)
  )
)
SELECT {_BK_K} AS k, est.p50_est, exact.p50_exact,
       CAST(abs(est.p50_est - exact.p50_exact) * 10000 // exact.p50_exact
            AS BIGINT) AS err_bps
FROM est CROSS JOIN exact
"""


@query("sketch_bottomk_quantile", "2.4 aggregations", _BK_ORACLE)
def sketch_bottomk_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k quantile sketch, error-audited: keep the k=256 rows with
    the smallest DETERMINISTIC hash (the Knuth multiplier — a uniform
    but reproducible sample, where rand()-based reservoirs are not),
    read the sample's median with the integer threshold device, and
    report its error against the EXACT median in bps — the
    sketch-accuracy audit you run before trusting approximate quantiles
    on a 100 TB column. Everything is integer (hash order, thresholds,
    error), so the audit itself is bit-stable.

    Scale shape: the bottom-k is TakeOrdered (no global sort
    materialized); the exact side reduces to the distinct-value census
    first; one census row out."""
    vals = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("v"),
        ((F.col("o_orderkey") * 2654435761) % 4294967296).alias("h"),
    )
    sample = vals.orderBy("h", "v").limit(_BK_K).select("v")
    est = (
        sample.select(
            "v", F.row_number().over(Window.orderBy("v")).alias("rn")
        )
        .agg(
            F.min(
                F.when(100 * F.col("rn") >= 50 * _BK_K, F.col("v"))
            ).alias("p50_est")
        )
    )
    census = vals.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    exact = (
        census.select(
            "v",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(Window.partitionBy()).alias("n"),
        )
        .agg(
            F.min(
                F.when(100 * F.col("cum") >= 50 * F.col("n"), F.col("v"))
            ).alias("p50_exact")
        )
    )
    return est.crossJoin(exact).select(
        F.lit(_BK_K).alias("k"),
        "p50_est",
        "p50_exact",
        F.expr(
            "CAST(abs(p50_est - p50_exact) * 10000 DIV p50_exact AS BIGINT)"
        ).alias("err_bps"),
    )
