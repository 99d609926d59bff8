"""SURVEY.md §2 round-9 batch Z: Cohen's d effect size, join fan-out
audit, out-of-order event-time audit.

  wl_cohens_d_effect     standardized mean difference, exact moments
  dq_join_fanout_audit   per-key fan-out histogram + explosion factor
  sync_out_of_order_audit  lateness census vs arrival order

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: Cohen's d / Hedges' g from exact moments

_COHEN_ORACLE = """
WITH vals AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS grp,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
),
mom AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
  FROM vals GROUP BY grp
),
wide AS (
  SELECT
    max(CASE WHEN grp = 'returned' THEN n END) AS n1,
    max(CASE WHEN grp = 'returned' THEN CAST(s1 AS DOUBLE) END) AS a1,
    max(CASE WHEN grp = 'returned' THEN CAST(s2 AS DOUBLE) END) AS b1,
    max(CASE WHEN grp = 'kept' THEN n END) AS n2,
    max(CASE WHEN grp = 'kept' THEN CAST(s1 AS DOUBLE) END) AS a2,
    max(CASE WHEN grp = 'kept' THEN CAST(s2 AS DOUBLE) END) AS b2
  FROM mom
)
SELECT n1, n2,
       round((a1 / n1 - a2 / n2)
             / sqrt(((b1 - a1 * a1 / n1) + (b2 - a2 * a2 / n2))
                    / (n1 + n2 - 2)), 4) AS cohens_d,
       round(((a1 / n1 - a2 / n2)
              / sqrt(((b1 - a1 * a1 / n1) + (b2 - a2 * a2 / n2))
                     / (n1 + n2 - 2)))
             * (1 - 3.0 / (4.0 * (n1 + n2 - 2) - 1)), 4) AS hedges_g
FROM wide
"""


@query("wl_cohens_d_effect", "2.12 composite workloads", _COHEN_ORACLE)
def wl_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g — the effect-size pair every honest A/B
    or cohort comparison reports NEXT TO the p-value (wl_ttest_welch
    says 'different'; d says 'by how much, in pooled-SD units'; g is
    the small-sample bias correction 1 − 3/(4df−1)). Group moments
    (n, Σx, Σx²) accumulate as exact wide integers over price cents —
    Σx² crosses int64 fast — and both statistics close in ONE shared
    float expression from those integers, rounded 4dp.

    Scale shape: one map-combinable 3-moment keyed agg to 2 rows, then
    a 2-row pivot and scalar math — one fact pass at any volume."""
    vals = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("R", "N"))
        .select(
            F.when(F.col("l_returnflag") == "R", "returned")
            .otherwise("kept")
            .alias("grp"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("x"),
        )
    )
    xd = F.col("x").cast("decimal(38,0)")
    mom = vals.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s1"),
        F.sum(xd * xd).alias("s2"),
    )
    wide = mom.agg(
        F.max(F.when(F.col("grp") == "returned", F.col("n"))).alias("n1"),
        F.max(
            F.when(F.col("grp") == "returned", F.col("s1").cast("double"))
        ).alias("a1"),
        F.max(
            F.when(F.col("grp") == "returned", F.col("s2").cast("double"))
        ).alias("b1"),
        F.max(F.when(F.col("grp") == "kept", F.col("n"))).alias("n2"),
        F.max(
            F.when(F.col("grp") == "kept", F.col("s1").cast("double"))
        ).alias("a2"),
        F.max(
            F.when(F.col("grp") == "kept", F.col("s2").cast("double"))
        ).alias("b2"),
    )
    d = (F.col("a1") / F.col("n1") - F.col("a2") / F.col("n2")) / F.sqrt(
        (
            (F.col("b1") - F.col("a1") * F.col("a1") / F.col("n1"))
            + (F.col("b2") - F.col("a2") * F.col("a2") / F.col("n2"))
        )
        / (F.col("n1") + F.col("n2") - 2)
    )
    return wide.select(
        "n1",
        "n2",
        F.round(d, 4).alias("cohens_d"),
        F.round(
            d
            * (
                1
                - 3.0 / (4.0 * (F.col("n1") + F.col("n2") - 2) - 1)
            ),
            4,
        ).alias("hedges_g"),
    )


# ------ 2.6 data quality: join fan-out audit (pre-join cardinality DQ)

_FANOUT_ORACLE = """
WITH fan AS (
  SELECT o.o_orderkey, CAST(count(l.l_orderkey) AS BIGINT) AS m
  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS keys_n,
         CAST(SUM(m) AS BIGINT) AS rows_n,
         CAST(max(m) AS BIGINT) AS max_fan
  FROM fan
)
SELECT CASE WHEN m = 0 THEN '0-orphan' WHEN m = 1 THEN '1'
            WHEN m <= 4 THEN '2-4' ELSE '5+' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(SUM(m) AS BIGINT) AS n_rows,
       CAST(max(t.max_fan) AS BIGINT) AS max_fanout,
       CAST(max(t.rows_n) * 10000 // max(t.keys_n) AS BIGINT)
         AS explosion_bps
FROM fan CROSS JOIN tot t
GROUP BY 1 ORDER BY bucket
"""


@query("dq_join_fanout_audit", "2.6 data quality", _FANOUT_ORACLE, bench=True)
def dq_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join fan-out audit — the pre-join DQ gate that prevents the
    100 TB accident (a key you believed 1:1 that is really 1:10⁴ turns
    a join into a cross product): per-key match counts bucketed
    (0-orphan / 1 / 2-4 / 5+), the max fan-out, and the overall
    explosion factor (output rows per input key) in exact bps. The
    LEFT join makes orphan keys (zero matches) first-class — the other
    half of referential-integrity auditing.

    Scale shape: ONE keyed count co-partitioned on the join key (the
    same shuffle the real join would pay — the audit is a dry run of
    its cost), then a 4-bucket census with a 1-row broadcast total."""
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    fan = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("m"))
    )
    tot = fan.agg(
        F.count(F.lit(1)).alias("keys_n"),
        F.sum("m").alias("rows_n"),
        F.max("m").alias("max_fan"),
    )
    bucket = (
        F.when(F.col("m") == 0, "0-orphan")
        .when(F.col("m") == 1, "1")
        .when(F.col("m") <= 4, "2-4")
        .otherwise("5+")
    )
    return (
        fan.crossJoin(F.broadcast(tot))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("m").alias("n_rows"),
            F.max("max_fan").alias("max_fanout"),
            F.expr("max(rows_n) * 10000 DIV max(keys_n)").alias(
                "explosion_bps"
            ),
        )
        .orderBy("bucket")
    )


# ---- 2.6 sync & dataops: out-of-order (lateness) audit vs arrival order

_OOO_ORACLE = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events WHERE user_id % 3 = 0
),
run AS (
  SELECT event_type, es,
         max(es) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS hwm
  FROM ev
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN es < hwm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN es < hwm THEN 1 ELSE 0 END) * 10000 // count(*)
            AS BIGINT) AS late_bps,
       CAST(COALESCE(max(CASE WHEN es < hwm THEN hwm - es END), 0)
            AS BIGINT) AS max_lateness_s
FROM run GROUP BY event_type ORDER BY event_type
"""


@query("sync_out_of_order_audit", "2.6 sync & dataops", _OOO_ORACLE)
def sync_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order audit — the measurement that SIZES a streaming
    watermark instead of guessing it: against per-user arrival order
    (event_id), how often does event time run backwards, and by how
    much? An event is late when its timestamp undercuts the user's
    running high-water mark (max over all PRIOR arrivals — strictly
    1-preceding, so the first arrival is never late); the census per
    event type gives the late rate in exact bps and the worst lateness
    in seconds — exactly the allowed-lateness bound a
    withWatermark() deployment needs.

    Scale shape: one window pass partitioned by user (partition-
    parallel, no global sort); the census folds map-side to the
    handful of event types."""
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") % 3 == 0)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.expr(
                "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 1000000)"
                " AS BIGINT)"
            ).alias("es"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = ev.select(
        "event_type", "es", F.max("es").over(w).alias("hwm")
    )
    late = F.when(F.col("es") < F.col("hwm"), 1).otherwise(0)
    return (
        run.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(late).alias("n_late"),
            F.expr(
                "SUM(CASE WHEN es < hwm THEN 1 ELSE 0 END) * 10000"
                " DIV count(*)"
            ).alias("late_bps"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("es") < F.col("hwm"),
                        F.col("hwm") - F.col("es"),
                    )
                ),
                F.lit(0),
            ).alias("max_lateness_s"),
        )
        .orderBy("event_type")
    )
