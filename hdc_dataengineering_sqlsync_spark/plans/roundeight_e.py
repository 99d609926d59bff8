"""SURVEY.md §2 round-8 batch E: feature-store PIT join, largest-remainder
budget apportionment, Western-Electric SPC rules.

  join_pit_multi_asof        multi-source point-in-time join, one window
  mix_budget_apportion_lr    Hamilton apportionment of a token budget
  ts_spc_western_electric    control-chart rule census, exact integers

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------------- 2.3 joins: feature-store point-in-time multi-join

_PIT_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, event_type, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
p AS (
  SELECT user_id, event_id, ts,
         (SELECT c.cents FROM ev c
          WHERE c.user_id = p0.user_id AND c.event_type = 'click'
            AND c.ts < p0.ts AND c.cents IS NOT NULL
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_cents,
         (SELECT v.cents FROM ev v
          WHERE v.user_id = p0.user_id AND v.event_type = 'view'
            AND v.ts < p0.ts AND v.cents IS NOT NULL
          ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_cents
  FROM ev p0 WHERE p0.event_type = 'purchase'
)
SELECT CAST(user_id % 5 AS BIGINT) AS cohort,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN click_cents IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_click,
       CAST(sum(CASE WHEN view_cents IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_view,
       CAST(sum(CASE WHEN click_cents IS NOT NULL AND view_cents IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_both,
       CAST(sum(coalesce(click_cents, 0)) AS BIGINT) AS click_cents_sum,
       CAST(sum(coalesce(view_cents, 0)) AS BIGINT) AS view_cents_sum
FROM p GROUP BY user_id % 5 ORDER BY cohort
"""


@query("join_pit_multi_asof", "2.3 joins", _PIT_ORACLE)
def join_pit_multi_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store POINT-IN-TIME join: every purchase (the training
    spine) is enriched with the latest STRICTLY-EARLIER value from TWO
    independent feature streams (clicks, views) — the no-future-leakage
    join every ML feature platform ships as a primitive. All three
    streams interleave in ONE union + ONE per-user window pass: purchases
    sort FIRST among equal timestamps (sort_kind 0) so a feature at
    exactly the spine timestamp is invisible — the strict < the leakage
    rule requires — and each feature column is an ignore-nulls last()
    carry. The oracle uses a completely different idiom (two correlated
    ORDER BY/LIMIT 1 subqueries per purchase), which is what makes the
    match a real check. Census per user cohort.

    Scale shape: one shuffle total (the per-user window), regardless of
    how many feature streams interleave — the union trick turns K as-of
    joins into K ignore-nulls carries in the same sorted pass. The
    K-join alternative costs K shuffles and K interval-join hazards."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    # feature rows must carry a value: a NULL-valued click would be
    # SKIPPED by the ignore-nulls carry but RETURNED by the oracle's
    # ORDER BY/LIMIT-1 idiom — pin the semantics to "latest prior
    # non-null feature value" on both sides
    tagged = ev.where(
        (F.col("event_type") == "purchase")
        | (F.col("event_type").isin("click", "view") & F.col("cents").isNotNull())
    ).select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        "event_type",
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type") == "click", 1)
        .otherwise(2)
        .alias("sort_kind"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "sort_kind", "event_id")
    carried = tagged.withColumn(
        "click_cents",
        F.last(F.when(F.col("event_type") == "click", F.col("cents")), ignorenulls=True).over(w),
    ).withColumn(
        "view_cents",
        F.last(F.when(F.col("event_type") == "view", F.col("cents")), ignorenulls=True).over(w),
    )
    p = carried.where(F.col("event_type") == "purchase")
    return (
        p.groupBy((F.col("user_id") % 5).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.when(F.col("click_cents").isNotNull(), 1).otherwise(0)).alias("n_with_click"),
            F.sum(F.when(F.col("view_cents").isNotNull(), 1).otherwise(0)).alias("n_with_view"),
            F.sum(
                F.when(
                    F.col("click_cents").isNotNull() & F.col("view_cents").isNotNull(), 1
                ).otherwise(0)
            ).alias("n_with_both"),
            F.sum(F.coalesce(F.col("click_cents"), F.lit(0))).alias("click_cents_sum"),
            F.sum(F.coalesce(F.col("view_cents"), F.lit(0))).alias("view_cents_sum"),
        )
        .orderBy("cohort")
    )


# ------------- 2.9 llm-data: largest-remainder token-budget apportionment

_APPORTION_BUDGET = 1_000_000

_APPORTION_ORACLE = f"""
WITH src AS (
  SELECT source, sum(len(string_split(text, ' '))) AS tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(tokens) AS w FROM src),
quota AS (
  SELECT s.source, s.tokens,
         ({_APPORTION_BUDGET} * s.tokens) // t.w AS floor_q,
         ({_APPORTION_BUDGET} * s.tokens) % t.w AS rem
  FROM src s, tot t
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
         {_APPORTION_BUDGET} - sum(floor_q) OVER () AS leftover
  FROM quota
)
SELECT source,
       CAST(tokens AS BIGINT) AS tokens,
       CAST(floor_q AS BIGINT) AS quota_floor,
       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(floor_q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS allocation
FROM ranked ORDER BY source
"""


@query("mix_budget_apportion_lr", "2.9 llm-data", _APPORTION_ORACLE)
def mix_budget_apportion_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed epoch token
    budget across sources — the integer allocation step every mixture
    plan needs after weights are chosen: quotas B*w_i/W floor-divided,
    the leftover handed to the largest remainders (source-name
    tie-break). Entirely exact integer arithmetic, so the allocation sums
    to the budget EXACTLY — the property float-rounded allocations break
    and training pipelines then paper over with a fudge shard.

    Scale shape: token counts reduce map-side to the source grain
    (#sources rows); the apportionment runs on that tiny table with one
    global window. At 100 TB only the count scan grows."""
    src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split(F.col("text"), " "))).alias("tokens"))
    )
    tot = src.agg(F.sum("tokens").alias("w"))
    quota = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        # SQL DIV: true integer division — a double `/` could round UP
        # across an integer boundary and break sum(allocation) == budget.
        # The product widens to decimal(38,0): at real corpus sizes
        # (>9.2e12 tokens in one source) B * tokens overflows int64; the
        # DIV result itself is <= the budget, so it always fits a long.
        F.expr(
            f"(CAST({_APPORTION_BUDGET} AS DECIMAL(38,0)) * tokens) DIV CAST(w AS DECIMAL(38,0))"
        ).alias("floor_q"),
        F.expr(
            f"CAST((CAST({_APPORTION_BUDGET} AS DECIMAL(38,0)) * tokens) % CAST(w AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("rem"),
    )
    wr = Window.orderBy(F.desc("rem"), F.asc("source"))
    wall = Window.partitionBy()
    ranked = quota.withColumn("rk", F.row_number().over(wr)).withColumn(
        "leftover", F.lit(_APPORTION_BUDGET) - F.sum("floor_q").over(wall)
    )
    return ranked.select(
        "source",
        F.col("tokens").cast("long").alias("tokens"),
        F.col("floor_q").cast("long").alias("quota_floor"),
        F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0).cast("long").alias("extra"),
        (
            F.col("floor_q") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).cast("long").alias("allocation"),
    ).orderBy("source")


# ----------------- 2.10 time series: Western-Electric SPC rule census

_SPC_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
),
tot AS (
  SELECT count(*) AS n, sum(cents) AS s,
         sum(CAST(cents AS HUGEINT) * cents) AS q
  FROM daily
),
flags AS (
  SELECT d.day,
         CAST(t.n AS HUGEINT) * d.cents - t.s AS dev,
         CAST(t.n AS HUGEINT) * t.q - CAST(t.s AS HUGEINT) * t.s AS nvar
  FROM daily d, tot t
),
marked AS (
  SELECT day,
         CASE WHEN dev * dev > 9 * nvar THEN 1 ELSE 0 END AS r1,
         CASE WHEN dev > 0 AND dev * dev > 4 * nvar THEN 1 ELSE 0 END AS hi2,
         CASE WHEN dev < 0 AND dev * dev > 4 * nvar THEN 1 ELSE 0 END AS lo2
  FROM flags
),
runs AS (
  SELECT day, r1,
         CASE WHEN sum(hi2) OVER w3 >= 2 THEN 1 ELSE 0 END AS r2_hi,
         CASE WHEN sum(lo2) OVER w3 >= 2 THEN 1 ELSE 0 END AS r2_lo
  FROM marked
  WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
)
SELECT CAST(month(day) AS INT) AS month,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(r1) AS BIGINT) AS rule1,
       CAST(sum(r2_hi) AS BIGINT) AS rule2_hi,
       CAST(sum(r2_lo) AS BIGINT) AS rule2_lo
FROM runs GROUP BY month(day) ORDER BY month
"""


@query("ts_spc_western_electric", "2.10 streaming/time series", _SPC_ORACLE)
def ts_spc_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western-Electric control-chart rules over the 1995 daily revenue
    series — the SPC screen monitoring dashboards run: rule 1 (a point
    beyond 3 sigma) and rule 2 (>= 2 of the trailing 3 points beyond
    2 sigma on the SAME side; census counts the window position, the
    standard batch formulation). The sigma compares never compute sigma:
    (x - mu)^2 > k^2 sigma^2 cross-multiplies to
    (n*x - S)^2 > k^2 (n*Q - S^2) in exact decimal(38,0)/HUGEINT
    integers — no float can flap a flag. Monthly rule census.

    Scale shape: the daily grain reduces map-side first; center/spread
    are one broadcast 1-row total; flags are map-side integer compares;
    the 3-day window runs on |days| rows. The same shape per series id
    at 100 TB (partitionBy(series))."""
    daily = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"))
    )
    dec = "decimal(38,0)"
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("q"),
    )
    flags = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("n").cast(dec) * F.col("cents") - F.col("s")).alias("dev"),
        (F.col("n").cast(dec) * F.col("q") - F.col("s").cast(dec) * F.col("s")).alias("nvar"),
    )
    marked = flags.select(
        "day",
        F.when(F.col("dev") * F.col("dev") > 9 * F.col("nvar"), 1).otherwise(0).alias("r1"),
        F.when(
            (F.col("dev") > 0) & (F.col("dev") * F.col("dev") > 4 * F.col("nvar")), 1
        ).otherwise(0).alias("hi2"),
        F.when(
            (F.col("dev") < 0) & (F.col("dev") * F.col("dev") > 4 * F.col("nvar")), 1
        ).otherwise(0).alias("lo2"),
    )
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    runs = marked.select(
        "day",
        "r1",
        F.when(F.sum("hi2").over(w3) >= 2, 1).otherwise(0).alias("r2_hi"),
        F.when(F.sum("lo2").over(w3) >= 2, 1).otherwise(0).alias("r2_lo"),
    )
    return (
        runs.groupBy(F.month("day").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("r1").alias("rule1"),
            F.sum("r2_hi").alias("rule2_hi"),
            F.sum("r2_lo").alias("rule2_lo"),
        )
        .orderBy("month")
    )
