"""SURVEY.md §2 round-9 batch AC: temporal interval coalescing, WIP-aging
discrete percentiles, exact-rational NPV.

  join_temporal_coalesce  merge overlapping validity intervals per key
  wl_wip_aging_percentiles  p50/p90 open-order age, integer thresholds
  wl_npv_exact_discount   NPV with exact 95^k/100^k rational factors

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.3 joins/temporal: coalesce overlapping intervals per key

_COALESCE_ORACLE = """
WITH ship AS (
  SELECT l_orderkey AS k, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
),
iv AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey AS ck,
         o.o_orderdate AS d0, s.ship AS d1
  FROM orders o
  JOIN ship s ON s.k = o.o_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE s.ship >= o.o_orderdate
),
marked AS (
  SELECT segment, ck, d0, d1,
         max(d1) OVER (PARTITION BY ck ORDER BY d0, d1
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_end
  FROM iv
),
islands AS (
  SELECT segment, ck, d0, d1,
         CAST(SUM(CASE WHEN prev_end IS NULL OR d0 > prev_end
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY ck ORDER BY d0, d1) AS BIGINT) AS isl
  FROM marked
),
merged AS (
  SELECT segment, ck, isl,
         CAST(count(*) AS BIGINT) AS n_in,
         date_diff('day', min(d0), max(d1)) + 1 AS span_days
  FROM islands GROUP BY segment, ck, isl
)
SELECT segment,
       CAST(SUM(n_in) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_merged,
       CAST(SUM(span_days) AS BIGINT) AS covered_days,
       CAST(count(*) * 10000 // SUM(n_in) AS BIGINT) AS merged_ratio_bps
FROM merged GROUP BY segment ORDER BY segment
"""


@query("join_temporal_coalesce", "2.3 joins", _COALESCE_ORACLE)
def join_temporal_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal interval coalescing — the normalization every
    temporal-database pipeline performs before storing validity periods
    (SCD compaction, coverage computation, downtime accounting): per
    customer, overlapping order lifespans merge into maximal disjoint
    intervals via the classic gap-and-island device — an interval
    starts a new island iff its start exceeds the running max end of
    all PRIOR intervals (strictly-1-preceding frame; duplicate
    intervals fold into the island deterministically regardless of tie
    order). Census per segment: input intervals, merged islands,
    exactly-covered days, and the compaction ratio in integer bps.

    Scale shape: intervals from one orderkey-keyed agg; BOTH window
    passes partition by customer (partition-parallel, no global sort);
    the double census folds map-side."""
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.max("l_shipdate").alias("ship"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    iv = (
        o.join(ship, o.o_orderkey == ship.k)
        .join(c, o.o_custkey == c.c_custkey)
        .where(F.col("ship") >= F.col("o_orderdate"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("d0"),
            F.col("ship").alias("d1"),
        )
    )
    w_prev = (
        Window.partitionBy("ck")
        .orderBy("d0", "d1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "segment", "ck", "d0", "d1", F.max("d1").over(w_prev).alias("prev_end")
    )
    w_run = (
        Window.partitionBy("ck")
        .orderBy("d0", "d1")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.select(
        "segment",
        "ck",
        "d0",
        "d1",
        F.sum(
            F.when(
                F.col("prev_end").isNull() | (F.col("d0") > F.col("prev_end")),
                1,
            ).otherwise(0)
        )
        .over(w_run)
        .alias("isl"),
    )
    merged = islands.groupBy("segment", "ck", "isl").agg(
        F.count(F.lit(1)).alias("n_in"),
        (F.datediff(F.max("d1"), F.min("d0")) + 1).alias("span_days"),
    )
    return (
        merged.groupBy("segment")
        .agg(
            F.sum("n_in").alias("n_intervals"),
            F.count(F.lit(1)).alias("n_merged"),
            F.sum("span_days").alias("covered_days"),
            F.expr("count(*) * 10000 DIV SUM(n_in)").alias(
                "merged_ratio_bps"
            ),
        )
        .orderBy("segment")
    )


# ------ 2.12 composite: WIP aging percentiles (discrete, all-integer)

_WIP_ORACLE = """
WITH ship AS (
  SELECT l_orderkey AS k, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
),
age AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate, DATE '1997-01-01') AS a
  FROM orders o JOIN ship s ON s.k = o.o_orderkey
  WHERE o.o_orderdate < DATE '1997-01-01' AND s.ship > DATE '1997-01-01'
),
census AS (
  SELECT priority, a, CAST(count(*) AS BIGINT) AS t
  FROM age GROUP BY priority, a
),
ranked AS (
  SELECT priority, a, t,
         CAST(SUM(t) OVER (PARTITION BY priority ORDER BY a) AS BIGINT)
           AS cum,
         CAST(SUM(t) OVER (PARTITION BY priority) AS BIGINT) AS n
  FROM census
)
SELECT priority,
       CAST(max(n) AS BIGINT) AS n_open,
       CAST(min(CASE WHEN 100 * cum >= 50 * n THEN a END) AS BIGINT)
         AS p50_age_days,
       CAST(min(CASE WHEN 100 * cum >= 90 * n THEN a END) AS BIGINT)
         AS p90_age_days,
       CAST(max(a) AS BIGINT) AS max_age_days
FROM ranked GROUP BY priority ORDER BY priority
"""


@query("wl_wip_aging_percentiles", "2.12 composite workloads", _WIP_ORACLE)
def wl_wip_aging_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIP aging percentiles — the ops-review question 'how old is the
    median open order, and the oldest decile?' at a snapshot date, per
    priority: discrete (type-1) quantiles on the integer age census
    with the pure-integer threshold `100·cum ≥ k·n` (the
    agg_percentile_disc device — the answer IS a data value, no
    interpolation, no float anywhere, so cross-engine equality is by
    construction).

    Scale shape: the open-order filter pushes both snapshot predicates
    to the scans; ages reduce map-side to (priority, day) cells; the
    cumulative pass runs over cells, never rows."""
    snap = F.lit("1997-01-01").cast("date")
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.max("l_shipdate").alias("ship"))
    )
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < snap)
    age = (
        o.join(ship, o.o_orderkey == ship.k)
        .where(F.col("ship") > snap)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(snap, "o_orderdate").alias("a"),
        )
    )
    census = age.groupBy("priority", "a").agg(F.count(F.lit(1)).alias("t"))
    wp = Window.partitionBy("priority")
    wc = wp.orderBy("a").rowsBetween(Window.unboundedPreceding, 0)
    ranked = census.select(
        "priority",
        "a",
        F.sum("t").over(wc).alias("cum"),
        F.sum("t").over(wp).alias("n"),
    )
    return (
        ranked.groupBy("priority")
        .agg(
            F.max("n").alias("n_open"),
            F.min(
                F.when(100 * F.col("cum") >= 50 * F.col("n"), F.col("a"))
            ).alias("p50_age_days"),
            F.min(
                F.when(100 * F.col("cum") >= 90 * F.col("n"), F.col("a"))
            ).alias("p90_age_days"),
            F.max("a").alias("max_age_days"),
        )
        .orderBy("priority")
    )


# ------ 2.12 composite: NPV with exact rational discount factors

# 5%-per-quarter discounting as exact integers: factor k = 95^k / 100^k,
# both precomputed as int64 literals (95^7 ≈ 7e13 fits easily); each
# term rev·95^k DIV 100^k floors per quarter (documented), and all
# wide products ride DECIMAL(38,0)/HUGEINT.
_NPV_FACTORS = [(k, 95**k, 100**k) for k in range(8)]

_NPV_FACTOR_SQL = ", ".join(f"({k}, {n}, {d})" for k, n, d in _NPV_FACTORS)

_NPV_ORACLE = f"""
WITH q AS (
  SELECT c.c_mktsegment AS segment,
         (year(o.o_orderdate) - 1995) * 4 + quarter(o.o_orderdate) - 1
           AS k,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE year(o.o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2
),
f(k, num, den) AS (VALUES {_NPV_FACTOR_SQL})
SELECT q.segment,
       CAST(SUM(q.cents) AS BIGINT) AS nominal_cents,
       CAST(SUM(CAST(q.cents AS HUGEINT) * f.num // f.den) AS BIGINT)
         AS npv_cents,
       CAST((SUM(q.cents) - SUM(CAST(q.cents AS HUGEINT) * f.num // f.den))
            * 10000 // SUM(q.cents) AS BIGINT) AS discount_drag_bps
FROM q JOIN f ON f.k = q.k
GROUP BY q.segment ORDER BY segment
"""


@query("wl_npv_exact_discount", "2.12 composite workloads", _NPV_ORACLE)
def wl_npv_exact_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NPV with EXACT rational discounting — 5%/quarter over the
    1995–96 revenue stream, each factor carried as the integer pair
    (95^k, 100^k) so every discounted term is one integral division
    (floored per quarter, the way a rate table is applied) and the NPV
    reconciles bit-for-bit across engines — float pow(0.95, k) drifts
    and compounds. The drag (nominal − NPV, in bps of nominal) is the
    number treasury actually quotes.

    Scale shape: quarter-grain keyed agg map-side; the 8-row factor
    table is a broadcast VALUES relation; per-segment fold to 5 rows."""
    q = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(1995, 1996))
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (
                (F.year("o_orderdate") - 1995) * 4
                + F.quarter("o_orderdate")
                - 1
            ).alias("k"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    f = spark.createDataFrame(_NPV_FACTORS, "k int, num long, den long")
    j = q.join(F.broadcast(f), "k")
    term = F.expr("CAST(cents AS DECIMAL(38,0)) * num DIV den")
    return (
        j.groupBy("segment")
        .agg(
            F.sum("cents").alias("nominal_cents"),
            F.sum(term).cast("long").alias("npv_cents"),
            F.expr(
                "CAST((SUM(cents) - SUM(CAST(cents AS DECIMAL(38,0)) * num"
                " DIV den)) * 10000 DIV SUM(cents) AS BIGINT)"
            ).alias("discount_drag_bps"),
        )
        .orderBy("segment")
    )
