"""SURVEY.md §2 round-9 batch Q: OTIF service level, OUTER-explode
semantics, DuPont margin decomposition.

  wl_otif_service_level      on-time-in-full: ALL lines within SLA, monthly bps
  fn_explode_outer_semantics explode vs explode_outer on empty/null arrays
  wl_dupont_decomposition    margin × turnover × leverage, exact bps factors

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: OTIF (on-time-in-full) service level

_OTIF_ORACLE = """
WITH per_order AS (
  SELECT o.o_orderkey, date_trunc('month', o.o_orderdate) AS mon,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
         CAST(SUM(CASE WHEN l.l_quantity >= 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_in_full
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT CAST(mon AS DATE) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN n_on_time = n_lines THEN 1 ELSE 0 END) AS BIGINT)
         AS n_on_time_full,
       CAST(SUM(CASE WHEN n_on_time = n_lines AND n_in_full = n_lines
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_otif,
       CAST(SUM(CASE WHEN n_on_time = n_lines AND n_in_full = n_lines
                     THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
         AS otif_bps
FROM per_order GROUP BY mon ORDER BY month
"""


@query("wl_otif_service_level", "2.12 composite workloads", _OTIF_ORACLE)
def wl_otif_service_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTIF — on-time-in-full, the contractual service-level KPI retail
    buyers fine suppliers on: an order counts ONLY if EVERY line ships
    within the 30-day SLA (on-time) AND every line meets the fill
    threshold (in-full) — an ALL-quantified census, which is why it
    cannot be approximated from line-level rates (a 99% line fill rate
    can be a 70% OTIF). Per order-month in exact integer bps.

    Scale shape: the ALL-quantifier folds into ONE keyed aggregate per
    order (count == conditional count — no per-line flags survive the
    first rollup), then a month census; both map-side combinable, one
    orderkey-keyed join co-partitioned with the fact."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(
                    F.col("l_shipdate") <= F.date_add("o_orderdate", 30), 1
                ).otherwise(0)
            ).alias("n_on_time"),
            F.sum(F.when(F.col("l_quantity") >= 10, 1).otherwise(0)).alias(
                "n_in_full"
            ),
        )
    )
    otif = (F.col("n_on_time") == F.col("n_lines")) & (
        F.col("n_in_full") == F.col("n_lines")
    )
    return (
        per_order.groupBy(F.col("mon").cast("date").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("n_on_time") == F.col("n_lines"), 1).otherwise(0)
            ).alias("n_on_time_full"),
            F.sum(F.when(otif, 1).otherwise(0)).alias("n_otif"),
            F.expr(
                "sum(CASE WHEN n_on_time = n_lines AND n_in_full = n_lines"
                " THEN 1 ELSE 0 END) * 10000 DIV count(*)"
            ).alias("otif_bps"),
        )
        .orderBy("month")
    )


# ---- 2.7 scalar functions: explode vs explode_outer on empty arrays

_EXPLODE_OUTER_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 3 = 0 THEN []
              WHEN o_orderkey % 3 = 1 THEN NULL
              ELSE [o_orderkey % 7, o_orderkey % 5] END AS arr
  FROM orders WHERE o_orderkey <= 500
),
inner_x AS (
  SELECT k, unnest(arr) AS v FROM src
),
outer_x AS (
  SELECT s.k, CASE WHEN len(s.arr) > 0 THEN i.v END AS v
  FROM src s LEFT JOIN inner_x i ON i.k = s.k
)
SELECT CAST((SELECT count(*) FROM inner_x) AS BIGINT) AS n_inner,
       CAST((SELECT count(*) FROM outer_x) AS BIGINT) AS n_outer,
       CAST((SELECT count(*) FROM outer_x WHERE v IS NULL) AS BIGINT)
         AS n_null_rows,
       CAST((SELECT coalesce(SUM(v), 0) FROM inner_x) AS BIGINT) AS sum_vals
"""


@query("fn_explode_outer_semantics", "2.7 scalar functions", _EXPLODE_OUTER_ORACLE)
def fn_explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explode vs explode_outer contract, pinned: `explode` DROPS
    rows whose array is empty or NULL; `explode_outer` keeps them as one
    null-valued row — the LEFT-JOIN-like semantics every flattening
    pipeline silently depends on (dropping a parent row because its
    detail list is empty is the classic lost-orders bug). The census
    (inner count, outer count, null-preserved rows, value sum) proves
    both paths over a three-way empty/NULL/populated fixture. DuckDB has
    no unnest-outer, so the oracle reconstructs outer semantics with a
    LEFT JOIN against the inner unnest — the rewrite itself documents
    what explode_outer does.

    Scale shape: generation + both explodes are map-side (Generate
    nodes); four scalar counts in one pass each."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 500)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.col("o_orderkey") % 3 == 0, F.array().cast("array<bigint>")
            )
            .when(F.col("o_orderkey") % 3 == 1, F.lit(None).cast("array<bigint>"))
            .otherwise(
                F.array(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5)
            )
            .alias("arr"),
        )
    )
    inner = src.select("k", F.explode("arr").alias("v"))
    outer = src.select("k", F.explode_outer("arr").alias("v"))
    return (
        inner.agg(
            F.count(F.lit(1)).alias("n_inner"),
            F.coalesce(F.sum("v"), F.lit(0)).cast("long").alias("sum_vals"),
        )
        .crossJoin(
            outer.agg(
                F.count(F.lit(1)).alias("n_outer"),
                F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias(
                    "n_null_rows"
                ),
            )
        )
        .select("n_inner", "n_outer", "n_null_rows", "sum_vals")
    )


# ------ 2.12 composite: DuPont decomposition (margin x turnover x leverage)

_DUPONT_ORACLE = """
WITH f AS (
  SELECT p.p_brand AS brand,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                             + 0.5) AS BIGINT)) AS HUGEINT) AS net,
         CAST(SUM(CAST(floor(l.l_extendedprice * l.l_discount * 100 + 0.5)
                       AS BIGINT)) AS HUGEINT) AS disc,
         CAST(SUM(CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT)) AS HUGEINT) AS assets
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
)
SELECT brand,
       CAST((net - disc) * 10000 // net AS BIGINT) AS margin_bps,
       CAST(net * 10000 // assets AS BIGINT) AS turnover_bps,
       CAST((net - disc) * 10000 // assets AS BIGINT) AS roa_bps
FROM f WHERE net > 0 AND assets > 0 ORDER BY brand
"""


@query("wl_dupont_decomposition", "2.12 composite workloads", _DUPONT_ORACLE)
def wl_dupont_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuPont decomposition — return-on-assets split into its two levers,
    profit margin (earnings/revenue) × asset turnover (revenue/assets),
    per brand: the factor analysis that says WHY a return moved (pricing
    vs utilization). Earnings = net revenue minus discounts given;
    assets = retail-valued inventory touched. Every factor is an exact
    integral division in bps from wide-integer sums — and the identity
    margin × turnover = ROA is checked by the consumer on the EXACT
    numbers, not float-rounded factors.

    Scale shape: ONE keyed aggregate over the broadcast-joined fact
    scan; three divisions on the ~25-row brand table."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_brand").alias("brand"),
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("unit_cents"),
    )
    f = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("brand")
        .agg(
            F.expr(
                "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100"
                " + 0.5) AS BIGINT)) AS DECIMAL(38,0))"
            ).alias("net"),
            F.expr(
                "CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)"
                " AS BIGINT)) AS DECIMAL(38,0))"
            ).alias("disc"),
            F.expr(
                "CAST(sum(unit_cents * CAST(l_quantity AS BIGINT))"
                " AS DECIMAL(38,0))"
            ).alias("assets"),
        )
    )
    return (
        f.where((F.col("net") > 0) & (F.col("assets") > 0))
        .select(
            "brand",
            F.expr("CAST((net - disc) * 10000 DIV net AS BIGINT)").alias(
                "margin_bps"
            ),
            F.expr("CAST(net * 10000 DIV assets AS BIGINT)").alias(
                "turnover_bps"
            ),
            F.expr("CAST((net - disc) * 10000 DIV assets AS BIGINT)").alias(
                "roa_bps"
            ),
        )
        .orderBy("brand")
    )
