"""SURVEY.md §2 round-9 batch G: data-dependent newsvendor quantile,
3-itemset basket mining, and an exact-integer Holt linear-trend smoother.

  wl_newsvendor_quantile  optimal stock at the DATA-DEPENDENT critical fractile
  wl_basket_triples       3-itemset support (the apriori step plain pairs miss)
  ts_holt_linear          double exponential smoothing, integer recursion

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------- 2.12 composite: newsvendor stock level at the critical fractile

_NEWSVENDOR_ORACLE = """
WITH li AS (
  SELECT p.p_brand AS brand,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS gross,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS net
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
ratio AS (
  SELECT brand,
         CAST(SUM(net) * 10000 // SUM(gross) AS BIGINT) AS crit_bps,
         CAST(count(*) AS BIGINT) AS n
  FROM li GROUP BY brand
),
census AS (
  SELECT brand, qty, count(*) AS t FROM li GROUP BY 1, 2
),
ranked AS (
  SELECT brand, qty, sum(t) OVER (PARTITION BY brand ORDER BY qty) AS cum
  FROM census
)
SELECT r.brand, r.crit_bps, r.n AS n_orders,
       CAST(min(CASE WHEN 10000 * k.cum >= r.crit_bps * r.n THEN k.qty END)
            AS BIGINT) AS stock_qty
FROM ratio r JOIN ranked k ON k.brand = r.brand
GROUP BY r.brand, r.crit_bps, r.n
ORDER BY r.brand
"""


@query("wl_newsvendor_quantile", "2.12 composite workloads", _NEWSVENDOR_ORACLE)
def wl_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking level — the smallest demand quantity whose
    cumulative probability reaches the critical fractile, where the
    fractile itself is DATA-DEPENDENT (here the brand's net/gross revenue
    retention in integer bps, a stand-in for underage/(underage+overage)
    cost): the inventory-theory optimum that built-in percentile
    functions cannot express because their fraction must be a constant.
    The quantile test is `10000·cum ≥ crit_bps·n` — pure int64, no
    floating fraction anywhere.

    Scale shape: one fact×part equi-join feeds BOTH reductions — the
    per-brand ratio (map-side combinable) and the distinct-quantity
    census (≤50 rows per brand) — then the window and the fractile test
    run on cells; the ratio table is broadcast back. ×10000 stays inside
    HUGEINT in the oracle and int64 in Spark (cum ≤ n ≤ 1e12 rows ·
    10^4 < 2^63)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("gross"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
        )
        .cast("long")
        .alias("net"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("brand"))
    fact = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).drop(
        "l_partkey", "p_partkey"
    )
    ratio = fact.groupBy("brand").agg(
        # widen the *10000: Σnet is total-revenue-sized cents (the
        # mix_budget_apportion_lr overflow class); DECIMAL(38,0) DIV → long
        F.expr(
            "CAST(CAST(sum(net) AS DECIMAL(38,0)) * 10000 DIV sum(gross) AS BIGINT)"
        ).alias("crit_bps"),
        F.count(F.lit(1)).alias("n"),
    )
    census = fact.groupBy("brand", "qty").agg(F.count(F.lit(1)).alias("t"))
    ranked = census.select(
        "brand",
        "qty",
        F.sum("t")
        .over(
            Window.partitionBy("brand").orderBy("qty").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cum"),
    )
    return (
        ranked.join(F.broadcast(ratio), "brand")
        .groupBy("brand", "crit_bps", "n")
        .agg(
            F.min(
                F.when(
                    10000 * F.col("cum") >= F.col("crit_bps") * F.col("n"),
                    F.col("qty"),
                )
            ).alias("stock_qty")
        )
        .select(
            "brand", "crit_bps", F.col("n").alias("n_orders"), "stock_qty"
        )
        .orderBy("brand")
    )


# ---------- 2.12 composite: 3-itemset support (apriori's second step)

# The oracle enumerates triples positionally from each order's sorted
# basket list (i < j < unnest of the tail) rather than as a triple
# self-join: the join formulation is semantically identical but DuckDB
# plans the equality+inequality mix as an inequality join and takes ~250s
# at sf0.1 where this runs in <1s — the sweep harness runs every oracle
# at BOTH scales, so oracle plan shape matters too. The CTE prefix is
# SHARED with wl_rules_two_antecedent (roundnine_n) so a fix to the
# enumeration lands in both oracles at once.
BASKET_ENUM_CTES = """
WITH pairs AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
baskets AS (
  SELECT ok, list(b ORDER BY b) AS arr FROM pairs GROUP BY ok
),
idx AS (
  SELECT arr, unnest(range(1, len(arr) + 1)) AS i FROM baskets
),
ij AS (
  SELECT arr, i, unnest(range(i + 1, len(arr) + 1)) AS j FROM idx
),
tri AS (
  SELECT arr[i] AS b1, arr[j] AS b2, unnest(arr[j+1:]) AS b3
  FROM ij
)
"""

_TRIPLES_ORACLE = (
    BASKET_ENUM_CTES
    + """
SELECT b1 AS brand1, b2 AS brand2, b3 AS brand3,
       CAST(count(*) AS BIGINT) AS support
FROM tri GROUP BY 1, 2, 3
ORDER BY support DESC, brand1, brand2, brand3
LIMIT 15
"""
)


def brand_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, brand) basket set — the blocked-expansion input
    shared by the triple miner and the rule generator (roundnine_n)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("b"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), "b")
        .distinct()
    )


def triple_supports(basket: DataFrame) -> DataFrame:
    """Canonical b1<b2<b3 triple supports via two self equi-joins blocked
    on the basket's own order key (AQE reuses one shuffled exchange)."""
    a, c, d = basket.alias("a"), basket.alias("c"), basket.alias("d")
    return (
        a.join(c, (F.col("c.ok") == F.col("a.ok")) & (F.col("c.b") > F.col("a.b")))
        .join(d, (F.col("d.ok") == F.col("a.ok")) & (F.col("d.b") > F.col("c.b")))
        .groupBy(
            F.col("a.b").alias("b1"),
            F.col("c.b").alias("b2"),
            F.col("d.b").alias("b3"),
        )
        .agg(F.count(F.lit(1)).alias("c3"))
    )


@query("wl_basket_triples", "2.12 composite workloads", _TRIPLES_ORACLE, bench=True)
def wl_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-itemset support — how often each brand TRIPLE co-occurs in one
    order: the apriori step the pairwise baskets (`wl_basket_pairs`,
    `wl_basket_lift`) cannot see (a pair can be frequent while every
    triple containing it is rare). Canonical b1<b2<b3 ordering counts
    each triple exactly once.

    Scale shape: the expansion is blocked BY ORDER KEY — two self
    equi-joins on the basket's own key with `>` ordering predicates, so
    per-order work is C(k,3) over its distinct brands (k ≤ items per
    order, bounded), never a global all-triples cross; the distinct
    basket reduction is map-side combinable and the top-15 is a
    TakeOrdered, no global sort."""
    return (
        triple_supports(brand_baskets(spark, sf_dir))
        .select(
            F.col("b1").alias("brand1"),
            F.col("b2").alias("brand2"),
            F.col("b3").alias("brand3"),
            F.col("c3").alias("support"),
        )
        .orderBy(F.col("support").desc(), "brand1", "brand2", "brand3")
        .limit(15)
    )


# ------- 2.10 time series: Holt linear-trend double exponential smoothing

# Integer recursion, alpha = 2/10, beta = 1/10:
#   L_t = (2·x_t + 8·(L_{t-1} + B_{t-1})) div 10
#   B_t = ((L_t - L_{t-1}) + 9·B_{t-1})   div 10
# with L_1 = x_1, B_1 = 0 — div is trunc-toward-zero on BOTH engines
# (Spark DIV, DuckDB //, and the explicit trunc in the pandas loop), so
# the recursion is bit-exact cross-engine even when the trend goes
# negative. No closed form exists once each step floors, which is exactly
# why this qid exercises the applyInPandas sequential-state path.

_HOLT_ORACLE = """
WITH RECURSIVE monthly AS (
  SELECT l_returnflag AS flag, date_trunc('month', l_shipdate) AS mon,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS x
  FROM lineitem WHERE year(l_shipdate) IN (1994, 1995)
  GROUP BY 1, 2
),
seq AS (
  SELECT flag, CAST(x AS BIGINT) AS x,
         CAST(row_number() OVER (PARTITION BY flag ORDER BY mon) AS BIGINT) AS rn
  FROM monthly
),
r AS (
  SELECT flag, rn, CAST(x AS BIGINT) AS lvl, CAST(0 AS BIGINT) AS trend
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT flag, rn, lvl_new,
         CAST(((lvl_new - lvl_old) + 9 * trend_old) // 10 AS BIGINT)
  FROM (
    SELECT s.flag, s.rn,
           CAST((2 * s.x + 8 * (r.lvl + r.trend)) // 10 AS BIGINT) AS lvl_new,
           r.lvl AS lvl_old, r.trend AS trend_old
    FROM r JOIN seq s ON s.flag = r.flag AND s.rn = r.rn + 1
  )
),
last AS (
  SELECT flag, max(rn) AS n FROM r GROUP BY flag
)
SELECT r.flag,
       CAST(l.n AS BIGINT) AS n_months,
       CAST(r.lvl AS BIGINT) AS level_cents,
       CAST(r.trend AS BIGINT) AS trend_cents,
       CAST(r.lvl + r.trend AS BIGINT) AS forecast_next_cents
FROM r JOIN last l ON l.flag = r.flag AND r.rn = l.n
ORDER BY r.flag
"""

_HOLT_SCHEMA = T.StructType(
    [
        T.StructField("flag", T.StringType()),
        T.StructField("n_months", T.LongType()),
        T.StructField("level_cents", T.LongType()),
        T.StructField("trend_cents", T.LongType()),
        T.StructField("forecast_next_cents", T.LongType()),
    ]
)


def _holt_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("mon")
    xs = [int(v) for v in pdf["x"]]

    def tdiv(a: int, b: int) -> int:  # trunc toward zero, like Spark DIV
        q = abs(a) // b
        return q if a >= 0 else -q

    lvl, trend = xs[0], 0
    for x in xs[1:]:
        lvl_new = tdiv(2 * x + 8 * (lvl + trend), 10)
        trend = tdiv((lvl_new - lvl) + 9 * trend, 10)
        lvl = lvl_new
    return pd.DataFrame(
        {
            "flag": [pdf["flag"].iloc[0]],
            "n_months": [len(xs)],
            "level_cents": [lvl],
            "trend_cents": [trend],
            "forecast_next_cents": [lvl + trend],
        }
    )


@query("ts_holt_linear", "2.10 streaming/time series", _HOLT_ORACLE)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double) exponential smoothing — the level+trend
    smoother behind every short-horizon ops forecast, run as an EXACT
    integer recursion (α=0.2, β=0.1 as rational weights, trunc-division
    each step) over 24 monthly revenue points per returnflag. Because
    each step floors, no closed-form weight expansion exists (contrast
    `ts_ewma`'s positional-weight lambda) — this is inherently
    sequential per series, the canonical applyInPandas stateful shape;
    the oracle runs the identical recursion as a recursive CTE.

    Scale shape: the heavy lifting is the month-grain map-side reduction
    (fact rows → 72 cells); the recursion itself touches ≤24 points per
    series inside one Arrow batch, parallel ACROSS series — at 100 TB
    with millions of series this is one shuffle on the series key and an
    embarrassingly parallel per-group loop, never a driver collect."""
    li = load(spark, sf_dir, "lineitem")
    monthly = (
        li.where(F.year("l_shipdate").isin(1994, 1995))
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.date_trunc("month", "l_shipdate").alias("mon"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias(
                "x"
            )
        )
    )
    return (
        monthly.groupBy("flag")
        .applyInPandas(_holt_group, schema=_HOLT_SCHEMA)
        .orderBy("flag")
    )
