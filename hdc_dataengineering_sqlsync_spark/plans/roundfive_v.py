"""SURVEY.md §2 round-5 additions, batch EE.

One-way ANOVA over exact moments and HALF_EVEN rounding control.
Registered after ``roundfive_u`` (plans/__init__.py) so the qids append
to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ----------- 2.12 workloads: one-way ANOVA from exact moments

# F = (SSB / (k-1)) / (SSW / (n-k)) with SSB/SSW derived from exact
# integer group moments; ONE shared double expression (corr/OLS
# discipline). SS terms: SST = Sxx - Sx^2/n, SSB = sum(sx_g^2/n_g) -
# Sx^2/n — the per-group ratio lives in DOUBLE, so the whole formula is
# one shared string over exact integer inputs.
_F_EXPR = (
    "round(((cast(ssb_num as double)) / (cast(k as double) - 1.0))"
    " / ((cast(ssw_num as double)) / (cast(n as double) - cast(k as double))), 4)"
)

_ANOVA_ORACLE = f"""
WITH cents AS (
  SELECT c_mktsegment AS g,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS x
  FROM customer
),
grp AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n_g,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx_g,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx_g
  FROM cents GROUP BY g
),
tot AS (
  SELECT CAST(SUM(n_g) AS HUGEINT) AS n,
         CAST(COUNT(*) AS HUGEINT) AS k,
         CAST(SUM(sx_g) AS HUGEINT) AS sx,
         CAST(SUM(sxx_g) AS HUGEINT) AS sxx,
         SUM(CAST(sx_g AS DOUBLE) * CAST(sx_g AS DOUBLE)
             / CAST(n_g AS DOUBLE)) AS sum_gsq
  FROM grp
),
m AS (
  SELECT n, k,
         sum_gsq - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
           AS ssb_num,
         CAST(sxx AS DOUBLE) - sum_gsq AS ssw_num
  FROM tot
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(k AS BIGINT) AS k,
       {_F_EXPR} AS f_stat
FROM m
"""


@query("wl_anova_oneway", "2.12 composite workloads", _ANOVA_ORACLE)
def wl_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does account balance differ across market segments?

    The continuous-outcome counterpart of `wl_ab_test_ztest`'s
    proportions: between-group vs within-group variance decomposition,
    F = (SSB/(k−1)) / (SSW/(n−k)). Group moments (n, Σx, Σx²) accumulate
    EXACTLY (DECIMAL(38,0)/HUGEINT — the corr/OLS discipline); the sum
    of per-group Σx²/n ratios and the final F are the only double math,
    written as expressions shared verbatim by both engines. With 5
    balanced segments of uniform balances F ≈ 0-ish; the census carries
    n and k so the dof arithmetic is checkable.

    Scale shape: one map-combinable keyed aggregate to k=5 group rows,
    then driver-sized arithmetic — the test costs one pass at any
    scale, like every exact-moment statistic in this catalog."""
    cents = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    grp = cents.groupBy("g").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_g"),
        F.sum(dec(F.col("x"))).alias("sx_g"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx_g"),
    )
    tot = grp.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("k"),
        F.sum("sx_g").alias("sx"),
        F.sum("sxx_g").alias("sxx"),
        F.sum(
            F.col("sx_g").cast("double")
            * F.col("sx_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("sum_gsq"),
    )
    m = tot.select(
        "n",
        "k",
        (
            F.col("sum_gsq")
            - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n").cast("double")
        ).alias("ssb_num"),
        (F.col("sxx").cast("double") - F.col("sum_gsq")).alias("ssw_num"),
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.expr(_F_EXPR).alias("f_stat"),
    )


# ----------- 2.7 scalar functions: HALF_EVEN rounding control

_BROUND_ORACLE = """
WITH v AS (
  -- odd cents / 2 is an EXACT x.5 double; k = the integer part
  SELECT (c_custkey * 2 + 1) AS oddc,
         (c_custkey * 2 + 1) // 2 AS k
  FROM customer
),
modes AS (
  SELECT CAST(k + 1 AS BIGINT) AS half_up,         -- round(): away from zero
         CAST(k + (k % 2) AS BIGINT) AS half_even  -- bround(): to even
  FROM v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(half_up) AS BIGINT) AS sum_half_up,
       CAST(SUM(half_even) AS BIGINT) AS sum_half_even,
       CAST(SUM(half_up - half_even) AS BIGINT) AS bias_units
FROM modes
"""


@query("fn_bround_half_even", "2.7 scalar functions", _BROUND_ORACLE)
def fn_bround_half_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round() vs bround(): rounding-mode control on exact .5 ties.

    Financial aggregation bias in one census: HALF_UP pushes every .5
    tie away from zero, so summed rounded values drift upward by one
    unit per tie (`bias_units` counts exactly the ties where the modes
    disagree — the odd-k half); banker's HALF_EVEN (`bround`) cancels
    the drift by alternating. Inputs are constructed exact ties
    (odd/2 is exactly representable), so this is the SEMANTIC contrast,
    free of the repr-tie hazards documented for derived doubles
    (FIXTURES hazard class — the oracle derives both modes from pure
    integer arithmetic and never rounds a double at all).

    Scale shape: map-side codegen + one census."""
    v = load(spark, sf_dir, "customer").select(
        ((F.col("c_custkey") * 2 + 1).cast("double") / 2).alias("t")
    )
    return v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("t").cast("long")).alias("sum_half_up"),
        F.sum(F.bround("t").cast("long")).alias("sum_half_even"),
        F.sum((F.round("t") - F.bround("t")).cast("long")).alias("bias_units"),
    )
