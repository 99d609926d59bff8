"""SURVEY.md §2 round-7 batch L: log-log price elasticity on a quantized
logarithm grid.

  wl_price_elasticity_loglog  demand elasticity via OLS over ln-ln points
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ln values quantize to 1e-6 integers BEFORE any sum: ln runs once per
# monthly point on an exact integer input (cents / qty-units), the same
# expression string in both engines, and floor(+0.5) lands both on the
# same int64 grid — so every OLS moment is an exact integer sum and only
# the final slope division is floating point.
_ELASTICITY_ORACLE = """
WITH m AS (
  SELECT date_trunc('month', l_shipdate) AS month,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1
),
pt AS (
  SELECT CAST(floor(ln(CAST(rev_cents AS DOUBLE) / qty) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(qty AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
  FROM m WHERE qty > 0
),
mom AS (
  SELECT count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM pt
)
SELECT CAST(n AS BIGINT) AS n_months,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             4) AS elasticity
FROM mom
"""


@query("wl_price_elasticity_loglog", "2.12 composite workloads", _ELASTICITY_ORACLE)
def wl_price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand elasticity: OLS slope of ln(monthly quantity) on
    ln(monthly average unit price) — the pricing-analytics regression
    where the slope IS the elasticity. The cross-engine trick: both ln
    coordinates quantize to 1e-6 integer units immediately (DuckDB's
    libm log and Java's Math.log are NOT both correctly rounded, so a
    1-ulp divergence landing exactly on a .5 grid boundary could flip
    one int64 moment unit — the hazard is REDUCED by the grid, not
    eliminated; the final 4dp rounding of the slope absorbs any single
    flipped grid point), so the OLS moments are int64/HUGEINT sums —
    order-free — and the closed-form normal-equation slope performs ONE
    float division at the very end (the wl_price_trend_slope discipline
    extended to transformed coordinates).

    Scale shape: the fact stream reduces to the monthly grain map-side
    FIRST; the regression runs over ~84 points; at 100 TB this is one
    map-combinable aggregate + a 5-number moment fold per segment."""
    li = load(spark, sf_dir, "lineitem")
    m = (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("rev_cents"),
            F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("qty"),
        )
        .where(F.col("qty") > 0)
    )
    x = F.floor(
        F.log(F.col("rev_cents").cast("double") / F.col("qty")) * 1000000 + F.lit(0.5)
    ).cast("long")
    y = F.floor(F.log(F.col("qty").cast("double")) * 1000000 + F.lit(0.5)).cast("long")
    pt = m.select(x.alias("x"), y.alias("y"))
    xd = F.col("x").cast("decimal(38,0)")
    mom = pt.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * F.col("y").cast("decimal(38,0)")).alias("sxy"),
    )
    return mom.select(
        F.col("n").cast("long").alias("n_months"),
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            ),
            4,
        ).alias("elasticity"),
    )
