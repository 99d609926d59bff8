"""SURVEY.md §2 round-9 batch AA: exact fourth-root CAGR, Weibull shape
fit, seasonal/trend strength.

  wl_cagr_fourth_root   CAGR via composed integer square roots
  wl_weibull_shape_fit  median-rank regression for the shape parameter
  ts_seasonal_strength  variance-ratio strength of season and trend

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.plans.roundnine_i import _ISQRT
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: 4-year CAGR via composed exact integer sqrts

# fourth root as isqrt∘isqrt: ratio_e12 = end·1e12 // start (≲ few e12,
# inside _ISQRT's 2^52 envelope); isqrt -> sqrt(ratio)·1e6; ×100 then
# isqrt again -> ratio^(1/4)·1e4. The inner floor can shave the composed
# value by 1 e-4 unit vs the true fourth root — but the EXPRESSION is
# pure integer arithmetic, so both engines agree bit-for-bit, which is
# the contract (a float pow(x, 0.25) is where engines diverge).
_CAGR_ORACLE = f"""
WITH rev AS (
  SELECT c.c_mktsegment AS segment, year(o.o_orderdate) AS yr,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE year(o.o_orderdate) IN (1993, 1997)
  GROUP BY 1, 2
),
wide AS (
  SELECT segment,
         max(CASE WHEN yr = 1993 THEN cents END) AS start_cents,
         max(CASE WHEN yr = 1997 THEN cents END) AS end_cents
  FROM rev GROUP BY segment
),
arg AS (
  SELECT segment, start_cents, end_cents,
         CAST(CAST(end_cents AS HUGEINT) * 1000000000000
              // start_cents AS BIGINT) AS ratio_e12
  FROM wide WHERE start_cents > 0
),
r1 AS (
  SELECT segment, start_cents, end_cents,
         {_ISQRT.format(a="ratio_e12")} AS s_e6
  FROM arg
)
SELECT segment, start_cents, end_cents,
       CAST({_ISQRT.format(a="(s_e6 * 100)")} - 10000 AS BIGINT)
         AS cagr_bps
FROM r1 ORDER BY segment
"""


@query("wl_cagr_fourth_root", "2.12 composite workloads", _CAGR_ORACLE)
def wl_cagr_fourth_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-year CAGR per segment — (end/start)^(1/4) − 1 — computed WITHOUT
    pow(): the fourth root is two composed exact integer square roots
    (isqrt(isqrt(end·10¹²/start)·100) lands on the 1e-4 grid), because
    float pow is NOT correctly rounded and is exactly where two engines'
    growth dashboards drift by a basis point. The composed-floor value
    is pure integer arithmetic — bit-identical everywhere — and within
    one e-4 unit of the true root (documented; identity (1+g)⁴ =
    end/start recoverable to that grid).

    Scale shape: one keyed two-year revenue agg (map-combinable) to 10
    cells, a 5-row pivot, and scalar integer math."""
    rev = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(1993, 1997))
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    wide = rev.groupBy("segment").agg(
        F.max(F.when(F.col("yr") == 1993, F.col("cents"))).alias(
            "start_cents"
        ),
        F.max(F.when(F.col("yr") == 1997, F.col("cents"))).alias("end_cents"),
    )
    arg = wide.where(F.col("start_cents") > 0).select(
        "segment",
        "start_cents",
        "end_cents",
        F.expr(
            "CAST(CAST(end_cents AS DECIMAL(38,0)) * 1000000000000"
            " DIV start_cents AS BIGINT)"
        ).alias("ratio_e12"),
    )
    isqrt_spark = _ISQRT  # identical expression string in both engines
    r1 = arg.select(
        "segment",
        "start_cents",
        "end_cents",
        F.expr(isqrt_spark.format(a="ratio_e12")).alias("s_e6"),
    )
    return r1.select(
        "segment",
        "start_cents",
        "end_cents",
        (F.expr(isqrt_spark.format(a="(s_e6 * 100)")) - 10000)
        .cast("long")
        .alias("cagr_bps"),
    ).orderBy("segment")


# ------ 2.12 composite: Weibull shape via median-rank regression

_WEIBULL_ORACLE = """
WITH ship AS (
  SELECT l_orderkey AS k, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
),
dur AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate, s.ship) + 1 AS t
  FROM orders o JOIN ship s ON s.k = o.o_orderkey
  WHERE year(o.o_orderdate) = 1995
    AND date_diff('day', o.o_orderdate, s.ship) + 1 >= 1
),
grid AS (
  SELECT priority, t, CAST(count(*) AS BIGINT) AS c
  FROM dur GROUP BY priority, t
),
cum AS (
  SELECT priority, t,
         CAST(SUM(c) OVER (PARTITION BY priority ORDER BY t) AS BIGINT)
           AS cumc,
         CAST(SUM(c) OVER (PARTITION BY priority) AS BIGINT) AS n
  FROM grid
),
pt AS (
  SELECT priority,
         CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(-ln((CAST(n AS DOUBLE) - cumc + 0.7)
                           / (CAST(n AS DOUBLE) + 0.4)))
                    * 1000000 + 0.5) AS BIGINT) AS y
  FROM cum
),
mom AS (
  SELECT priority, count(*) AS np, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM pt GROUP BY priority
)
SELECT priority, CAST(np AS BIGINT) AS n_points,
       round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
         AS weibull_shape
FROM mom ORDER BY priority
"""


@query("wl_weibull_shape_fit", "2.12 composite workloads", _WEIBULL_ORACLE)
def wl_weibull_shape_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull shape (β) by median-rank regression — reliability
    engineering's fulfillment-time fit: β < 1 means lead times have a
    heavy early mass (infant mortality), β > 1 an aging/wear-out shape;
    the classic probability-plot estimate is the OLS slope of
    ln(−ln(1−F)) on ln(t) with Bénard's median ranks F = (i−0.3)/(n+0.4)
    at the distinct-duration grain. Both ln coordinates quantize to the
    1e-6 grid immediately (the wl_price_elasticity_loglog discipline),
    so the OLS moments are exact wide integers and the slope is ONE
    float division, 4dp.

    Scale shape: durations from one orderkey-keyed agg; the duration
    histogram reduces map-side to (priority, day) cells; rank and
    moments run per-priority over ≤ a few hundred cells."""
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.max("l_shipdate").alias("ship"))
    )
    o = load(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    dur = (
        o.join(ship, o.o_orderkey == ship.k)
        .select(
            F.col("o_orderpriority").alias("priority"),
            (F.datediff("ship", "o_orderdate") + 1).alias("t"),
        )
        .where(F.col("t") >= 1)  # synthetic data holds ~1% negative lead
        # times (ship before order); a reliability fit is over valid
        # durations only, and ln(t) needs t >= 1
    )
    grid = dur.groupBy("priority", "t").agg(F.count(F.lit(1)).alias("c"))
    wp = Window.partitionBy("priority")
    w = wp.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "priority",
        "t",
        F.sum("c").over(w).alias("cumc"),
        F.sum("c").over(wp).alias("n"),
    )
    pt = cum.select(
        "priority",
        F.expr(
            "CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(floor(ln(-ln((CAST(n AS DOUBLE) - cumc + 0.7)"
            " / (CAST(n AS DOUBLE) + 0.4))) * 1000000 + 0.5) AS BIGINT)"
        ).alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    mom = pt.groupBy("priority").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * F.col("y").cast("decimal(38,0)")).alias("sxy"),
    )
    npd = F.col("np").cast("double")
    return mom.select(
        "priority",
        F.col("np").cast("long").alias("n_points"),
        F.round(
            (
                npd * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                npd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            ),
            4,
        ).alias("weibull_shape"),
    ).orderBy("priority")


# ------ 2.10 time series: seasonal / trend strength (variance ratios)

_STRENGTH_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', l_shipdate) AS mon,
         CAST(month(l_shipdate) AS INT) AS cm,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS x
  FROM lineitem WHERE year(l_shipdate) BETWEEN 1993 AND 1996
  GROUP BY 1, 2
),
seq AS (
  SELECT mon, cm, CAST(x AS BIGINT) AS x,
         row_number() OVER (ORDER BY mon) AS rn,
         count(*) OVER () AS nmon
  FROM monthly
),
trend AS (
  SELECT mon, cm, x, rn,
         CASE WHEN rn >= 6 AND rn <= nmon - 6 THEN
           CAST(SUM(x) OVER (ORDER BY rn ROWS BETWEEN 5 PRECEDING
                             AND 6 FOLLOWING) // 12 AS BIGINT)
         END AS tr
  FROM seq
),
det AS (SELECT cm, x, tr, x - tr AS d FROM trend WHERE tr IS NOT NULL),
seasonal AS (
  SELECT cm, CAST(SUM(d) // count(*) AS BIGINT) AS s
  FROM det GROUP BY cm
),
series AS (
  SELECT d.d, d.d - s.s AS r, d.x - s.s - d.tr AS chk
  FROM det d JOIN seasonal s ON s.cm = d.cm
),
mm AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(d) AS HUGEINT) AS sd,
         CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd,
         CAST(SUM(r) AS HUGEINT) AS sr,
         CAST(SUM(CAST(r AS HUGEINT) * r) AS HUGEINT) AS srr
  FROM series
)
SELECT n AS n_months,
       round(1 - (CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
                  - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                  - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)), 4)
         AS seasonal_strength
FROM mm
"""


@query(
    "ts_seasonal_strength", "2.10 streaming/time series", _STRENGTH_ORACLE
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal strength — the variance-ratio gauge (1 − Var(residual)/
    Var(detrended), the STL-features 'strength of seasonality') that
    says whether ts_decompose_additive's seasonal component is signal
    or noise: near 0 means deseasonalizing buys nothing, near 1 means
    the calendar owns the series. Reuses the decompose qid's exact
    conventions (centered MA-12 with integral division, month-mean
    seasonal); both variances reduce to exact wide-integer moment sums
    (n·Σv² − (Σv)² — the shared-n trick makes the ratio a single float
    division of exact integers), rounded 4dp.

    Scale shape: month-grain map-side reduction; MA-12 and moments run
    over the ~36 usable month rows, never the fact."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").between(1993, 1996)
    )
    monthly = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("mon"),
        F.month("l_shipdate").alias("cm"),
    ).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        ).alias("x")
    )
    seq = monthly.select(
        "mon",
        "cm",
        "x",
        F.row_number().over(Window.orderBy("mon")).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .alias("nmon"),
    )
    # integral MA: SUM over the 12-row frame, then DIV 12 (not float /)
    wma = Window.orderBy("rn").rowsBetween(-5, 6)
    trend = (
        seq.select(
            "cm", "x", "rn", "nmon", F.sum("x").over(wma).alias("ma_sum")
        )
        .where((F.col("rn") >= 6) & (F.col("rn") <= F.col("nmon") - 6))
        .select("cm", "x", F.expr("ma_sum DIV 12").alias("tr"))
    )
    det = trend.select(
        "cm", "x", "tr", (F.col("x") - F.col("tr")).alias("d")
    )
    seasonal = det.groupBy("cm").agg(
        F.expr("SUM(d) DIV count(*)").alias("s")
    )
    series = det.join(seasonal, "cm").select(
        "d", (F.col("d") - F.col("s")).alias("r")
    )
    dd = F.col("d").cast("decimal(38,0)")
    rr = F.col("r").cast("decimal(38,0)")
    mm = series.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").cast("decimal(38,0)").alias("sd"),
        F.sum(dd * dd).alias("sdd"),
        F.sum("r").cast("decimal(38,0)").alias("sr"),
        F.sum(rr * rr).alias("srr"),
    )
    nd = F.col("n").cast("double")
    return mm.select(
        F.col("n").alias("n_months"),
        F.round(
            1
            - (
                nd * F.col("srr").cast("double")
                - F.col("sr").cast("double") * F.col("sr").cast("double")
            )
            / (
                nd * F.col("sdd").cast("double")
                - F.col("sd").cast("double") * F.col("sd").cast("double")
            ),
            4,
        ).alias("seasonal_strength"),
    )
