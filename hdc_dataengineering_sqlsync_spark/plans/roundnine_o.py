"""SURVEY.md §2 round-9 batch O: interrupted time-series (segmented
regression) and Theil's U2 forecast-skill score — the catalog's 500th
operator pair.

  wl_interrupted_ts  pre/post segment fits: slope change + level jump
  ts_theil_u2_skill  seasonal-naive vs random-walk squared-error ratio

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ---- 2.12 composite: interrupted time series (segmented regression)

# Per segment: den = n·Σxx − Σx², slope·10³ = (n·Σxy − Σx·Σy)·10³ div den,
# fitted value at the cut t0 (cents) = (Σy·Σxx − Σx·Σxy + t0·(n·Σxy −
# Σx·Σy)) div den — all exact rational arithmetic closed with integral
# divisions; every product is widened (HUGEINT / DECIMAL(38,0)) because
# Σy·Σxx crosses int64 around 1000× fixture scale.

_ITS_T0 = 25  # x index of 1996-01 with x = (year-1994)*12 + month

_ITS_ORACLE = f"""
WITH monthly AS (
  SELECT l_returnflag AS flag,
         CAST((year(l_shipdate) - 1994) * 12 + month(l_shipdate) AS BIGINT) AS x,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS y
  FROM lineitem WHERE year(l_shipdate) BETWEEN 1994 AND 1996
  GROUP BY 1, 2
),
seg AS (
  SELECT flag, CASE WHEN x < {_ITS_T0} THEN 'pre' ELSE 'post' END AS seg,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM monthly GROUP BY 1, 2
),
fit AS (
  SELECT flag, seg,
         CAST((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) AS BIGINT)
           AS slope_mc,
         CAST((sy * sxx - sx * sxy + {_ITS_T0} * (n * sxy - sx * sy))
              // (n * sxx - sx * sx) AS BIGINT) AS at_t0_cents
  FROM seg
)
SELECT pre.flag,
       pre.slope_mc AS slope_pre_mc,
       post.slope_mc AS slope_post_mc,
       CAST(post.slope_mc - pre.slope_mc AS BIGINT) AS slope_change_mc,
       CAST(post.at_t0_cents - pre.at_t0_cents AS BIGINT) AS level_jump_cents
FROM fit pre JOIN fit post ON post.flag = pre.flag
WHERE pre.seg = 'pre' AND post.seg = 'post'
ORDER BY pre.flag
"""


@query("wl_interrupted_ts", "2.12 composite workloads", _ITS_ORACLE)
def wl_interrupted_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series analysis — the causal-inference design for
    a policy change WITHOUT a control group (complementing
    `wl_promo_uplift_did`, which needs one): fit the monthly revenue
    trend separately before and after the 1996-01 intervention and
    report the SLOPE CHANGE and the LEVEL JUMP at the cut, both from
    closed-form normal equations whose products are exact wide integers
    and whose only divisions are integral (slope in millicents/month,
    fitted values in cents — no solver, no float accumulation anywhere).

    Scale shape: fact rows reduce map-side to 36 month cells per series;
    one keyed agg collects the 5 moments per (series, segment); the
    pre⋈post pairing is a self-join on the series-count-sized fit
    table."""
    li = load(spark, sf_dir, "lineitem")
    monthly = (
        li.where(F.year("l_shipdate").between(1994, 1996))
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            ((F.year("l_shipdate") - 1994) * 12 + F.month("l_shipdate"))
            .cast("long")
            .alias("x"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias(
                "y"
            )
        )
    )
    seg = monthly.groupBy(
        "flag",
        F.when(F.col("x") < _ITS_T0, "pre").otherwise("post").alias("seg"),
    ).agg(
        F.expr("CAST(count(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(sum(x) AS DECIMAL(38,0))").alias("sx"),
        F.expr("CAST(sum(y) AS DECIMAL(38,0))").alias("sy"),
        F.expr("CAST(sum(x * y) AS DECIMAL(38,0))").alias("sxy"),
        F.expr("CAST(sum(x * x) AS DECIMAL(38,0))").alias("sxx"),
    )
    fit = seg.select(
        "flag",
        "seg",
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000 DIV (n * sxx - sx * sx) AS BIGINT)"
        ).alias("slope_mc"),
        F.expr(
            f"CAST((sy * sxx - sx * sxy + {_ITS_T0} * (n * sxy - sx * sy))"
            " DIV (n * sxx - sx * sx) AS BIGINT)"
        ).alias("at_t0_cents"),
    )
    pre = fit.where(F.col("seg") == "pre").select(
        "flag",
        F.col("slope_mc").alias("slope_pre_mc"),
        F.col("at_t0_cents").alias("pre_t0"),
    )
    post = fit.where(F.col("seg") == "post").select(
        "flag",
        F.col("slope_mc").alias("slope_post_mc"),
        F.col("at_t0_cents").alias("post_t0"),
    )
    return (
        pre.join(F.broadcast(post), "flag")
        .select(
            "flag",
            "slope_pre_mc",
            "slope_post_mc",
            (F.col("slope_post_mc") - F.col("slope_pre_mc")).alias(
                "slope_change_mc"
            ),
            (F.col("post_t0") - F.col("pre_t0")).alias("level_jump_cents"),
        )
        .orderBy("flag")
    )


# ------ 2.10 time series: Theil's U2 — forecast skill vs random walk

_U2_ORACLE = """
WITH monthly AS (
  SELECT CAST(month(l_shipdate) AS INT) AS mon, CAST(year(l_shipdate) AS INT) AS yr,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2
),
a AS (
  SELECT mon, rev AS actual,
         lag(rev) OVER (ORDER BY mon) AS naive
  FROM monthly WHERE yr = 1996
),
f AS (SELECT mon, rev AS seasonal FROM monthly WHERE yr = 1995),
scored AS (
  SELECT a.mon, a.actual, a.naive, f.seasonal
  FROM a JOIN f ON f.mon = a.mon
  WHERE a.naive IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_months,
       CAST(SUM(CAST(seasonal - actual AS HUGEINT)
                * CAST(seasonal - actual AS HUGEINT)) AS HUGEINT)::VARCHAR
         AS sse_seasonal,
       CAST(SUM(CAST(naive - actual AS HUGEINT)
                * CAST(naive - actual AS HUGEINT)) AS HUGEINT)::VARCHAR
         AS sse_naive,
       CAST(SUM(CAST(seasonal - actual AS HUGEINT)
                * CAST(seasonal - actual AS HUGEINT)) * 10000
            // SUM(CAST(naive - actual AS HUGEINT)
                   * CAST(naive - actual AS HUGEINT)) AS BIGINT) AS u2_sq_e4
FROM scored
"""


@query("ts_theil_u2_skill", "2.10 streaming/time series", _U2_ORACLE)
def ts_theil_u2_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 — the forecast SKILL score: squared error of the
    year-ago seasonal-naive divided by squared error of the random walk
    (last month). U2² < 1 means the model genuinely beats the no-model
    baseline — the acceptance bar every forecast must clear before its
    WAPE (`ts_forecast_wape`) is even worth reading. Squared cent errors
    cross int64 (~10¹⁸ per term at fixture scale already), so both
    engines accumulate in wide integers — HUGEINT / DECIMAL(38,0) — and
    the SSE columns are emitted as exact decimal STRINGS (the one type
    both engines can carry a 38-digit integer in losslessly); the ratio
    closes in one integral division to e4 fixed-point.

    Scale shape: month-grain map-side reduction; the lag window and the
    12-row calendar join run on cells."""
    li = load(spark, sf_dir, "lineitem")
    monthly = (
        li.where(F.year("l_shipdate").isin(1995, 1996))
        .groupBy(
            F.month("l_shipdate").alias("mon"), F.year("l_shipdate").alias("yr")
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias(
                "rev"
            )
        )
    )
    from pyspark.sql.window import Window

    a = (
        monthly.where(F.col("yr") == 1996)
        .select(
            "mon",
            F.col("rev").alias("actual"),
            F.lag("rev").over(Window.orderBy("mon")).alias("naive"),
        )
        .where(F.col("naive").isNotNull())
    )
    f = monthly.where(F.col("yr") == 1995).select(
        "mon", F.col("rev").alias("seasonal")
    )
    sq = lambda c: (  # noqa: E731
        f"CAST({c} AS DECIMAL(38,0)) * CAST({c} AS DECIMAL(38,0))"
    )
    return (
        a.join(F.broadcast(f), "mon")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.expr(
                f"CAST(SUM({sq('seasonal - actual')}) AS STRING)"
            ).alias("sse_seasonal"),
            F.expr(f"CAST(SUM({sq('naive - actual')}) AS STRING)").alias(
                "sse_naive"
            ),
            F.expr(
                f"CAST(SUM({sq('seasonal - actual')}) * 10000"
                f" DIV SUM({sq('naive - actual')}) AS BIGINT)"
            ).alias("u2_sq_e4"),
        )
    )
