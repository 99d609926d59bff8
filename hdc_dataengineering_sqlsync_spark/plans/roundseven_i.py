"""SURVEY.md §2 round-7 batch I: scorecard WOE binning and binned
earth-mover drift.

  wl_scorecard_woe    Weight-of-Evidence / Information-Value binning
  dq_drift_emd_binned 1-D Wasserstein drift on a shared binned grid
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------ 2.12 workloads: scorecard WOE / IV binning

_WOE_ORACLE = """
WITH base AS (
  SELECT CAST(least(CAST(round(o_totalprice * 100) AS BIGINT) // 5000000, 5) AS INT) AS bin,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS good
  FROM orders
),
b AS (
  SELECT bin,
         count(*) AS n,
         sum(good) AS n_good,
         count(*) - sum(good) AS n_bad
  FROM base GROUP BY bin
),
t AS (SELECT sum(n_good) AS tg, sum(n_bad) AS tb FROM b)
SELECT bin, CAST(n AS BIGINT) AS n,
       CAST(n_good AS BIGINT) AS n_good, CAST(n_bad AS BIGINT) AS n_bad,
       round(ln((CAST(n_good AS DOUBLE) / t.tg) / (CAST(n_bad AS DOUBLE) / t.tb)), 4)
         AS woe,
       round((CAST(n_good AS DOUBLE) / t.tg - CAST(n_bad AS DOUBLE) / t.tb)
             * ln((CAST(n_good AS DOUBLE) / t.tg) / (CAST(n_bad AS DOUBLE) / t.tb)), 4)
         AS iv_contrib
FROM b, t ORDER BY bin
"""


@query("wl_scorecard_woe", "2.12 composite workloads", _WOE_ORACLE)
def wl_scorecard_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence scorecard binning — the credit-risk / churn
    feature-engineering primitive: fixed-width value bins (integer floor
    division of the exact cent total, capped — deterministic, no quantile-edge
    float), per-bin WOE = ln(good_share/bad_share) and the
    Information-Value contribution (share_diff · WOE). Counts are exact
    integers; the two float shares and the ln are identical expression
    strings both engines, rounded 4dp (the entropy/PMI convention). Bins
    here always hold both classes (fixture-verified); production binning
    adds Laplace smoothing — documented, deliberately not declared so the
    declared algebra stays exact.

    Scale shape: ONE map-side-combinable (bin) aggregate over the pruned
    2-column scan + a broadcast 1-row total — scorecard features for a
    100 TB ledger cost one reduction per variable."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.least(
            F.expr("cast(cast(round(o_totalprice * 100, 0) as bigint) div 5000000 as int)"),
            F.lit(5),
        ).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("good"),
    )
    b = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("good").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("good")).alias("n_bad"),
    )
    t = b.agg(F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb"))
    gs = F.col("n_good").cast("double") / F.col("tg")
    bs = F.col("n_bad").cast("double") / F.col("tb")
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "bin",
            "n",
            F.col("n_good").cast("long").alias("n_good"),
            F.col("n_bad").cast("long").alias("n_bad"),
            F.round(F.log(gs / bs), 4).alias("woe"),
            F.round((gs - bs) * F.log(gs / bs), 4).alias("iv_contrib"),
        )
        .orderBy("bin")
    )


# -------------- 2.8 sync core: binned earth-mover (Wasserstein-1) drift

_EMD_ORACLE = """
WITH base AS (
  SELECT CAST(least(CAST(round(o_totalprice * 100) AS BIGINT) // 2500000, 11) AS INT) AS bin,
         CASE WHEN year(o_orderdate) <= 1997 THEN 'ref' ELSE 'cur' END AS period
  FROM orders
),
b AS (
  SELECT bin,
         count(CASE WHEN period = 'ref' THEN 1 END) AS p,
         count(CASE WHEN period = 'cur' THEN 1 END) AS q
  FROM base GROUP BY bin
),
t AS (SELECT sum(p) AS np, sum(q) AS nq FROM b),
c AS (
  SELECT bin, p, q,
         sum(p) OVER (ORDER BY bin) AS pc,
         sum(q) OVER (ORDER BY bin) AS qc
  FROM b
)
SELECT CAST((SELECT count(*) FROM b) AS BIGINT) AS n_bins,
       CAST(t.np AS BIGINT) AS n_ref, CAST(t.nq AS BIGINT) AS n_cur,
       CAST((SELECT sum(abs(pc * t.nq - qc * t.np)) FROM c) AS BIGINT)
         AS emd_crossnum,
       round(CAST((SELECT sum(abs(pc * t.nq - qc * t.np)) FROM c) AS DOUBLE)
             / (CAST(t.np AS DOUBLE) * t.nq), 4) AS emd_bins
FROM t
"""


@query("dq_drift_emd_binned", "2.8 sync core", _EMD_ORACLE)
def dq_drift_emd_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned 1-D earth-mover (Wasserstein-1) drift between a reference
    period (≤1997) and the current one, in BIN-WIDTH units: EMD over a
    shared fixed grid = Σ_bins |CDF_ref − CDF_cur|, computed as the EXACT
    integer cross-multiplied numerator Σ|pc·Nq − qc·Np| (no float share
    enters the comparison; the single division happens once for the
    reported float). EMD complements the declared drift pair — PSI
    (dq_psi_drift) saturates on disjoint supports and KS (dq_ks_drift)
    sees only the max gap; EMD measures HOW FAR mass moved.

    Scale shape: ONE conditional-count aggregate over the pruned scan to
    #bins rows, a 12-row cumulative window, a broadcast total — the
    standard drift-report cost regardless of table size."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.least(
            F.expr("cast(cast(round(o_totalprice * 100, 0) as bigint) div 2500000 as int)"),
            F.lit(11),
        ).alias("bin"),
        F.when(F.year("o_orderdate") <= 1997, "ref").otherwise("cur").alias("period"),
    )
    b = base.groupBy("bin").agg(
        F.count(F.when(F.col("period") == "ref", 1)).alias("p"),
        F.count(F.when(F.col("period") == "cur", 1)).alias("q"),
    )
    w = Window.orderBy("bin")
    c = b.select(
        "bin", "p", "q",
        F.sum("p").over(w).alias("pc"),
        F.sum("q").over(w).alias("qc"),
    )
    t = b.agg(F.sum("p").alias("np"), F.sum("q").alias("nq"))
    num = (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.sum(F.abs(F.col("pc") * F.col("nq") - F.col("qc") * F.col("np"))).alias(
                "emd_crossnum"
            ),
            F.count(F.lit(1)).alias("n_bins"),
        )
    )
    return (
        num.crossJoin(F.broadcast(t))
        .select(
            F.col("n_bins").cast("long").alias("n_bins"),
            F.col("np").cast("long").alias("n_ref"),
            F.col("nq").cast("long").alias("n_cur"),
            F.col("emd_crossnum").cast("long").alias("emd_crossnum"),
            F.round(
                F.col("emd_crossnum").cast("double")
                / (F.col("np").cast("double") * F.col("nq")),
                4,
            ).alias("emd_bins"),
        )
    )
