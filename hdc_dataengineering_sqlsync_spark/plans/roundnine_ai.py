"""SURVEY.md §2 round-9 batch AI: manifest min/max pruning plan, DiD
parallel-trends audit, Hill tail-index estimator.

  sync_manifest_minmax_prune  zone-map pruning decisions, verified
  wl_did_parallel_trends      the honesty check before any DiD readout
  wl_hill_tail_index          heavy-tail exponent over top-k spenders

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.6 sync & dataops: manifest (zone-map) pruning, decision-audited

_PRUNE_LO, _PRUNE_HI = 1995, 1996  # the query predicate: orderdate year in

_MANIFEST_ORACLE = f"""
WITH manifest AS (
  SELECT date_trunc('month', o_orderdate) AS file_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(o_orderdate) AS min_d, max(o_orderdate) AS max_d
  FROM orders GROUP BY 1
),
decided AS (
  SELECT file_id, n_rows,
         CASE WHEN year(max_d) < {_PRUNE_LO} OR year(min_d) > {_PRUNE_HI}
              THEN 1 ELSE 0 END AS pruned
  FROM manifest
),
actual AS (
  SELECT date_trunc('month', o_orderdate) AS file_id,
         CAST(SUM(CASE WHEN year(o_orderdate) BETWEEN {_PRUNE_LO}
                       AND {_PRUNE_HI} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_match
  FROM orders GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(SUM(d.pruned) AS BIGINT) AS n_pruned,
       CAST(SUM(CASE WHEN d.pruned = 0 THEN d.n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       CAST(SUM(a.n_match) AS BIGINT) AS rows_matching,
       CAST(SUM(CASE WHEN d.pruned = 1 THEN a.n_match ELSE 0 END)
            AS BIGINT) AS false_prunes,
       CAST(SUM(d.pruned) * 10000 // count(*) AS BIGINT) AS prune_bps
FROM decided d JOIN actual a ON a.file_id = d.file_id
"""


@query(
    "sync_manifest_minmax_prune", "2.6 sync & dataops", _MANIFEST_ORACLE
)
def sync_manifest_minmax_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest (zone-map) pruning, decision-audited — the mechanism
    under Iceberg/Delta file skipping and parquet row-group stats,
    reproduced and VERIFIED: a manifest of per-file (month-partition)
    min/max dates decides which files a year-range predicate may skip;
    the audit joins decisions against the data's actual matches and
    counts false prunes (a pruned file containing a matching row = a
    correctness bug, and this census proves zero). rows_scanned vs
    rows_matching is the scan-amplification figure a 100 TB layout
    review reads.

    Scale shape: the manifest is one keyed min/max census (what the
    writer computes for free); decisions are per-manifest-row scalar
    work; the audit joins two month-grain tables."""
    o = load(spark, sf_dir, "orders").select("o_orderdate")
    manifest = o.groupBy(
        F.trunc("o_orderdate", "month").alias("file_id")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderdate").alias("min_d"),
        F.max("o_orderdate").alias("max_d"),
    )
    decided = manifest.select(
        "file_id",
        "n_rows",
        F.when(
            (F.year("max_d") < _PRUNE_LO) | (F.year("min_d") > _PRUNE_HI), 1
        )
        .otherwise(0)
        .alias("pruned"),
    )
    actual = o.groupBy(
        F.trunc("o_orderdate", "month").alias("file_id")
    ).agg(
        F.sum(
            F.when(
                F.year("o_orderdate").between(_PRUNE_LO, _PRUNE_HI), 1
            ).otherwise(0)
        ).alias("n_match")
    )
    return decided.join(actual, "file_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("pruned").alias("n_pruned"),
        F.sum(
            F.when(F.col("pruned") == 0, F.col("n_rows")).otherwise(0)
        ).alias("rows_scanned"),
        F.sum("n_match").alias("rows_matching"),
        F.sum(
            F.when(F.col("pruned") == 1, F.col("n_match")).otherwise(0)
        ).alias("false_prunes"),
        F.expr("SUM(pruned) * 10000 DIV count(*)").alias("prune_bps"),
    )


# ------ 2.12 composite: DiD parallel-trends audit (pre-period slopes)

_PT_ORACLE = """
WITH monthly AS (
  SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 'treated' ELSE 'control' END
           AS arm,
         (year(l.l_shipdate) - 1994) * 12 + month(l.l_shipdate) - 1 AS t,
         CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(l.l_shipdate) = 1994
  GROUP BY 1, 2
),
mom AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS sx,
         CAST(SUM(cents) AS HUGEINT) AS sy,
         CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(t AS HUGEINT) * cents) AS HUGEINT) AS sxy
  FROM monthly GROUP BY arm
),
slopes AS (
  SELECT arm,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y
  FROM mom
)
SELECT CAST((SELECT count(*) FROM monthly) AS BIGINT) AS n_cells,
       round(max(CASE WHEN arm = 'treated' THEN b END), 2)
         AS slope_treated,
       round(max(CASE WHEN arm = 'control' THEN b END), 2)
         AS slope_control,
       round((max(CASE WHEN arm = 'treated' THEN b END)
              - max(CASE WHEN arm = 'control' THEN b END))
             / max(CASE WHEN arm = 'treated' THEN mean_y END), 6)
         AS slope_gap_rel
FROM slopes
"""


@query("wl_did_parallel_trends", "2.12 composite workloads", _PT_ORACLE)
def wl_did_parallel_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parallel-trends audit — the honesty check a
    difference-in-differences readout (wl_promo_uplift_did) is invalid
    without: in the PRE-period, do treated (PROMO parts) and control
    revenue trend with the same slope? Per-arm OLS slopes from exact
    integer moments (month index × cents — the wl_price_trend_slope
    normal-equation-as-aggregate device), plus the slope gap relative
    to the treated level; a material gap means the DiD's counterfactual
    assumption already fails before treatment.

    Scale shape: month-cell reduction map-side over the broadcast part
    join; two 5-moment folds; scalar math on 2 rows."""
    li = load(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1994)
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_type").like("PROMO%"), "treated")
        .otherwise("control")
        .alias("arm"),
    )
    monthly = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "arm",
            (
                (F.year("l_shipdate") - 1994) * 12
                + F.month("l_shipdate")
                - 1
            ).alias("t"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    td = F.col("t").cast("decimal(38,0)")
    mom = monthly.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("sx"),
        F.sum("cents").cast("decimal(38,0)").alias("sy"),
        F.sum(td * td).alias("sxx"),
        F.sum(td * F.col("cents").cast("decimal(38,0)")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slopes = mom.select(
        "arm",
        (
            (
                nd * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                nd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("b"),
        (F.col("sy").cast("double") / nd).alias("mean_y"),
    )
    n_cells = monthly.agg(F.count(F.lit(1)).alias("n_cells"))
    agg = slopes.agg(
        F.round(
            F.max(F.when(F.col("arm") == "treated", F.col("b"))), 2
        ).alias("slope_treated"),
        F.round(
            F.max(F.when(F.col("arm") == "control", F.col("b"))), 2
        ).alias("slope_control"),
        F.round(
            (
                F.max(F.when(F.col("arm") == "treated", F.col("b")))
                - F.max(F.when(F.col("arm") == "control", F.col("b")))
            )
            / F.max(F.when(F.col("arm") == "treated", F.col("mean_y"))),
            6,
        ).alias("slope_gap_rel"),
    )
    return n_cells.crossJoin(agg).select(
        "n_cells", "slope_treated", "slope_control", "slope_gap_rel"
    )


# ------ 2.12 composite: Hill tail-index estimator over top spenders

_HILL_K = 100

_HILL_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
topk AS (
  SELECT x, row_number() OVER (ORDER BY x DESC, ck) AS r
  FROM spend ORDER BY x DESC, ck LIMIT {_HILL_K + 1}
),
anchor AS (SELECT x AS xk FROM topk WHERE r = {_HILL_K + 1}),
lnsum AS (
  SELECT CAST(SUM(CAST(floor(ln(CAST(t.x AS DOUBLE) / a.xk) * 1000000
                             + 0.5) AS BIGINT)) AS BIGINT) AS s_e6
  FROM topk t CROSS JOIN anchor a WHERE t.r <= {_HILL_K}
)
SELECT {_HILL_K} AS k,
       CAST(a.xk AS BIGINT) AS threshold_cents,
       round(CAST(l.s_e6 AS DOUBLE) / 1000000.0 / {_HILL_K}, 4)
         AS hill_gamma,
       round({_HILL_K} * 1000000.0 / CAST(l.s_e6 AS DOUBLE), 4)
         AS tail_alpha
FROM lnsum l CROSS JOIN anchor a
"""


@query("wl_hill_tail_index", "2.12 composite workloads", _HILL_ORACLE)
def wl_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator — HOW heavy is the whale tail:
    γ̂ = (1/k)Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top-k customer spends, α = 1/γ
    (α ≤ 2 would mean infinite-variance concentration — revenue-at-risk
    is driven by single accounts). The k+1 order statistics come from
    ONE TakeOrdered with a full tie-break; each ln of an exact integer
    ratio quantizes to the 1e-6 grid (the elasticity device) so the sum
    is an exact integer and both readouts close in one shared float
    expression, 4dp.

    Scale shape: per-customer spend is one keyed map-combinable agg;
    top-(k+1) is TakeOrdered, never a global sort; the estimator folds
    k rows to one."""
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("x")
        )
    )
    topk = (
        spend.orderBy(F.col("x").desc(), "ck")
        .limit(_HILL_K + 1)
        .select(
            "x",
            F.row_number()
            .over(Window.orderBy(F.col("x").desc(), "ck"))
            .alias("r"),
        )
    )
    anchor = topk.where(F.col("r") == _HILL_K + 1).select(
        F.col("x").alias("xk")
    )
    lnsum = (
        topk.where(F.col("r") <= _HILL_K)
        .crossJoin(F.broadcast(anchor))
        .agg(
            F.sum(
                F.floor(
                    F.log(F.col("x").cast("double") / F.col("xk")) * 1000000
                    + 0.5
                ).cast("long")
            ).alias("s_e6")
        )
    )
    return lnsum.crossJoin(F.broadcast(anchor)).select(
        F.lit(_HILL_K).alias("k"),
        F.col("xk").alias("threshold_cents"),
        F.round(
            F.col("s_e6").cast("double") / 1000000.0 / _HILL_K, 4
        ).alias("hill_gamma"),
        F.round(
            _HILL_K * 1000000.0 / F.col("s_e6").cast("double"), 4
        ).alias("tail_alpha"),
    )
