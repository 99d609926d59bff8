"""SURVEY.md §2.4/§2.8 exact distributed statistics (split out of the
round-4 modules, r5).

Moment-sum statistics (corr/covar, OLS via Cramer, trend slope), the
distributed prefix-sum CDF family (KS drift, exact deciles, Lorenz,
weighted median), inequality/association measures (Gini, entropy/MI), and
the census-shaped audits (Benford, PSI). Shared discipline: every
accumulation is an order-free exact integer/decimal sum; doubles appear
only in the final per-group formula (FIXTURES.md hazards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load



# ---------------------------------------------------------- 2.4 aggregations

_CORR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
         sum(CAST(l_quantity AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy,
         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
         AS corr_qty_cents,
       round((CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE), 2) AS covar_pop_qty_cents,
       round((CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n - 1 AS DOUBLE), 2) AS covar_samp_qty_cents
FROM s ORDER BY l_returnflag
"""


@query("agg_corr_covar_exact", "2.4 aggregations", _CORR_ORACLE)
def agg_corr_covar_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation + covariance as ONE exact-integer
    aggregate pass: quantities are integral and prices 2-decimal, so Σx
    and Σy sum as int64 while every second-moment sum (Σxy ~5e8/row, Σx²,
    Σy² ~1e14/row) accumulates as DECIMAL(38,0) — DuckDB promotes BIGINT
    sums to HUGEINT but non-ANSI Spark sum(long) silently wraps, and at
    ~1e12 rows Σxy alone (~5e20) blows int64 headroom — then the
    closed-form
    moments formulas run ONCE per group in double. This sidesteps the
    cross-engine drift of builtin corr()/covar() (different accumulation
    schemes) the same way wl_price_trend_slope does for regression, and is
    the 100 TB shape: a single map-side-combinable aggregate, no second
    pass over centered values."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,0)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    return s.select(
        "l_returnflag",
        "n",
        F.round(
            (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 4
        ).alias("corr_qty_cents"),
        F.round((sxy - sx * sy / n) / n, 2).alias("covar_pop_qty_cents"),
        F.round((sxy - sx * sy / n) / (F.col("n") - 1).cast("double"), 2).alias(
            "covar_samp_qty_cents"
        ),
    ).orderBy("l_returnflag")


# ------------------------------------------------------------ 2.8 sync core

# log10(1 + 1/d) in exact integer BASIS POINTS (×10000) — fixed integer
# literals on BOTH sides, so neither libm log10 ulps nor double-rounding
# repr-ties (the r5 driver red row) can leak into the comparison.
_BENFORD_BPS = {1: 3010, 2: 1761, 3: 1249, 4: 969, 5: 792, 6: 669, 7: 580, 8: 512, 9: 458}

_BENFORD_CASE = (
    "CAST(CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_BPS.items())
    + " END AS BIGINT)"
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS digit
  FROM orders
),
census AS (
  SELECT digit, count(*) AS n FROM digits GROUP BY digit
),
tot AS (SELECT sum(n) AS total FROM census)
SELECT digit, CAST(n AS BIGINT) AS n,
       CAST((n * 20000 + total) // (2 * total) AS BIGINT) AS obs_bps,
       {_BENFORD_CASE} AS exp_bps,
       CAST(abs((n * 20000 + total) // (2 * total) - ({_BENFORD_CASE})) AS BIGINT) AS abs_dev_bps
FROM census, tot ORDER BY digit
"""


@query("dq_benford_firstdigit", "2.8 sync core", _BENFORD_ORACLE)
def dq_benford_firstdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit on order totals — the fraud /
    synthetic-data screen: observed digit shares vs the Benford expectation
    log10(1+1/d), both in exact integer basis points. The leading digit
    comes from exact cents (×100 shifts the decimal point, leaving the first
    significant digit unchanged), so the census is pure integer counting —
    one map-side-combinable aggregate to 9 rows. The observed share rounds
    half-up via pure integer division ``(n·20000 + total) div (2·total)``
    (all positive, so Spark ``div`` == DuckDB ``//``), eliminating the
    double-rounded derived ratio that tie-broke differently across engines
    in the r5 driver environment."""
    o = load(spark, sf_dir, "orders")
    digit = F.substring(F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1).cast("int")
    census = o.select(digit.alias("digit")).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = census.agg(F.sum("n").alias("total"))
    obs_bps = F.expr("(n * 20000 + total) div (2 * total)").cast("long")
    exp_bps = F.expr(_BENFORD_CASE.replace(" // ", " div "))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            obs_bps.alias("obs_bps"),
            exp_bps.alias("exp_bps"),
            F.abs(obs_bps - exp_bps).cast("long").alias("abs_dev_bps"),
        )
        .orderBy("digit")
    )


# ----------------------------------------------- 2.4 concentration / entropy

_GINI_ORACLE = """
WITH spend AS (
  SELECT c.c_mktsegment AS segment, c.c_custkey,
         sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT segment, cents,
         row_number() OVER (PARTITION BY segment ORDER BY cents, c_custkey) AS i,
         count(*) OVER (PARTITION BY segment) AS n,
         sum(cents) OVER (PARTITION BY segment) AS sx
  FROM spend
)
SELECT segment, CAST(max(n) AS BIGINT) AS n_customers,
       round((2.0 * CAST(sum(i * cents) AS DOUBLE)
              - CAST(max(n) + 1 AS DOUBLE) * CAST(max(sx) AS DOUBLE))
             / (CAST(max(n) AS DOUBLE) * CAST(max(sx) AS DOUBLE)), 4) AS gini
FROM ranked GROUP BY segment ORDER BY segment
"""


@query("agg_gini_segment", "2.4 aggregations", _GINI_ORACLE)
def agg_gini_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer spend per market segment — the
    inequality census behind revenue-concentration dashboards, via the
    sorted-rank identity ``G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)``. Exact
    int64 cents + integer ranks make every sum order-free; ONE double
    division per segment. Scale (the wl_abc_pareto argument): the fact
    stream reduces to #customers rows FIRST (keyed agg), the rank window
    runs over that reduced series partitioned per segment — the total order
    IS the semantics, and parallelism = #segments (in production, the
    grouping key is high-cardinality: per-tenant, per-market)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    spend = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(F.sum(cents).alias("cents"))
    )
    wp = Window.partitionBy("segment")
    wo = wp.orderBy("cents", "c_custkey")
    ranked = spend.select(
        "segment",
        "cents",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("cents").over(wp).alias("sx"),
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").alias("n_customers"),
            F.round(
                (
                    F.lit(2.0) * F.sum(F.col("i") * F.col("cents")).cast("double")
                    - (F.max("n") + 1).cast("double") * F.max("sx").cast("double")
                )
                / (F.max("n").cast("double") * F.max("sx").cast("double")),
                4,
            ).alias("gini"),
        )
        .orderBy("segment")
    )


_ENTROPY_ORACLE = """
WITH c AS (
  SELECT l_returnflag AS f, l_linestatus AS s, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
m AS (
  SELECT f, s, n,
         sum(n) OVER (PARTITION BY f) AS nf,
         sum(n) OVER (PARTITION BY s) AS ns,
         sum(n) OVER () AS nt
  FROM c
),
h AS (
  SELECT -sum((CAST(n AS DOUBLE) / nt) * ln(CAST(n AS DOUBLE) / nt)) AS hj,
         -sum((CAST(n AS DOUBLE) / nt) * ln(CAST(nf AS DOUBLE) / nt)) AS hf,
         -sum((CAST(n AS DOUBLE) / nt) * ln(CAST(ns AS DOUBLE) / nt)) AS hs
  FROM m
)
SELECT round(hf, 4) AS h_flag, round(hs, 4) AS h_status, round(hj, 4) AS h_joint,
       round(hf + hs - hj, 4) AS mutual_info
FROM h
"""


@query("agg_entropy_mi", "2.4 aggregations", _ENTROPY_ORACLE)
def agg_entropy_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + mutual information of (returnflag, linestatus) —
    the dependence screen feature stores run over categorical pairs. ONE
    keyed count collapses the fact table to the tiny joint-distribution
    table; marginals come from window sums over those few rows (no second
    scan), and each marginal entropy is computed as a sum over JOINT rows
    (Σ_s n_fs = n_f), so one aggregate yields all three entropies; MI =
    H(f)+H(s)−H(joint) from the unrounded values."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_returnflag").alias("f"), F.col("l_linestatus").alias("s")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = c.select(
        "n",
        F.sum("n").over(Window.partitionBy("f")).alias("nf"),
        F.sum("n").over(Window.partitionBy("s")).alias("ns"),
        F.sum("n").over(Window.partitionBy()).alias("nt"),
    )
    p = F.col("n").cast("double") / F.col("nt")
    h = m.agg(
        (-F.sum(p * F.log(p))).alias("hj"),
        (-F.sum(p * F.log(F.col("nf").cast("double") / F.col("nt")))).alias("hf"),
        (-F.sum(p * F.log(F.col("ns").cast("double") / F.col("nt")))).alias("hs"),
    )
    return h.select(
        F.round("hf", 4).alias("h_flag"),
        F.round("hs", 4).alias("h_status"),
        F.round("hj", 4).alias("h_joint"),
        F.round(F.col("hf") + F.col("hs") - F.col("hj"), 4).alias("mutual_info"),
    )


# ---------------------------------------------- 2.8 KS distribution drift

_KS_ORACLE = """
WITH target AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 101 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
),
s AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders),
t AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM target),
census AS (
  SELECT v, sum(c1) AS n1v, sum(c2) AS n2v
  FROM (SELECT v, 1 AS c1, 0 AS c2 FROM s UNION ALL SELECT v, 0, 1 FROM t)
  GROUP BY v
),
cum AS (
  SELECT v,
         sum(n1v) OVER (ORDER BY v) AS c1,
         sum(n2v) OVER (ORDER BY v) AS c2
  FROM census
),
tot AS (SELECT (SELECT count(*) FROM s) AS n1, (SELECT count(*) FROM t) AS n2),
d AS (
  SELECT v, abs(c1 * n2 - c2 * n1) AS numer
  FROM cum, tot
)
SELECT tot.n1 AS n_src, tot.n2 AS n_tgt,
       round(CAST((SELECT max(numer) FROM d) AS DOUBLE)
             / (CAST(tot.n1 AS DOUBLE) * tot.n2), 6) AS ks_stat,
       CAST((SELECT min(v) FROM d WHERE numer = (SELECT max(numer) FROM d)) AS BIGINT)
         AS argmax_cents
FROM tot
"""


@query("dq_ks_drift", "2.8 sync core", _KS_ORACLE)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between source and
    target order totals — the distribution-level screen that catches value
    drift row counts and digests can't name. Exact by construction: D's
    numerator is max|c1·n2 − c2·n1| in pure int64 (no per-point float
    CDF), ONE final division.

    The scale pattern is the DISTRIBUTED PREFIX SUM: a global CDF needs a
    global cumulative order, but a single-partition window is the
    win_range_frame cliff. Instead values bucket into coarse cells, the
    per-cell totals (bounded: #cells rows) come to the driver once for
    cumulative offsets, and the within-cell cumsum runs as a window
    PARTITIONED BY CELL — full parallelism, identical result. That is how
    a 100 TB engine computes exact quantiles/CDFs without a global sort
    bottleneck."""
    from hdc_dataengineering_sqlsync_spark.operators.cdf import exact_global_cum
    from hdc_dataengineering_sqlsync_spark.plans.sync import _source, _target

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    s = _source(spark, sf_dir).select(cents.alias("v"), F.lit(1).alias("c1"), F.lit(0).alias("c2"))
    t = _target(spark, sf_dir).select(cents.alias("v"), F.lit(0).alias("c1"), F.lit(1).alias("c2"))
    census = (
        s.unionAll(t)
        .groupBy("v")
        .agg(F.sum("c1").alias("n1v"), F.sum("c2").alias("n2v"))
    )
    cum, totals = exact_global_cum(census, "v", ("n1v", "n2v"))
    n1, n2 = totals["n1v"], totals["n2v"]
    d = cum.select("v", F.abs(F.col("n1v") * n2 - F.col("n2v") * n1).alias("numer"))
    top = d.orderBy(F.col("numer").desc(), "v").limit(1)
    return top.select(
        F.lit(n1).cast("long").alias("n_src"),
        F.lit(n2).cast("long").alias("n_tgt"),
        F.round(F.col("numer").cast("double") / (float(n1) * float(n2)), 6).alias("ks_stat"),
        F.col("v").alias("argmax_cents"),
    )


# ----------------------------------------------------- 2.8 PSI drift

_PSI_ORACLE = """
WITH target AS (
  SELECT o_totalprice FROM orders WHERE o_orderkey % 97 <> 0
),
sb AS (
  SELECT least(CAST(round(o_totalprice * 100, 0) AS BIGINT) // 5000000, 9) AS bin,
         count(*) AS n
  FROM orders GROUP BY bin
),
tb AS (
  SELECT least(CAST(round(o_totalprice * 100, 0) AS BIGINT) // 5000000, 9) AS bin,
         count(*) AS n
  FROM target GROUP BY bin
),
tot AS (SELECT (SELECT count(*) FROM orders) AS ns, (SELECT count(*) FROM target) AS nt),
bins AS (SELECT unnest(range(0, 10)) AS bin)
SELECT b.bin,
       CAST(coalesce(sb.n, 0) AS BIGINT) AS n_src,
       CAST(coalesce(tb.n, 0) AS BIGINT) AS n_tgt,
       round((CAST(coalesce(sb.n, 0) + 1 AS DOUBLE) / (ns + 10)
              - CAST(coalesce(tb.n, 0) + 1 AS DOUBLE) / (nt + 10))
             * ln((CAST(coalesce(sb.n, 0) + 1 AS DOUBLE) / (ns + 10))
                  / (CAST(coalesce(tb.n, 0) + 1 AS DOUBLE) / (nt + 10))), 6)
         AS psi_contrib
FROM bins b LEFT JOIN sb ON sb.bin = b.bin LEFT JOIN tb ON tb.bin = b.bin, tot
ORDER BY b.bin
"""


@query("dq_psi_drift", "2.8 sync core", _PSI_ORACLE)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per bin — the ML-ops drift metric that
    complements dq_ks_drift: KS finds the single worst CDF gap, PSI scores
    WHERE the mass moved, bin by bin (Σ(p−q)·ln(p/q); > 0.2 = retrain
    alarm). Fixed $50k-wide cent bins capped at 10; add-one smoothing
    keeps empty bins finite AND exact (shares are identical rationals in
    both engines, one ln each). ONE lazy plan like its census siblings
    (dq_benford_firstdigit): one aggregate scan per side to ≤10 bin rows,
    side totals via an unpartitioned window over those ≤20 rows (every
    source row lands in a bin, so no second count() scan and no driver
    round-trip), literal bin lattice left-joined so empty bins appear.
    Scale: volume-immune — only the 10-row censuses ever shuffle."""
    from pyspark.sql import Window

    from hdc_dataengineering_sqlsync_spark.plans.sync import _source, _target

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    bin_ = F.least(F.expr("cents div 5000000"), F.lit(9)).alias("bin")

    def census(df: DataFrame, out: str) -> DataFrame:
        agg = df.select(cents.alias("cents")).groupBy(bin_).agg(F.count(F.lit(1)).alias(out))
        # total = sum over the <=10 bin rows; the single-partition window
        # is over the REDUCED census, never the raw table
        return agg.withColumn("tot_" + out, F.sum(out).over(Window.partitionBy()))

    lattice = spark.range(10).select(F.col("id").cast("long").alias("bin"))
    j = (
        lattice.join(census(_source(spark, sf_dir), "n_src"), "bin", "left")
        .join(census(_target(spark, sf_dir), "n_tgt"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_src", F.lit(0)).alias("n_src"),
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
            F.coalesce(
                F.first("tot_n_src", ignorenulls=True).over(Window.partitionBy()), F.lit(0)
            ).alias("ns"),
            F.coalesce(
                F.first("tot_n_tgt", ignorenulls=True).over(Window.partitionBy()), F.lit(0)
            ).alias("nt"),
        )
    )
    p = (F.col("n_src") + 1).cast("double") / (F.col("ns") + 10)
    q = (F.col("n_tgt") + 1).cast("double") / (F.col("nt") + 10)
    return j.select(
        "bin", "n_src", "n_tgt", F.round((p - q) * F.log(p / q), 6).alias("psi_contrib")
    ).orderBy("bin")


# ------------------------------------- 2.4 exact distributed deciles

_DECILES_ORACLE = """
WITH census AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v, count(*) AS n
  FROM orders GROUP BY v
),
cum AS (
  SELECT v, sum(n) OVER (ORDER BY v) AS c,
         (SELECT sum(n) FROM census) AS tot
  FROM census
),
d AS (SELECT unnest(range(1, 10)) AS decile)
SELECT CAST(d.decile AS INT) AS decile,
       CAST((SELECT min(v) FROM cum
             WHERE c >= (d.decile * tot + 9) // 10) AS BIGINT)
         AS value_cents
FROM d, (SELECT DISTINCT tot FROM cum) t
ORDER BY decile
"""


@query("agg_deciles_distributed", "2.4 aggregations", _DECILES_ORACLE)
def agg_deciles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global deciles of order totals WITHOUT a global sort — the
    production answer to 'exact percentiles at 100 TB': the dq_ks_drift
    distributed prefix-sum (value census → coarse cells → driver offsets,
    bounded by #cells → per-cell cumsum windows) yields every distinct
    value's exact global rank in parallel; decile d = smallest value whose
    cumulative count reaches ceil(d·n/10) (type-1/disc quantile). Integer
    cents end to end — no interpolation convention to drift."""
    from hdc_dataengineering_sqlsync_spark.operators.cdf import exact_global_cum

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    census = (
        load(spark, sf_dir, "orders")
        .select(cents.alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cum_df, totals = exact_global_cum(census, "v", ("n",))
    cum = cum_df.select("v", F.col("n").alias("c"))
    tot = totals["n"]
    # pure-integer ceil: d*tot/10 via float is inexact past 2^53
    targets = [(d, (d * tot + 9) // 10) for d in range(1, 10)]
    tdf = spark.createDataFrame(targets, "decile int, target long")
    return (
        cum.join(F.broadcast(tdf), F.col("c") >= F.col("target"))
        .groupBy("decile")
        .agg(F.min("v").alias("value_cents"))
        .orderBy("decile")
    )


# ----------------------------------------- 2.4 Lorenz curve (decile points)

_LORENZ_ORACLE = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
census AS (SELECT cents AS v, count(*) AS n, sum(cents) AS w FROM spend GROUP BY cents),
cum AS (
  SELECT v,
         sum(n) OVER (ORDER BY v) AS c,
         sum(w) OVER (ORDER BY v) AS cw,
         (SELECT sum(n) FROM census) AS tot,
         (SELECT sum(w) FROM census) AS totw
  FROM census
),
d AS (SELECT unnest(range(1, 10)) AS decile)
SELECT CAST(d.decile AS INT) AS decile,
       round(CAST(k.c AS DOUBLE) / k.tot, 4) AS pop_share,
       round(CAST(k.cw AS DOUBLE) / k.totw, 4) AS spend_share
FROM d, LATERAL (
  SELECT c, cw, tot, totw FROM cum
  WHERE c >= (d.decile * tot + 9) // 10
  ORDER BY v LIMIT 1
) k
ORDER BY decile
"""


@query("agg_lorenz_curve", "2.4 aggregations", _LORENZ_ORACLE)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend at the 9 decile cuts — the
    concentration picture agg_gini_segment summarizes to one number:
    at the smallest spend value covering ≥ d/10 of customers, what share
    of total spend do they hold? Built on operators/cdf.py's distributed
    prefix-sum cumulating TWO measures in one pass (customer count AND
    spend cents — the multi-measure case the operator exists for), so the
    whole curve costs one census + one bounded driver offset pass; all
    cumulative values exact int64, two rounded divisions per point."""
    from hdc_dataengineering_sqlsync_spark.operators.cdf import exact_global_cum

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    spend = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", cents.alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    census = spend.groupBy(F.col("cents").alias("v")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("w")
    )
    cum, totals = exact_global_cum(census, "v", ("n", "w"))
    tot, totw = totals["n"], totals["w"]
    targets = [(d, (d * tot + 9) // 10) for d in range(1, 10)]
    tdf = spark.createDataFrame(targets, "decile int, target long")
    # per decile: the FIRST value reaching the population target
    first = (
        cum.join(F.broadcast(tdf), F.col("n") >= F.col("target"))
        .groupBy("decile")
        .agg(F.min(F.struct(F.col("v"), F.col("n"), F.col("w"))).alias("k"))
    )
    return first.select(
        "decile",
        F.round(F.col("k.n").cast("double") / F.lit(float(tot)), 4).alias("pop_share"),
        F.round(F.col("k.w").cast("double") / F.lit(float(totw)), 4).alias("spend_share"),
    ).orderBy("decile")


# ------------------------------------------- 2.12 two-factor OLS (Cramer)


def _det3(a1, a2, a3, b1, b2, b3, c1, c2, c3) -> str:
    """3x3 determinant as an expression string over EXACT integer moment
    columns cast to double — the SAME string feeds Spark's F.expr and the
    DuckDB oracle, so the IEEE expression tree is identical by
    construction."""
    d = {k: f"CAST({v} AS DOUBLE)" for k, v in locals().items() if k != "d"}
    return (
        f"{d['a1']} * ({d['b2']} * {d['c3']} - {d['b3']} * {d['c2']})"
        f" - {d['a2']} * ({d['b1']} * {d['c3']} - {d['b3']} * {d['c1']})"
        f" + {d['a3']} * ({d['b1']} * {d['c2']} - {d['b2']} * {d['c1']})"
    )


_OLS_D = _det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
_OLS_NC = _det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
_OLS_NA = _det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
_OLS_NB = _det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")

_OLS_MOMENTS_SQL = """
  SELECT l_returnflag, count(*) AS n,
         sum(q) AS s1, sum(dp) AS s2, sum(q * q) AS s11,
         sum(dp * dp) AS s22, sum(q * dp) AS s12,
         sum(y) AS sy, sum(q * y) AS s1y, sum(dp * y) AS s2y
  FROM (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_discount * 100, 0) AS BIGINT) AS dp,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
    FROM lineitem
  ) GROUP BY l_returnflag
"""

_OLS_ORACLE = f"""
WITH m AS ({_OLS_MOMENTS_SQL})
SELECT l_returnflag, n,
       round(({_OLS_NA}) / ({_OLS_D}), 2) AS coef_qty,
       round(({_OLS_NB}) / ({_OLS_D}), 2) AS coef_disc,
       round(({_OLS_NC}) / ({_OLS_D}), 2) AS intercept
FROM m ORDER BY l_returnflag
"""


@query("wl_ols_two_factor", "2.12 composite workloads", _OLS_ORACLE)
def wl_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (price-cents ~ quantity + discount-pct + intercept)
    per returnflag, solved in closed form via Cramer's rule on the 3×3
    normal equations — multi-feature in-database regression with NO solver
    and NO iteration: ONE map-side-combinable aggregate collects the 9
    exact int64 moment sums, then the determinants run once per group in
    double — and the determinant EXPRESSION STRING is shared verbatim
    between the Spark plan and the oracle, so both engines evaluate the
    identical IEEE tree. The k-feature generalization is the same shape
    with a (k+1)² moment matrix — still one aggregate pass at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    dp = F.round(F.col("l_discount") * 100, 0).cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    m = (
        li.select("l_returnflag", q.alias("q"), dp.alias("dp"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("s1"),
            F.sum("dp").alias("s2"),
            # second-moment products accumulate as DECIMAL(38,0): DuckDB
            # sum(BIGINT) promotes to HUGEINT but non-ANSI Spark sum(long)
            # silently wraps, and dp*y (~1e9/row) exhausts int64 headroom
            # near ~1e10 rows; first moments (sy ~1e7/row) keep int64 safe
            # to ~1e11 rows and stay long for the cheap path
            F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("s11"),
            F.sum((F.col("dp") * F.col("dp")).cast("decimal(38,0)")).alias("s22"),
            F.sum((F.col("q") * F.col("dp")).cast("decimal(38,0)")).alias("s12"),
            F.sum("y").alias("sy"),
            F.sum((F.col("q") * F.col("y")).cast("decimal(38,0)")).alias("s1y"),
            F.sum((F.col("dp") * F.col("y")).cast("decimal(38,0)")).alias("s2y"),
        )
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(F.expr(f"({_OLS_NA}) / ({_OLS_D})"), 2).alias("coef_qty"),
        F.round(F.expr(f"({_OLS_NB}) / ({_OLS_D})"), 2).alias("coef_disc"),
        F.round(F.expr(f"({_OLS_NC}) / ({_OLS_D})"), 2).alias("intercept"),
    ).orderBy("l_returnflag")


_WMEDIAN_ORACLE = """
WITH c AS (
  SELECT l_returnflag, CAST(month(l_shipdate) AS INT) AS mon, l_extendedprice,
         sum(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag, month(l_shipdate)
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS UNBOUNDED PRECEDING) AS cum,
         sum(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag, month(l_shipdate)) AS tot
  FROM lineitem
)
SELECT l_returnflag, mon, min(CASE WHEN 2 * cum >= tot THEN l_extendedprice END)
         AS weighted_median
FROM c GROUP BY l_returnflag, mon ORDER BY l_returnflag, mon
"""


@query("agg_weighted_median", "2.4 aggregations", _WMEDIAN_ORACLE)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (quantity-weighted price) per (returnflag, ship
    month): the smallest price whose cumulative weight reaches half the
    group's total. Weights are integral quantities cast to int64, and the
    half-total test is `2*cum >= tot` — pure integer comparison, no
    floating threshold to flap; the median itself is a SELECTED value, so
    no rounding convention is needed. Partitioning by (flag, month) gives
    ~36 window partitions — the parallelism a grouped value-ranking needs
    (contrast the retired 3-key win_range_frame)."""
    li = load(spark, sf_dir, "lineitem")
    # mon must be a REAL column before the windows reference it (Spark
    # rejects lateral column aliases inside window partition specs)
    base = li.select(
        "l_returnflag",
        F.month("l_shipdate").alias("mon"),
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    grp = ["l_returnflag", "mon"]
    wc = (
        Window.partitionBy(*grp)
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*grp)
    c = base.select(
        "l_returnflag",
        "mon",
        "l_extendedprice",
        F.sum("qty").over(wc).alias("cum"),
        F.sum("qty").over(wt).alias("tot"),
    )
    return (
        c.groupBy(*grp)
        .agg(
            F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("l_extendedprice"))).alias(
                "weighted_median"
            )
        )
        .orderBy("l_returnflag", "mon")
    )


# ------------------------------------------------ round-4 batch 3 (4 qids)

_TREND_ORACLE = """
WITH pt AS (
  SELECT l_returnflag,
         (CAST(year(l_shipdate) AS BIGINT) - 1995) * 12 + month(l_shipdate) AS x,
         (2 * sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) + count(*))
           // (2 * count(*)) AS yc
  FROM lineitem GROUP BY l_returnflag, x
),
s AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
         CAST(sum(x * yc) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pt GROUP BY l_returnflag
)
SELECT l_returnflag, n AS n_months,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (100.0 * CAST(n * sxx - sx * sx AS DOUBLE)), 4) AS slope_per_month
FROM s ORDER BY l_returnflag
"""


@query("wl_price_trend_slope", "2.12 composite workloads", _TREND_ORACLE)
def wl_price_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS trend slope of the monthly average price per returnflag — linear
    regression AS AN AGGREGATE (the closed-form normal equation), the way
    a 100 TB engine fits millions of tiny per-group models: no solver, no
    iteration, just sums. Determinism: the monthly average snaps to int64
    cents via pure half-up integer division ``(2·Σcents + n) div (2n)``
    (the r6 replacement for ``round(avg(price),2)`` — avg is a derived
    ratio whose 2-decimal rounding can land on a repr tie, the exact class
    that turned dq_benford_firstdigit red in the r5 driver), the month
    index is an integer, so every Σx, Σy, Σxy, Σx² is EXACT int64
    (order-free) and the single final division is identical IEEE in both
    engines. Two keyed aggregates — months per flag, then one row per
    flag; both map-side combinable."""
    li = load(spark, sf_dir, "lineitem")
    x = ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate")).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    pt = (
        li.groupBy("l_returnflag", x.alias("x"))
        .agg(F.sum(cents).alias("sc"), F.count(F.lit(1)).alias("cnt"))
        .select(
            "l_returnflag",
            "x",
            F.expr("(2 * sc + cnt) div (2 * cnt)").alias("yc"),
        )
    )
    s = pt.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = 100.0 * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        "l_returnflag",
        F.col("n").alias("n_months"),
        F.round(num / den, 4).alias("slope_per_month"),
    ).orderBy("l_returnflag")
