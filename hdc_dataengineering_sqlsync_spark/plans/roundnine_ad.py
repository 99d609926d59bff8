"""SURVEY.md §2 round-9 batch AD: BCG growth-share quadrants, balanced
range split points, ABC-XYZ planning matrix.

  wl_bcg_growth_share     4-quadrant classification, all-integer tests
  sync_range_split_points balanced range-partition boundaries
  wl_abc_xyz_matrix       value x variability 9-cell planning census

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: BCG growth-share quadrants (exact compares)

_BCG_ORACLE = """
WITH rev AS (
  SELECT split_part(p.p_type, ' ', 1) AS market, p.p_brand AS brand,
         CAST(SUM(CASE WHEN year(l.l_shipdate) = 1996 THEN
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT) ELSE 0 END) AS BIGINT) AS r96,
         CAST(SUM(CASE WHEN year(l.l_shipdate) = 1997 THEN
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT) ELSE 0 END) AS BIGINT) AS r97
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(l.l_shipdate) IN (1996, 1997)
  GROUP BY 1, 2
),
ranked AS (
  SELECT market, brand, r96, r97,
         max(r97) OVER (PARTITION BY market) AS mkt_max
  FROM rev WHERE r96 > 0
),
quad AS (
  SELECT market, brand,
         CASE WHEN r97 * 10 > r96 * 11 THEN 1 ELSE 0 END AS hi_growth,
         CASE WHEN r97 = mkt_max THEN 1 ELSE 0 END AS leader
  FROM ranked
)
SELECT market,
       CAST(count(*) AS BIGINT) AS n_brands,
       CAST(SUM(hi_growth * leader) AS BIGINT) AS n_star,
       CAST(SUM((1 - hi_growth) * leader) AS BIGINT) AS n_cash_cow,
       CAST(SUM(hi_growth * (1 - leader)) AS BIGINT) AS n_question,
       CAST(SUM((1 - hi_growth) * (1 - leader)) AS BIGINT) AS n_dog
FROM quad GROUP BY market ORDER BY market
"""


@query("wl_bcg_growth_share", "2.12 composite workloads", _BCG_ORACLE)
def wl_bcg_growth_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BCG growth-share quadrants — star / cash-cow / question-mark /
    dog per market (p_type family): high growth is the CROSS-MULTIPLIED
    test r97·10 > r96·11 (strictly above +10%, no float rate), and
    market leadership is an exact equality against the market's max —
    so the portfolio classification every strategy review argues over
    can never flip on a rounding artifact.

    Scale shape: one keyed two-year revenue agg (map-combinable) over
    the broadcast part join; the leader window and quadrant census run
    on the ~150-row (market, brand) table."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1996, 1997)
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("market"),
        F.col("p_brand").alias("brand"),
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("market", "brand")
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == 1996, cents).otherwise(0)
            ).alias("r96"),
            F.sum(
                F.when(F.year("l_shipdate") == 1997, cents).otherwise(0)
            ).alias("r97"),
        )
        .where(F.col("r96") > 0)
    )
    ranked = rev.select(
        "market",
        "brand",
        "r96",
        "r97",
        F.max("r97").over(Window.partitionBy("market")).alias("mkt_max"),
    )
    quad = ranked.select(
        "market",
        F.when(F.col("r97") * 10 > F.col("r96") * 11, 1)
        .otherwise(0)
        .alias("hi_growth"),
        F.when(F.col("r97") == F.col("mkt_max"), 1).otherwise(0).alias(
            "leader"
        ),
    )
    return (
        quad.groupBy("market")
        .agg(
            F.count(F.lit(1)).alias("n_brands"),
            F.sum(F.col("hi_growth") * F.col("leader")).alias("n_star"),
            F.sum((1 - F.col("hi_growth")) * F.col("leader")).alias(
                "n_cash_cow"
            ),
            F.sum(F.col("hi_growth") * (1 - F.col("leader"))).alias(
                "n_question"
            ),
            F.sum((1 - F.col("hi_growth")) * (1 - F.col("leader"))).alias(
                "n_dog"
            ),
        )
        .orderBy("market")
    )


# ------ 2.6 sync & dataops: balanced range-partition split points

_SPLIT_N = 8

_SPLIT_ORACLE = f"""
WITH census AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS t
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT v, t,
         CAST(SUM(t) OVER (ORDER BY v) AS BIGINT) AS cum,
         CAST(SUM(t) OVER () AS BIGINT) AS n
  FROM census
),
ix(i) AS (VALUES {", ".join(f"({i})" for i in range(1, _SPLIT_N))})
SELECT CAST(ix.i AS INT) AS split_ix,
       CAST(min(CASE WHEN {_SPLIT_N} * cum >= ix.i * n THEN v END)
            AS BIGINT) AS split_cents,
       CAST(min(CASE WHEN {_SPLIT_N} * cum >= ix.i * n THEN cum END)
            AS BIGINT) AS cum_rows_at_split
FROM ranked CROSS JOIN ix
GROUP BY ix.i ORDER BY split_ix
"""


@query("sync_range_split_points", "2.6 sync & dataops", _SPLIT_ORACLE)
def sync_range_split_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced range-partition boundaries — the planning primitive
    under every distributed sort and range-bucketed export (Spark's
    RangePartitioner does this with sampling; a correctness-grade plan
    does it exactly): the 7 split values that cut the key domain into 8
    near-equal row ranges, each the smallest data value whose
    cumulative count reaches i/8 of the total (the all-integer
    `8·cum ≥ i·n` threshold — the percentile_disc device generalized to
    a split VECTOR via a broadcast index relation). Reporting
    cum_rows_at_split makes the residual imbalance visible — the
    skew-vs-split diagnostic.

    Scale shape: the value census is map-side combinable; the
    cumulative pass runs over |distinct values|, not rows; the 7-row
    index table cross-joins as a broadcast."""
    census = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("v")
        )
        .agg(F.count(F.lit(1)).alias("t"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = census.select(
        "v",
        F.sum("t").over(w).alias("cum"),
        F.sum("t").over(Window.partitionBy()).alias("n"),
    )
    ix = spark.range(1, _SPLIT_N).select(F.col("id").cast("int").alias("i"))
    hit = F.when(
        _SPLIT_N * F.col("cum") >= F.col("i") * F.col("n"), F.col("v")
    )
    hit_cum = F.when(
        _SPLIT_N * F.col("cum") >= F.col("i") * F.col("n"), F.col("cum")
    )
    return (
        ranked.crossJoin(F.broadcast(ix))
        .groupBy(F.col("i").alias("split_ix"))
        .agg(
            F.min(hit).alias("split_cents"),
            F.min(hit_cum).alias("cum_rows_at_split"),
        )
        .orderBy("split_ix")
    )


# ------ 2.12 composite: ABC × XYZ planning matrix (all-integer classes)

_ABCXYZ_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
         CAST(SUM(CAST(round(l_quantity) AS HUGEINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS sqq
  FROM lineitem GROUP BY 1
),
abc AS (
  SELECT pk, rev, n, sq, sqq,
         CAST(SUM(rev) OVER (ORDER BY rev DESC, pk) AS HUGEINT) AS cum,
         CAST(SUM(rev) OVER () AS HUGEINT) AS tot
  FROM per_part
),
classed AS (
  SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
              WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc,
         -- CV thresholds cross-multiplied: var <= k^2 mean^2 with
         -- var = (n*sqq - sq^2)/n^2, mean = sq/n  =>
         -- 4*(n*sqq - sq^2) <= sq^2 (X: cv<=0.5); (n*sqq - sq^2) <= sq^2 (Y: cv<=1)
         CASE WHEN 4 * (n * sqq - CAST(sq AS HUGEINT) * sq)
                   <= CAST(sq AS HUGEINT) * sq THEN 'X'
              WHEN (n * sqq - CAST(sq AS HUGEINT) * sq)
                   <= CAST(sq AS HUGEINT) * sq THEN 'Y'
              ELSE 'Z' END AS xyz,
         rev, tot
  FROM abc WHERE sq > 0
)
SELECT abc, xyz,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS rev_cents,
       CAST(SUM(CAST(rev AS HUGEINT)) * 10000 // max(tot) AS BIGINT)
         AS rev_share_bps
FROM classed GROUP BY abc, xyz ORDER BY abc, xyz
"""


@query("wl_abc_xyz_matrix", "2.12 composite workloads", _ABCXYZ_ORACLE)
def wl_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC×XYZ planning matrix — the 9-cell grid inventory planners
    actually set policies from (AX: automate, CZ: make-to-order),
    crossing wl_abc_pareto's value classes with wl_xyz_variability's
    demand-variability classes IN ONE census: ABC from the descending
    cumulative revenue share (integer cross-multiplied 80/95 cuts, pk
    tie-break), XYZ from the CV thresholds cross-multiplied to
    4·(nΣq²−S²) ≤ S² (cv≤0.5) and (nΣq²−S²) ≤ S² (cv≤1) — variance
    never computed, every class boundary an exact wide-integer compare.

    Scale shape: one map-combinable 4-moment agg per part; the ABC
    cumulative pass orders the part-grain table (sampled range
    partitioning at scale — the one global-order step, over parts, not
    facts); the 9-cell census folds map-side."""
    li = load(spark, sf_dir, "lineitem")
    qv = F.round("l_quantity").cast("long")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            ).cast("long")
        ).alias("rev"),
        F.count(F.lit(1)).alias("n"),
        F.sum(qv).alias("sq"),
        F.sum(qv.cast("decimal(38,0)") * qv).alias("sqq"),
    )
    w = Window.orderBy(F.col("rev").desc(), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    abc = per_part.select(
        "pk",
        "rev",
        "n",
        "sq",
        "sqq",
        F.sum("rev").over(w).cast("decimal(38,0)").alias("cum"),
        F.sum("rev")
        .over(Window.partitionBy())
        .cast("decimal(38,0)")
        .alias("tot"),
    )
    classed = abc.where(F.col("sq") > 0).select(
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        F.expr(
            "CASE WHEN 4 * (n * sqq - CAST(sq AS DECIMAL(38,0)) * sq)"
            "          <= CAST(sq AS DECIMAL(38,0)) * sq THEN 'X'"
            " WHEN (n * sqq - CAST(sq AS DECIMAL(38,0)) * sq)"
            "      <= CAST(sq AS DECIMAL(38,0)) * sq THEN 'Y'"
            " ELSE 'Z' END"
        ).alias("xyz"),
        "rev",
        "tot",
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").alias("rev_cents"),
            F.expr(
                "CAST(SUM(CAST(rev AS DECIMAL(38,0))) * 10000 DIV max(tot)"
                " AS BIGINT)"
            ).alias("rev_share_bps"),
        )
        .orderBy("abc", "xyz")
    )
