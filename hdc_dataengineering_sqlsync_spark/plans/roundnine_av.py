"""SURVEY.md §2 round-9 batch AV: nested predicate pushdown, OR-join
union rewrite, MAPE-vs-WAPE contrast.

  scan_nested_predicate_pushdown  filter on a struct leaf reaches parquet
  join_or_condition_union         the OR-join → union-of-equi-joins rewrite
  ts_mape_wape_contrast           the metric-bias demo, both exact

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.1 scans: predicate on a nested struct leaf pushes down

_NESTED_PRED_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_orderkey <= 3000 AND year(o_orderdate) >= 1996
GROUP BY 1 ORDER BY yr
"""


@query(
    "scan_nested_predicate_pushdown", "2.1 scans", _NESTED_PRED_ORACLE
)
def scan_nested_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown on a NESTED struct leaf — the second half of
    scan_nested_struct_prune's story: a filter on payload.dates.yr must
    reach the parquet reader as a pushed filter on the nested column
    (Spark's nested predicate pushdown is on by default for parquet),
    not evaluate post-scan over rehydrated structs. The census must
    equal the flat oracle; the companion plan test asserts the filter
    appears in PushedFilters.

    Scale shape: at 100 TB the difference is reading the row groups
    whose nested-column stats exclude the predicate vs reading
    everything — the same zone-map story as flat columns, which is why
    the surface deserves its own pin."""
    import tempfile
    import uuid

    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 3000)
        .select(
            "o_orderkey",
            F.struct(
                F.struct(
                    F.year("o_orderdate").cast("int").alias("yr"),
                ).alias("dates"),
                F.struct(
                    F.floor(F.col("o_totalprice") * 100 + 0.5)
                    .cast("long")
                    .alias("cents"),
                ).alias("fin"),
            ).alias("payload"),
        )
    )
    path = tempfile.mkdtemp(prefix=f"nested_pred_{uuid.uuid4().hex[:8]}_")
    o.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).where(F.col("payload.dates.yr") >= 1996)
    return (
        back.groupBy(F.col("payload.dates.yr").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("payload.fin.cents").alias("cents"),
        )
        .orderBy("yr")
    )


# ------ 2.3 joins: OR-condition join as a union of equi-joins

_ORJOIN_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
),
s AS (
  SELECT s_suppkey, s_nationkey,
         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS s_cents
  FROM supplier
),
orjoin AS (
  SELECT c.c_custkey, s.s_suppkey
  FROM c JOIN s
    ON c.c_nationkey = s.s_nationkey
    OR CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) = s.s_cents
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
       CAST(SUM(c_custkey % 97 + s_suppkey % 89) AS BIGINT) AS pair_digest
FROM orjoin
"""


@query("join_or_condition_union", "2.3 joins", _ORJOIN_ORACLE)
def join_or_condition_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OR-join rewrite — a migration classic: `ON a = x OR b = y`
    forces a nested-loop join (no single hash key exists), and the fix
    is the union of two EQUI-joins minus the double-counted
    intersection: J(a) ∪ J(b) = J(a) + J(b∧¬a). The Spark side runs the
    REWRITTEN form (two hash joins, the second with a post-filter
    excluding branch-1 matches); the oracle runs the naive OR join —
    matching censuses prove the rewrite exact, including the
    both-conditions-true overlap that naive UNION ALL would count
    twice.

    Scale shape: two shuffle/broadcast HASH joins instead of a
    nested-loop cross — the difference between O(n·m) and O(n+m) at
    scale; the census folds map-side."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("c_cents"),
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.floor(F.col("s_acctbal") * 100 + 0.5).cast("long").alias("s_cents"),
    )
    j1 = c.join(s, c.c_nationkey == s.s_nationkey).select(
        "c_custkey", "s_suppkey"
    )
    j2 = (
        c.join(s, F.col("c_cents") == F.col("s_cents"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select("c_custkey", "s_suppkey")
    )
    orjoin = j1.unionAll(j2)
    return orjoin.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("c_custkey").alias("n_customers"),
        F.countDistinct("s_suppkey").alias("n_suppliers"),
        F.sum(F.col("c_custkey") % 97 + F.col("s_suppkey") % 89).alias(
            "pair_digest"
        ),
    )


# ------ 2.10 time series: MAPE vs WAPE bias, both exact

_MAPE_ORACLE = """
WITH monthly AS (
  SELECT year(l_shipdate) AS yr, month(l_shipdate) AS m,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem WHERE year(l_shipdate) BETWEEN 1995 AND 1997
  GROUP BY 1, 2
),
folds AS (
  SELECT t.yr AS test_year, t.m,
         abs(t.cents - b.cents) AS abs_err, t.cents AS actual,
         CAST(abs(t.cents - b.cents) * 10000 // t.cents AS BIGINT)
           AS cell_ape_bps
  FROM monthly t JOIN monthly b ON b.yr = t.yr - 1 AND b.m = t.m
  WHERE t.yr BETWEEN 1996 AND 1997
)
SELECT CAST(test_year AS INT) AS test_year,
       CAST(SUM(abs_err) * 10000 // SUM(actual) AS BIGINT) AS wape_bps,
       CAST(SUM(cell_ape_bps) // count(*) AS BIGINT) AS mape_bps,
       CAST(SUM(cell_ape_bps) // count(*)
            - SUM(abs_err) * 10000 // SUM(actual) AS BIGINT)
         AS mape_minus_wape_bps
FROM folds GROUP BY test_year ORDER BY test_year
"""


@query(
    "ts_mape_wape_contrast", "2.10 streaming/time series", _MAPE_ORACLE
)
def ts_mape_wape_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAPE vs WAPE on identical forecasts — the metric-bias demo every
    forecasting review needs once: MAPE averages per-cell percentage
    errors (small months get equal votes, inflating the score), WAPE
    weights by actuals. Both computed EXACTLY on the same
    seasonal-naive folds: per-cell APE quantizes to integral bps before
    the integral mean (the quantization is the declared metric), WAPE
    is one integral division of exact sums — the gap column IS the
    bias, measured not argued.

    Scale shape: month cells reduce map-side; folds share the census
    via one (year−1, month) self-join; two integral divisions per
    fold."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").between(1995, 1997)
    )
    monthly = li.groupBy(
        F.year("l_shipdate").alias("yr"), F.month("l_shipdate").alias("m")
    ).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        ).alias("cents")
    )
    t = monthly.select(
        F.col("yr").alias("tyr"), F.col("m").alias("tm"),
        F.col("cents").alias("tc"),
    )
    b = monthly.select(
        F.col("yr").alias("byr"), F.col("m").alias("bm"),
        F.col("cents").alias("bc"),
    )
    folds = (
        t.join(b, (b.byr == t.tyr - 1) & (b.bm == t.tm))
        .where(F.col("tyr").between(1996, 1997))
        .select(
            F.col("tyr").cast("int").alias("test_year"),
            F.abs(F.col("tc") - F.col("bc")).alias("abs_err"),
            F.col("tc").alias("actual"),
            F.expr(
                "CAST(abs(tc - bc) * 10000 DIV tc AS BIGINT)"
            ).alias("cell_ape_bps"),
        )
    )
    return (
        folds.groupBy("test_year")
        .agg(
            F.expr("SUM(abs_err) * 10000 DIV SUM(actual)").alias("wape_bps"),
            F.expr("SUM(cell_ape_bps) DIV count(*)").alias("mape_bps"),
            F.expr(
                "SUM(cell_ape_bps) DIV count(*)"
                " - SUM(abs_err) * 10000 DIV SUM(actual)"
            ).alias("mape_minus_wape_bps"),
        )
        .orderBy("test_year")
    )
