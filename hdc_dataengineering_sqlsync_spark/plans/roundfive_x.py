"""SURVEY.md §2 round-5 additions, batch GG.

Column-level churn profile over CDC update pairs. Registered after
``roundfive_w`` (plans/__init__.py) so the qids append to the END of the
never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Deterministic v2 snapshot: three disjoint mutation classes over customer
# (balance bump, segment flip, name suffix) + an untouched remainder —
# identical CASE logic in both engines.
_V2_DUCK = """
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN c_name || '*' ELSE c_name END AS c_name,
         CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal + 1.11, 2)
              ELSE c_acctbal END AS c_acctbal,
         CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer
"""

_CHURN_ORACLE = f"""
WITH v2 AS ({_V2_DUCK}),
pairs AS (
  SELECT a.c_custkey,
         CAST(a.c_name <> b.c_name AS INT) AS d_name,
         CAST(CAST(round(a.c_acctbal * 100, 0) AS BIGINT)
              <> CAST(round(b.c_acctbal * 100, 0) AS BIGINT) AS INT) AS d_bal,
         CAST(a.c_mktsegment <> b.c_mktsegment AS INT) AS d_seg
  FROM customer a JOIN v2 b ON a.c_custkey = b.c_custkey
)
SELECT col, CAST(n_changed AS BIGINT) AS n_changed,
       CAST(n_changed * 10000 // n_rows AS BIGINT) AS churn_bps
FROM (
  SELECT 'c_acctbal' AS col, SUM(d_bal) AS n_changed, COUNT(*) AS n_rows
  FROM pairs
  UNION ALL
  SELECT 'c_mktsegment', SUM(d_seg), COUNT(*) FROM pairs
  UNION ALL
  SELECT 'c_name', SUM(d_name), COUNT(*) FROM pairs
)
ORDER BY col
"""


@query("sync_column_churn_profile", "2.8 sync core", _CHURN_ORACLE)
def sync_column_churn_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level churn profile: WHICH fields drive the update stream.

    `sync_snapshot_diff` classifies ROWS into I/U/D; this goes one level
    deeper on the U class — per column, how many updates actually touch
    it (before-image vs after-image comparison). The profile is what
    tunes a real sync pipeline: high-churn columns justify column-level
    delta encoding or exclusion from digest checks, zero-churn columns
    can drop out of the change feed entirely, and a column churning at
    100% usually means a volatile timestamp poisoning the diff
    (the audit that catches it). Money compares in exact cents (the
    FIXTURES discipline), never raw doubles.

    Scale shape: the before/after comparison is the PK-equi-join the
    sync diff already pays (co-partitioned at deployment); the per-
    column flags are map-side bit columns and the profile is a tiny
    unpivoted census — the deep audit costs nothing beyond the diff
    join it rides on."""
    v1 = load(spark, sf_dir, "customer")
    v2 = v1.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.concat("c_name", F.lit("*")))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when(F.col("c_custkey") % 7 == 0, F.round(F.col("c_acctbal") + 1.11, 2))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    a = v1.alias("a")
    b = v2.alias("b")
    cents = lambda c: F.round(F.col(c) * 100, 0).cast("long")  # noqa: E731
    pairs = a.join(b, F.col("a.c_custkey") == F.col("b.c_custkey")).select(
        (F.col("a.c_name") != F.col("b.c_name")).cast("int").alias("d_name"),
        (cents("a.c_acctbal") != cents("b.c_acctbal")).cast("int").alias("d_bal"),
        (F.col("a.c_mktsegment") != F.col("b.c_mktsegment"))
        .cast("int")
        .alias("d_seg"),
    )
    totals = pairs.agg(
        F.sum("d_bal").alias("b"),
        F.sum("d_seg").alias("s"),
        F.sum("d_name").alias("nm"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        totals.selectExpr(
            "stack(3, 'c_acctbal', b, 'c_mktsegment', s, 'c_name', nm)"
            " AS (col, n_changed)",
            "n",
        )
        .select(
            "col",
            F.col("n_changed").cast("long").alias("n_changed"),
            F.expr("n_changed * 10000 div n").alias("churn_bps"),
        )
        .orderBy("col")
    )
