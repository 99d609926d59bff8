"""SURVEY.md §2 round-9 batch AO: consonant-run gibberish screen,
backward fill, ABC class migration.

  text_consonant_run_screen  longest consonant run per doc — OCR/junk flag
  win_ignore_nulls_bfill     NEXT-non-null backfill (the ffill twin)
  wl_abc_class_migration     year-over-year class churn matrix

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.9 llm-data: longest consonant run (gibberish/OCR screen)

_RUN_ORACLE = """
WITH runs AS (
  SELECT source,
         COALESCE(list_max(list_transform(
           regexp_split_to_array(text, '[aeiou ]+'), x -> len(x))), 0)
           AS max_run
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(max_run) AS BIGINT) AS longest_run,
       CAST(SUM(CASE WHEN max_run >= 6 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(SUM(CASE WHEN max_run >= 6 THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS flagged_bps
FROM runs GROUP BY source ORDER BY source
"""


@query("text_consonant_run_screen", "2.9 llm-data", _RUN_ORACLE)
def text_consonant_run_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consonant-run screen — the gibberish/OCR-noise heuristic
    ('zxkvqt' never survives a language): the longest vowel-free run
    per document, computed by SPLITTING on vowels+spaces and taking the
    max fragment length — no per-character loop, one regexp and an
    array max, identical semantics in both engines (the regex is a
    plain character class). Docs with a run ≥ 6 flag in exact bps per
    source.

    Scale shape: the split + max are map-side scalar work; the census
    folds per source."""
    runs = load(spark, sf_dir, "documents").select(
        "source",
        F.coalesce(
            F.array_max(
                F.transform(
                    F.split("text", "[aeiou ]+"), lambda x: F.length(x)
                )
            ),
            F.lit(0),
        ).alias("max_run"),
    )
    return (
        runs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("max_run").cast("long").alias("longest_run"),
            F.sum(F.when(F.col("max_run") >= 6, 1).otherwise(0)).alias(
                "n_flagged"
            ),
            F.expr(
                "SUM(CASE WHEN max_run >= 6 THEN 1 ELSE 0 END) * 10000"
                " DIV count(*)"
            ).alias("flagged_bps"),
        )
        .orderBy("source")
    )


# ------ 2.5 windows: backward fill (next non-null), the ffill twin

_BFILL_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CASE WHEN o_orderkey % 4 = 0
              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END AS v
  FROM orders WHERE o_orderkey <= 4000
),
j AS (
  SELECT prio, v,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY prio ORDER BY k
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
  FROM src
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing,
       CAST(SUM(CASE WHEN bfill IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unfillable,
       CAST(SUM(COALESCE(bfill, 0)) AS BIGINT) AS bfill_sum
FROM j GROUP BY prio ORDER BY prio
"""


@query("win_ignore_nulls_bfill", "2.5 window functions", _BFILL_ORACLE)
def win_ignore_nulls_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward fill — the NEXT-non-null twin of win_ignore_nulls_ffill
    (sensor gaps filled from the reading AFTER, end-of-series gaps
    honestly unfillable): Spark expresses it as first_value IGNORE
    NULLS over the CURRENT ROW..UNBOUNDED FOLLOWING frame, and DuckDB's
    first_value takes the same IGNORE NULLS + frame (probed) — a rare
    case of identical window-extension syntax. Census per priority:
    missing count, unfillable tail count, exact filled sum.

    Scale shape: one window pass partitioned by priority (Spark side);
    the census folds to 5 rows."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 4000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("prio"),
            F.when(
                F.col("o_orderkey") % 4 == 0,
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"),
            ).alias("v"),
        )
    )
    w = (
        Window.partitionBy("prio")
        .orderBy("k")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = src.select(
        "prio",
        "v",
        F.first("v", ignorenulls=True).over(w).alias("bfill"),
    )
    return (
        filled.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias(
                "n_missing"
            ),
            F.sum(
                F.when(F.col("bfill").isNull(), 1).otherwise(0)
            ).alias("n_unfillable"),
            F.sum(F.coalesce("bfill", F.lit(0))).alias("bfill_sum"),
        )
        .orderBy("prio")
    )


# ------ 2.12 composite: ABC class migration (policy churn) matrix

_ABCMIG_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS pk, year(l_shipdate) AS yr,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
  GROUP BY 1, 2
),
classed AS (
  SELECT pk, yr,
         CASE WHEN CAST(SUM(rev) OVER (PARTITION BY yr
                                       ORDER BY rev DESC, pk) AS HUGEINT)
                   * 100 <= CAST(SUM(rev) OVER (PARTITION BY yr)
                                 AS HUGEINT) * 80 THEN 'A'
              WHEN CAST(SUM(rev) OVER (PARTITION BY yr
                                       ORDER BY rev DESC, pk) AS HUGEINT)
                   * 100 <= CAST(SUM(rev) OVER (PARTITION BY yr)
                                 AS HUGEINT) * 95 THEN 'B'
              ELSE 'C' END AS cls
  FROM per_part
),
mig AS (
  SELECT a.cls AS cls_1996, b.cls AS cls_1997
  FROM classed a JOIN classed b ON b.pk = a.pk
  WHERE a.yr = 1996 AND b.yr = 1997
)
SELECT cls_1996, cls_1997,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count(*) * 10000 // (SELECT count(*) FROM mig) AS BIGINT)
         AS share_bps
FROM mig GROUP BY cls_1996, cls_1997 ORDER BY cls_1996, cls_1997
"""


@query("wl_abc_class_migration", "2.12 composite workloads", _ABCMIG_ORACLE)
def wl_abc_class_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC class migration — the policy-churn matrix planners complain
    about (every A→C demotion re-plans a stocking policy): parts
    classified per YEAR by the cumulative-revenue 80/95 integer cuts
    (the wl_abc_xyz_matrix device, applied twice), then the 3×3
    transition census between 1996 and 1997 with shares in exact bps.
    A diagonal-heavy matrix means stable policies; heavy off-diagonals
    mean the classification drives thrash, not decisions.

    Scale shape: one keyed two-year revenue agg; per-year cumulative
    passes order the part-grain table; the migration join is
    part-keyed between two class tables."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1996, 1997)
    )
    per_part = li.groupBy(
        F.col("l_partkey").alias("pk"), F.year("l_shipdate").alias("yr")
    ).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            ).cast("long")
        ).alias("rev")
    )
    wy = Window.partitionBy("yr")
    wcum = wy.orderBy(F.col("rev").desc(), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    classed = per_part.select(
        "pk",
        "yr",
        F.when(
            F.sum("rev").over(wcum).cast("decimal(38,0)") * 100
            <= F.sum("rev").over(wy).cast("decimal(38,0)") * 80,
            "A",
        )
        .when(
            F.sum("rev").over(wcum).cast("decimal(38,0)") * 100
            <= F.sum("rev").over(wy).cast("decimal(38,0)") * 95,
            "B",
        )
        .otherwise("C")
        .alias("cls"),
    )
    a = classed.where(F.col("yr") == 1996).select(
        F.col("pk").alias("pa"), F.col("cls").alias("cls_1996")
    )
    b = classed.where(F.col("yr") == 1997).select(
        F.col("pk").alias("pb"), F.col("cls").alias("cls_1997")
    )
    mig = a.join(b, a.pa == b.pb).select("cls_1996", "cls_1997")
    tot = mig.agg(F.count(F.lit(1)).alias("t"))
    return (
        mig.crossJoin(F.broadcast(tot))
        .groupBy("cls_1996", "cls_1997")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr("count(*) * 10000 DIV max(t)").alias("share_bps"),
        )
        .orderBy("cls_1996", "cls_1997")
    )
