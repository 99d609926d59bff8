"""SURVEY.md §2 round-9 batch AN: walk-forward evaluation, greatest/least
null contract, dataset datasheet.

  ts_walk_forward_eval       per-fold seasonal-naive WAPE — the TS CV harness
  fn_greatest_null_contract  null-SKIPPING variadic extremes, pinned
  mix_dataset_datasheet      the one-row corpus datasheet

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.10 time series: walk-forward (rolling-origin) evaluation

_WF_ORACLE = """
WITH monthly AS (
  SELECT year(l_shipdate) AS yr, month(l_shipdate) AS m,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem WHERE year(l_shipdate) BETWEEN 1993 AND 1997
  GROUP BY 1, 2
),
folds AS (
  SELECT t.yr AS test_year,
         CAST(SUM(abs(t.cents - b.cents)) AS BIGINT) AS abs_err,
         CAST(SUM(t.cents) AS BIGINT) AS actual
  FROM monthly t JOIN monthly b ON b.yr = t.yr - 1 AND b.m = t.m
  WHERE t.yr BETWEEN 1994 AND 1997
  GROUP BY t.yr
)
SELECT CAST(test_year AS INT) AS test_year, abs_err, actual,
       CAST(abs_err * 10000 // actual AS BIGINT) AS wape_bps
FROM folds ORDER BY test_year
"""


@query("ts_walk_forward_eval", "2.10 streaming/time series", _WF_ORACLE)
def ts_walk_forward_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward (rolling-origin) evaluation — the only honest way to
    score a forecaster on time series (a random split leaks the
    future): four folds, each scoring the seasonal-naive forecast
    (month value = same month last year) against the NEXT year, WAPE
    per fold in exact integer bps. A single aggregate WAPE
    (ts_forecast_wape) hides drift; the fold curve shows whether the
    naive's error is stable or decaying — the baseline any real model
    must beat fold-by-fold, not merely on average.

    Scale shape: the month-grain census reduces map-side once and every
    fold reads from it via one self-join on (year−1, month) — folds
    share the scan instead of re-reading the fact per fold."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").between(1993, 1997)
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
        .where(F.col("tyr").between(1994, 1997))
        .groupBy(F.col("tyr").cast("int").alias("test_year"))
        .agg(
            F.sum(F.abs(F.col("tc") - F.col("bc"))).alias("abs_err"),
            F.sum("tc").alias("actual"),
        )
    )
    return folds.select(
        "test_year",
        "abs_err",
        "actual",
        F.expr("abs_err * 10000 DIV actual").alias("wape_bps"),
    ).orderBy("test_year")


# ------ 2.7 scalar functions: greatest/least null-skipping contract

_GL_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE o_orderkey % 97 END AS a,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE o_orderkey % 89 END AS b,
         CASE WHEN o_orderkey % 15 = 0 THEN NULL
              ELSE o_orderkey % 83 END AS c
  FROM orders WHERE o_orderkey <= 900
),
g AS (
  SELECT k, greatest(a, b, c) AS g, least(a, b, c) AS l,
         CASE WHEN a IS NULL AND b IS NULL AND c IS NULL THEN 1 ELSE 0 END
           AS all_null
  FROM src
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_greatest,
       CAST(SUM(all_null) AS BIGINT) AS n_all_null,
       CAST(SUM(COALESCE(g, 0)) AS BIGINT) AS greatest_sum,
       CAST(SUM(COALESCE(l, 0)) AS BIGINT) AS least_sum
FROM g
"""


@query("fn_greatest_null_contract", "2.7 scalar functions", _GL_ORACLE)
def fn_greatest_null_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The greatest/least null contract, pinned: Spark AND DuckDB SKIP
    nulls (greatest(1, NULL, 3) = 3) and return NULL only when every
    argument is null — agreeing with each other but NOT with the SQL
    standard's strict form (where any NULL poisons the result; several
    engines follow that). The census proves n_null_greatest equals
    exactly the all-arguments-null count — the skip semantics, row by
    row — plus value sums over a three-way null-residue fixture.

    Scale shape: generation + variadic extremes are map-side; one
    census row."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 900)
        .select(
            F.expr(
                "CASE WHEN o_orderkey % 3 = 0 THEN NULL"
                " ELSE o_orderkey % 97 END"
            ).alias("a"),
            F.expr(
                "CASE WHEN o_orderkey % 5 = 0 THEN NULL"
                " ELSE o_orderkey % 89 END"
            ).alias("b"),
            F.expr(
                "CASE WHEN o_orderkey % 15 = 0 THEN NULL"
                " ELSE o_orderkey % 83 END"
            ).alias("c"),
        )
    )
    g = src.select(
        F.greatest("a", "b", "c").alias("g"),
        F.least("a", "b", "c").alias("l"),
        F.when(
            F.col("a").isNull() & F.col("b").isNull() & F.col("c").isNull(),
            1,
        )
        .otherwise(0)
        .alias("all_null"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("g").isNull(), 1).otherwise(0)).alias(
            "n_null_greatest"
        ),
        F.sum("all_null").alias("n_all_null"),
        F.sum(F.coalesce("g", F.lit(0))).alias("greatest_sum"),
        F.sum(F.coalesce("l", F.lit(0))).alias("least_sum"),
    )


# ------ 2.9 llm-data: the one-row dataset datasheet

_DATASHEET_ORACLE = """
WITH tok AS (
  SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS w
  FROM documents
),
tok_f AS (SELECT * FROM tok WHERE w <> ''),
doc_stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS ntok
  FROM tok_f GROUP BY doc_id
),
dups AS (
  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY md5(text)
)
SELECT
  CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
  CAST((SELECT SUM(ntok) FROM doc_stats) AS BIGINT) AS n_tokens,
  CAST((SELECT count(DISTINCT w) FROM tok_f) AS BIGINT) AS vocab,
  CAST((SELECT count(DISTINCT source) FROM documents) AS BIGINT)
    AS n_sources,
  CAST((SELECT count(DISTINCT lang) FROM documents) AS BIGINT) AS n_langs,
  CAST((SELECT SUM(ntok) * 1000 // count(*) FROM doc_stats) AS BIGINT)
    AS mean_doc_tokens_milli,
  CAST((SELECT SUM(c - 1) FROM dups) AS BIGINT) AS n_exact_dup_docs,
  CAST((SELECT SUM(c - 1) * 10000 // SUM(c) FROM dups) AS BIGINT)
    AS dup_bps
"""


@query("mix_dataset_datasheet", "2.9 llm-data", _DATASHEET_ORACLE)
def mix_dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset datasheet — the one-row summary every corpus release
    ships (Datasheets-for-Datasets): doc/token/vocab counts, source and
    language coverage, exact mean document length (milli-tokens,
    integral), and the exact-duplicate rate by full-text md5 — eight
    headline numbers, every one exactly reproducible, which is what
    makes a datasheet auditable rather than decorative.

    Scale shape: ONE tokenize pass feeds the token/vocab/mean stats;
    the dup census is one md5-keyed count; all folds map-side
    combinable; one row out."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    doc_stats = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ntok"))
    tok_stats = doc_stats.agg(
        F.sum("ntok").alias("n_tokens"),
        F.expr("SUM(ntok) * 1000 DIV count(*)").alias(
            "mean_doc_tokens_milli"
        ),
    )
    vocab = tok.agg(F.countDistinct("w").alias("vocab"))
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
    )
    dups = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") - 1).alias("n_exact_dup_docs"),
            F.expr("SUM(c - 1) * 10000 DIV SUM(c)").alias("dup_bps"),
        )
    )
    return (
        base.crossJoin(tok_stats)
        .crossJoin(vocab)
        .crossJoin(dups)
        .select(
            "n_docs",
            "n_tokens",
            "vocab",
            "n_sources",
            "n_langs",
            "mean_doc_tokens_milli",
            "n_exact_dup_docs",
            "dup_bps",
        )
    )
