"""SURVEY.md §2 round-9 batch AP: Ljung–Box whiteness test,
decorate-sort-undecorate arrays, positional token profile.

  ts_ljung_box_q        portmanteau whiteness test from integer ACF
  fn_array_sort_by_key  sort-by-derived-key via struct decoration
  text_positional_profile  stopword mass by document third

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.10 time series: Ljung–Box Q over exact integer ACF

_LB_LAGS = 5

_LB_ORACLE = f"""
WITH daily AS (
  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM lineitem WHERE year(l_shipdate) = 1995
  GROUP BY 1, 2
),
seq AS (
  SELECT flag, x,
         row_number() OVER (PARTITION BY flag ORDER BY d) AS t,
         CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS n,
         CAST(SUM(x) OVER (PARTITION BY flag) AS HUGEINT) AS s
  FROM daily
),
dev AS (
  SELECT flag, t, n, CAST(n AS HUGEINT) * x - s AS e
  FROM seq
),
corr AS (
  SELECT d1.flag, d1.n, lag.k,
         CAST(SUM(d1.e * d2.e) AS HUGEINT) AS num,
         CAST((SELECT SUM(e * e) FROM dev dd
               WHERE dd.flag = d1.flag) AS HUGEINT) AS den
  FROM dev d1
  JOIN (SELECT unnest(range(1, {_LB_LAGS + 1})) AS k) lag ON true
  JOIN dev d2 ON d2.flag = d1.flag AND d2.t = d1.t - lag.k
  GROUP BY d1.flag, d1.n, lag.k
),
re6 AS (
  SELECT flag, n, k,
         CAST(num * 1000000 // den AS BIGINT) AS r_e6
  FROM corr
),
wide AS (
  SELECT flag, max(n) AS n,
         max(CASE WHEN k = 1 THEN r_e6 END) AS r1,
         max(CASE WHEN k = 2 THEN r_e6 END) AS r2,
         max(CASE WHEN k = 3 THEN r_e6 END) AS r3,
         max(CASE WHEN k = 4 THEN r_e6 END) AS r4,
         max(CASE WHEN k = 5 THEN r_e6 END) AS r5
  FROM re6 GROUP BY flag
)
SELECT flag, CAST(n AS BIGINT) AS n_days, r1, r2, r3, r4, r5,
       round(CAST(n AS DOUBLE) * (n + 2) * (
         (CAST(r1 AS DOUBLE) / 1e6) * (CAST(r1 AS DOUBLE) / 1e6) / (n - 1)
         + (CAST(r2 AS DOUBLE) / 1e6) * (CAST(r2 AS DOUBLE) / 1e6) / (n - 2)
         + (CAST(r3 AS DOUBLE) / 1e6) * (CAST(r3 AS DOUBLE) / 1e6) / (n - 3)
         + (CAST(r4 AS DOUBLE) / 1e6) * (CAST(r4 AS DOUBLE) / 1e6) / (n - 4)
         + (CAST(r5 AS DOUBLE) / 1e6) * (CAST(r5 AS DOUBLE) / 1e6) / (n - 5)
       ), 4) AS ljung_box_q
FROM wide ORDER BY flag
"""


@query("ts_ljung_box_q", "2.10 streaming/time series", _LB_ORACLE)
def ts_ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box Q — the portmanteau whiteness test (is anything LEFT in
    the residuals?) every forecasting pipeline runs after fitting: Q =
    n(n+2)Σ r_k²/(n−k) over lags 1–5 of the 1995 daily revenue series
    per flag. Each ACF r_k is an exact integer ratio first (centered
    deviations scaled by n: n·x−S stays integral — the ts_acf_lags
    device), quantized to the e6 grid with an integral division, and Q
    closes in ONE fixed-shape float expression over the five integer
    r's (a fixed expression tree, not a float SUM over rows, so the
    addition order is identical in both engines), 4dp.

    Scale shape: the day grid reduces map-side; lag products are per-
    series window joins over ≤365 rows; the lag pivot and Q are scalar
    work on 3 rows."""
    li = load(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1995)
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").cast("date").alias("d"),
    ).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        ).alias("x")
    )
    wp = Window.partitionBy("flag")
    seq = daily.select(
        "flag",
        "x",
        F.row_number().over(wp.orderBy("d")).alias("t"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("x").over(wp).cast("decimal(38,0)").alias("s"),
    )
    dev = seq.select(
        "flag",
        "t",
        "n",
        (F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s")).alias(
            "e"
        ),
    )
    den = dev.groupBy("flag").agg(
        F.sum(F.col("e") * F.col("e")).alias("den")
    )
    lags = spark.range(1, _LB_LAGS + 1).select(F.col("id").alias("k"))
    d1 = dev.select(
        F.col("flag").alias("f1"), F.col("t").alias("t1"),
        F.col("n").alias("n1"), F.col("e").alias("e1"),
    )
    d2 = dev.select(
        F.col("flag").alias("f2"), F.col("t").alias("t2"),
        F.col("e").alias("e2"),
    )
    corr = (
        d1.crossJoin(F.broadcast(lags))
        .join(d2, (F.col("f2") == F.col("f1")) & (F.col("t2") == F.col("t1") - F.col("k")))
        .groupBy(F.col("f1").alias("flag"), F.col("n1").alias("n"), "k")
        .agg(F.sum(F.col("e1") * F.col("e2")).alias("num"))
        .join(den, "flag")
    )
    re6 = corr.select(
        "flag",
        "n",
        "k",
        F.expr("CAST(num * 1000000 DIV den AS BIGINT)").alias("r_e6"),
    )
    wide = re6.groupBy("flag").agg(
        F.max("n").alias("n"),
        *[
            F.max(F.when(F.col("k") == k, F.col("r_e6"))).alias(f"r{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    nd = F.col("n").cast("double")
    q = nd * (F.col("n") + 2) * sum(
        (F.col(f"r{k}").cast("double") / 1e6)
        * (F.col(f"r{k}").cast("double") / 1e6)
        / (F.col("n") - k)
        for k in range(1, _LB_LAGS + 1)
    )
    return wide.select(
        "flag",
        F.col("n").cast("long").alias("n_days"),
        "r1",
        "r2",
        "r3",
        "r4",
        "r5",
        F.round(q, 4).alias("ljung_box_q"),
    ).orderBy("flag")


# ------ 2.7 scalar functions: decorate-sort-undecorate array sorting

_DSU_ORACLE = """
WITH src AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id % 17 = 3
),
sorted_ AS (
  SELECT doc_id,
         list_transform(
           list_sort(list_transform(
             list_filter(toks, w -> w <> ''),
             w -> {'k1': len(w), 'k2': w})),
           s -> s.k2) AS by_len
  FROM src
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(by_len)) AS BIGINT) AS n_tokens,
       CAST(SUM(len(by_len[1])) AS BIGINT) AS first_len_sum,
       CAST(SUM(len(by_len[-1])) AS BIGINT) AS last_len_sum,
       min(md5(array_to_string(by_len, ','))) AS min_digest
FROM sorted_
"""


@query("fn_array_sort_by_key", "2.7 scalar functions", _DSU_ORACLE)
def fn_array_sort_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorate-sort-undecorate — sorting an array by a DERIVED key
    (here (length, value)) without a comparator lambda: decorate each
    element into a struct whose field order IS the sort key, sort the
    struct array (both engines order structs lexicographically by
    field — probed), then project the element back. The census checks
    shortest-first/longest-last totals and an md5 digest of the fully
    sorted sequence, so any tie-break or stability difference
    mismatches.

    Scale shape: entirely map-side array work; one census row."""
    src = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 17 == 3)
        .select(
            F.expr(
                "transform(array_sort(transform("
                "  filter(split(text, ' '), w -> w <> ''),"
                "  w -> struct(length(w) AS k1, w AS k2))),"
                " s -> s.k2)"
            ).alias("by_len")
        )
    )
    return src.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("by_len")).cast("long").alias("n_tokens"),
        F.sum(F.length(F.col("by_len").getItem(0)))
        .cast("long")
        .alias("first_len_sum"),
        F.sum(F.length(F.element_at("by_len", -1)))
        .cast("long")
        .alias("last_len_sum"),
        F.min(F.md5(F.array_join("by_len", ","))).alias("min_digest"),
    )


# ------ 2.9 llm-data: positional token profile (boilerplate zones)

_POS_ORACLE = """
WITH tok AS (
  SELECT source, doc_id, w, i,
         count(*) OVER (PARTITION BY doc_id) AS ntok
  FROM (
    SELECT source, doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
  ) WHERE w <> ''
),
zoned AS (
  SELECT source,
         CASE WHEN 3 * (i - 1) < ntok THEN 'head'
              WHEN 3 * (i - 1) < 2 * ntok THEN 'body'
              ELSE 'tail' END AS zone,
         CASE WHEN w IN ('the', 'of', 'and', 'a', 'to') THEN 1 ELSE 0 END
           AS stop
  FROM tok
)
SELECT source, zone,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(stop) AS BIGINT) AS n_stopwords,
       CAST(SUM(stop) * 10000 // count(*) AS BIGINT) AS stop_bps
FROM zoned GROUP BY source, zone ORDER BY source, zone
"""


@query("text_positional_profile", "2.9 llm-data", _POS_ORACLE)
def text_positional_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional token profile — WHERE in documents the filler lives:
    token mass and stopword share split by document third (head/body/
    tail, integer boundary test 3·(i−1) < k·n — no float thirds), the
    zone profile boilerplate strippers read before choosing what to cut
    (navigation lives in heads, signatures in tails). Exact bps per
    (source, zone).

    Scale shape: tokenize with positions map-side; per-doc counts via
    one window; the zone census folds on (source, zone) cells."""
    raw = (
        load(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("i0", "w"),
        )
        .where(F.col("w") != "")
        .select("source", "doc_id", (F.col("i0") + 1).alias("i"), "w")
    )
    tok = raw.withColumn(
        "ntok", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    zoned = tok.select(
        "source",
        F.when(3 * (F.col("i") - 1) < F.col("ntok"), "head")
        .when(3 * (F.col("i") - 1) < 2 * F.col("ntok"), "body")
        .otherwise("tail")
        .alias("zone"),
        F.when(F.col("w").isin("the", "of", "and", "a", "to"), 1)
        .otherwise(0)
        .alias("stop"),
    )
    return (
        zoned.groupBy("source", "zone")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("stop").alias("n_stopwords"),
            F.expr("SUM(stop) * 10000 DIV count(*)").alias("stop_bps"),
        )
        .orderBy("source", "zone")
    )
