"""SURVEY.md §2 round-9 batch P: Croston intermittent-demand forecasting,
code-vs-prose corpus detection, bullwhip variance amplification.

  ts_croston_intermittent  sparse-demand smoother over a zero-filled calendar
  text_code_detect         symbol/indent heuristics for code filtering
  wl_bullwhip_ratio        order-vs-demand variance amplification per family

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ----- 2.10 time series: Croston's method for intermittent demand

# Croston updates ONLY on demand periods: z' = (2·d + 8·z) div 10 (demand
# size), q' = (2·i + 8·q) div 10 (inter-demand interval, i = periods since
# the previous demand); forecast per period = z·1000 div q in milli-units.
# Initialized at the first demand (z = d, q = i where the first interval is
# the first demand's 1-based day index). Exact trunc-division recursion on
# both engines — the Holt discipline applied to SPARSE series, where EWMA
# or Holt over the zero-filled series systematically under-forecasts.

_CROSTON_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT p.p_brand AS brand,
         CAST(datediff('day', DATE '1994-12-31', l.l_shipdate) AS BIGINT)
           AS day_ix,
         SUM(CAST(l.l_quantity AS BIGINT)) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) = 1995 AND p.p_size <= 2
  GROUP BY 1, 2
),
demands AS (
  -- intervals are day-index gaps between consecutive DEMAND days; the
  -- zero days never materialize (they would only pad a dense spine)
  SELECT brand, day_ix, qty,
         CAST(row_number() OVER (PARTITION BY brand ORDER BY day_ix)
              AS BIGINT) AS k,
         day_ix - coalesce(lag(day_ix) OVER (
           PARTITION BY brand ORDER BY day_ix), 0) AS gap
  FROM daily
),
r AS (
  SELECT brand, k, CAST(qty AS BIGINT) AS z, CAST(gap AS BIGINT) AS q
  FROM demands WHERE k = 1
  UNION ALL
  SELECT d.brand, d.k,
         (2 * d.qty + 8 * r.z) // 10,
         (2 * d.gap + 8 * r.q) // 10
  FROM r JOIN demands d ON d.brand = r.brand AND d.k = r.k + 1
),
last AS (SELECT brand, max(k) AS n FROM r GROUP BY brand)
SELECT r.brand,
       CAST(l.n AS BIGINT) AS n_demands,
       CAST(r.z AS BIGINT) AS size_units,
       CAST(r.q AS BIGINT) AS interval_days,
       CAST(r.z * 1000 // r.q AS BIGINT) AS rate_milliunits_per_day
FROM r JOIN last l ON l.brand = r.brand AND r.k = l.n
ORDER BY r.brand
"""

_CROSTON_SCHEMA = T.StructType(
    [
        T.StructField("brand", T.StringType()),
        T.StructField("n_demands", T.LongType()),
        T.StructField("size_units", T.LongType()),
        T.StructField("interval_days", T.LongType()),
        T.StructField("rate_milliunits_per_day", T.LongType()),
    ]
)


def _croston_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("day_ix")
    days = [int(v) for v in pdf["day_ix"]]
    qtys = [int(v) for v in pdf["qty"]]

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    z, q, prev = qtys[0], days[0], days[0]
    for d, x in zip(days[1:], qtys[1:]):
        gap = d - prev
        z = tdiv(2 * x + 8 * z, 10)
        q = tdiv(2 * gap + 8 * q, 10)
        prev = d
    return pd.DataFrame(
        {
            "brand": [pdf["brand"].iloc[0]],
            "n_demands": [len(days)],
            "size_units": [z],
            "interval_days": [q],
            "rate_milliunits_per_day": [z * 1000 // q],
        }
    )


@query("ts_croston_intermittent", "2.10 streaming/time series", _CROSTON_ORACLE)
def ts_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method — THE forecasting recursion for INTERMITTENT
    demand (slow movers: many zero days), where EWMA/Holt over the
    zero-filled series systematically under-forecast: demand SIZE and
    inter-demand INTERVAL are smoothed separately, updating only on
    demand days, and the rate forecast is size/interval. Exact integer
    recursion (α=0.2 rational, trunc-division both engines) over the
    1995 daily demand of the slow-mover parts (p_size ≤ 2), the oracle
    as a recursive CTE over the demand sequence.

    Scale shape: the fact scan reduces map-side to (brand, day) cells;
    only DEMAND days enter the recursion — intervals are day-index gaps,
    so the zero days never materialize at all; the per-series loop runs
    in one Arrow batch via applyInPandas, parallel across series."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_size") <= 2).select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    daily = (
        li.where(F.year("l_shipdate") == 1995)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("brand", F.col("l_shipdate").alias("d"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .select(
            "brand",
            F.datediff("d", F.lit("1994-12-31")).cast("long").alias("day_ix"),
            "qty",
        )
    )
    return (
        daily.groupBy("brand")
        .applyInPandas(_croston_group, schema=_CROSTON_SCHEMA)
        .orderBy("brand")
    )


# ------ 2.9 llm-data: code-vs-prose detection (corpus filtering)

_CODE_ORACLE = r"""
WITH feat AS (
  SELECT source,
         length(text) AS n,
         length(regexp_replace(text, '[^{}()\[\];=<>|&]', '', 'g')) AS n_sym,
         length(regexp_replace(text, '[^.!?,]', '', 'g')) AS n_punct
  FROM documents WHERE length(text) > 0
),
flags AS (
  SELECT source,
         CASE WHEN n_sym * 1000 > n * 15 AND n_sym > n_punct
              THEN 1 ELSE 0 END AS looks_code
  FROM feat
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(looks_code) AS BIGINT) AS n_code,
       CAST(SUM(looks_code) * 10000 // count(*) AS BIGINT) AS code_share_bps
FROM flags GROUP BY source ORDER BY source
"""


@query("text_code_detect", "2.9 llm-data", _CODE_ORACLE)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection — the corpus-routing filter an LLM data
    pipeline runs before language-specific processing: a document 'looks
    like code' when its code-symbol density ({}()[];=<>|&) clears 1.5%
    of characters AND beats its prose-punctuation count — pure integer
    threshold tests (density cross-multiplied, never a float ratio) over
    regex counts that both engines compute identically. Reported as the
    per-source census in bps, the number that decides routing
    proportions.

    Scale shape: the features are codegen regexp work per document (no
    UDF, no shuffle until the per-source rollup); the census is one
    map-side-combinable keyed agg."""
    d = load(spark, sf_dir, "documents").where(F.length("text") > 0)
    feat = d.select(
        "source",
        F.length("text").alias("n"),
        F.length(F.regexp_replace("text", r"[^{}()\[\];=<>|&]", "")).alias(
            "n_sym"
        ),
        F.length(F.regexp_replace("text", r"[^.!?,]", "")).alias("n_punct"),
    )
    flags = feat.select(
        "source",
        F.when(
            (F.col("n_sym") * 1000 > F.col("n") * 15)
            & (F.col("n_sym") > F.col("n_punct")),
            1,
        )
        .otherwise(0)
        .alias("looks_code"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("looks_code").alias("n_code"),
            F.expr("sum(looks_code) * 10000 DIV count(*)").alias(
                "code_share_bps"
            ),
        )
        .orderBy("source")
    )


# ----- 2.12 composite: bullwhip ratio (variance amplification)

# var ratio in e4 fixed-point, computed from exact wide-integer moments:
#   var_e4(x) ∝ n·Σx² − (Σx)²  (same n both series, so the ratio of the
#   raw cross-multiplied terms IS the variance ratio — no division by
#   n(n−1) ever happens, it cancels).

_BULLWHIP_ORACLE = """
WITH monthly AS (
  SELECT p.p_brand AS brand, date_trunc('month', l.l_shipdate) AS mon,
         SUM(CAST(l.l_quantity AS BIGINT)) AS shipped,
         SUM(CAST(l.l_quantity AS BIGINT)
             * CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 2 ELSE 1 END) AS ordered
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
mom AS (
  SELECT brand,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(SUM(shipped) AS HUGEINT) AS s1,
         CAST(SUM(shipped * shipped) AS HUGEINT) AS s2,
         CAST(SUM(ordered) AS HUGEINT) AS o1,
         CAST(SUM(ordered * ordered) AS HUGEINT) AS o2
  FROM monthly GROUP BY brand
)
SELECT brand, CAST(n AS BIGINT) AS n_months,
       CAST((n * o2 - o1 * o1) * 10000 // (n * s2 - s1 * s1) AS BIGINT)
         AS bullwhip_e4
FROM mom WHERE n * s2 > s1 * s1 ORDER BY brand
"""


@query("wl_bullwhip_ratio", "2.12 composite workloads", _BULLWHIP_ORACLE)
def wl_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip ratio — the supply-chain KPI measuring how demand
    variance AMPLIFIES upstream: var(orders placed) / var(demand
    shipped) per brand over monthly series (here the order signal
    up-weights urgent-priority lines — the over-ordering reflex the
    metric exists to expose). Both variances come from ONE pass of exact
    wide-integer moments, and because both series share n, the
    normalization cancels: the e4 ratio is (n·Σo²−(Σo)²) div
    (n·Σs²−(Σs)²) — one integral division, no float variance anywhere.

    Scale shape: one three-table join (dims broadcast), month-grain
    map-side reduction, then a single keyed moment agg — the
    `agg_corr_matrix_exact` discipline pointed at a ratio instead of a
    correlation."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", F.col("l_quantity").cast("long").alias("qty"),
        "l_shipdate",
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    p = load(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("brand"))
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("brand", F.date_trunc("month", "l_shipdate").alias("mon"))
        .agg(
            F.sum("qty").alias("shipped"),
            F.sum(
                F.col("qty")
                * F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 2
                ).otherwise(1)
            ).alias("ordered"),
        )
    )
    mom = monthly.groupBy("brand").agg(
        F.expr("CAST(count(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(sum(shipped) AS DECIMAL(38,0))").alias("s1"),
        F.expr("CAST(sum(shipped * shipped) AS DECIMAL(38,0))").alias("s2"),
        F.expr("CAST(sum(ordered) AS DECIMAL(38,0))").alias("o1"),
        F.expr("CAST(sum(ordered * ordered) AS DECIMAL(38,0))").alias("o2"),
    )
    return (
        mom.where(F.expr("n * s2 > s1 * s1"))
        .select(
            "brand",
            F.expr("CAST(n AS BIGINT)").alias("n_months"),
            F.expr(
                "CAST((n * o2 - o1 * o1) * 10000"
                " DIV (n * s2 - s1 * s1) AS BIGINT)"
            ).alias("bullwhip_e4"),
        )
        .orderBy("brand")
    )
