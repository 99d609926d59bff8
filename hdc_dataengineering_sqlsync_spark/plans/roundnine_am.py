"""SURVEY.md §2 round-9 batch AM: Arrow-optimized UDTF, concentration
ratios, Apdex score.

  udtf_python_arrow       @udtf(useArrow=True) — the vectorized UDTF path
  wl_concentration_ratios CR1/CR4/CR8 per market, exact bps
  wl_apdex_score          satisfied/tolerating SLA score, exact halves

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.11 UDF surface: Arrow-optimized Python UDTF

_ARROW_UDTF_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 300
),
digits AS (
  SELECT k, generate_subscripts(string_split(CAST(k AS VARCHAR), ''), 1) - 1
           AS pos,
         CAST(unnest(string_split(CAST(k AS VARCHAR), '')) AS BIGINT) AS dig
  FROM src
)
SELECT CAST(count(*) AS BIGINT) AS n_digits,
       CAST(SUM(dig) AS BIGINT) AS digit_sum,
       CAST(SUM((pos + 1) * dig) AS BIGINT) AS weighted_sum,
       CAST(count(DISTINCT k) AS BIGINT) AS n_keys
FROM digits
"""


@query("udtf_python_arrow", "2.11 UDF surface", _ARROW_UDTF_ORACLE)
def udtf_python_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARROW-optimized Python UDTF (@udtf(useArrow=True), Spark 4) —
    same LATERAL semantics as the pickled `udtf_python`, different wire:
    rows cross the Python boundary in Arrow batches instead of pickled
    tuples (the 10–100× rule from udfs.py applied to table functions).
    The function explodes each order key into (position, digit) pairs;
    the census (digit counts, positional weighted sum) must match a
    pure-SQL digit expansion — proving the Arrow path changes the
    transport, never the values.

    Scale shape: LATERAL UDTF fan-out is map-side; the census folds to
    one row; Arrow batching keeps per-row Python overhead amortized."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, dig bigint", useArrow=True)
    class Digits:
        def eval(self, k: int):
            for pos, ch in enumerate(str(k)):
                yield (pos, int(ch))

    spark.udtf.register("digits_arrow_udtf", Digits)
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 300)
        .select(F.col("o_orderkey").alias("k"))
    )
    src.createOrReplaceTempView("arrow_udtf_src_v")
    out = spark.sql(
        "SELECT s.k, d.pos, d.dig FROM arrow_udtf_src_v s,"
        " LATERAL digits_arrow_udtf(s.k) d"
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_digits"),
        F.sum("dig").alias("digit_sum"),
        F.sum((F.col("pos") + 1) * F.col("dig")).alias("weighted_sum"),
        F.countDistinct("k").alias("n_keys"),
    )


# ------ 2.12 composite: CR1/CR4/CR8 concentration ratios per market

_CR_ORACLE = """
WITH rev AS (
  SELECT split_part(p.p_type, ' ', 1) AS market, p.p_brand AS brand,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT market, cents,
         row_number() OVER (PARTITION BY market
                            ORDER BY cents DESC, brand) AS r,
         CAST(SUM(cents) OVER (PARTITION BY market) AS BIGINT) AS tot
  FROM rev
)
SELECT market,
       CAST(count(*) AS BIGINT) AS n_brands,
       CAST(SUM(CASE WHEN r <= 1 THEN cents ELSE 0 END) * 10000
            // max(tot) AS BIGINT) AS cr1_bps,
       CAST(SUM(CASE WHEN r <= 4 THEN cents ELSE 0 END) * 10000
            // max(tot) AS BIGINT) AS cr4_bps,
       CAST(SUM(CASE WHEN r <= 8 THEN cents ELSE 0 END) * 10000
            // max(tot) AS BIGINT) AS cr8_bps
FROM ranked GROUP BY market ORDER BY market
"""


@query("wl_concentration_ratios", "2.12 composite workloads", _CR_ORACLE)
def wl_concentration_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CR-k concentration ratios — the antitrust screen next to
    wl_supplier_hhi: the revenue share of the top 1 / 4 / 8 brands per
    market (CR4 > 60% is the oligopoly rule of thumb), with the top-k
    membership decided by an exact (revenue, brand) rank and every
    share one integral bps division.

    Scale shape: one keyed revenue agg over the broadcast part join;
    rank + shares run on the ~30-row (market, brand) table."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("market"),
        F.col("p_brand").alias("brand"),
    )
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("market", "brand")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                ).cast("long")
            ).alias("cents")
        )
    )
    wp = Window.partitionBy("market")
    ranked = rev.select(
        "market",
        "cents",
        F.row_number()
        .over(wp.orderBy(F.col("cents").desc(), "brand"))
        .alias("r"),
        F.sum("cents").over(wp).alias("tot"),
    )
    return (
        ranked.groupBy("market")
        .agg(
            F.count(F.lit(1)).alias("n_brands"),
            F.expr(
                "SUM(CASE WHEN r <= 1 THEN cents ELSE 0 END) * 10000"
                " DIV max(tot)"
            ).alias("cr1_bps"),
            F.expr(
                "SUM(CASE WHEN r <= 4 THEN cents ELSE 0 END) * 10000"
                " DIV max(tot)"
            ).alias("cr4_bps"),
            F.expr(
                "SUM(CASE WHEN r <= 8 THEN cents ELSE 0 END) * 10000"
                " DIV max(tot)"
            ).alias("cr8_bps"),
        )
        .orderBy("market")
    )


# ------ 2.12 composite: Apdex score (satisfied / tolerating / frustrated)

_APDEX_ORACLE = """
WITH lat AS (
  SELECT event_type,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS ms
  FROM events WHERE value >= 0
),
classed AS (
  SELECT event_type,
         CASE WHEN ms <= 500 THEN 1 ELSE 0 END AS sat,
         CASE WHEN ms > 500 AND ms <= 2000 THEN 1 ELSE 0 END AS tol
  FROM lat
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(sat) AS BIGINT) AS n_satisfied,
       CAST(SUM(tol) AS BIGINT) AS n_tolerating,
       CAST((2 * SUM(sat) + SUM(tol)) * 10000 // (2 * count(*)) AS BIGINT)
         AS apdex_e4
FROM classed GROUP BY event_type ORDER BY event_type
"""


@query("wl_apdex_score", "2.12 composite workloads", _APDEX_ORACLE)
def wl_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex — the SRE satisfaction score (satisfied + tolerating/2)/n
    with thresholds T=500ms and 4T=2s over the event latency proxy: the
    half-credit is cleared by scaling the WHOLE ratio ×2
    ((2·sat + tol)/(2n)) so the score lands on the exact e4 grid with
    one integral division — no 0.5 ever floats. Latencies quantize to
    integer milliseconds first (floor(+0.5), the cents device).

    Scale shape: classification is map-side scalar work; one keyed
    3-moment census per event type."""
    lat = (
        load(spark, sf_dir, "events")
        .where(F.col("value") >= 0)
        .select(
            "event_type",
            F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("ms"),
        )
    )
    classed = lat.select(
        "event_type",
        F.when(F.col("ms") <= 500, 1).otherwise(0).alias("sat"),
        F.when((F.col("ms") > 500) & (F.col("ms") <= 2000), 1)
        .otherwise(0)
        .alias("tol"),
    )
    return (
        classed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("sat").alias("n_satisfied"),
            F.sum("tol").alias("n_tolerating"),
            F.expr(
                "(2 * SUM(sat) + SUM(tol)) * 10000 DIV (2 * count(*))"
            ).alias("apdex_e4"),
        )
        .orderBy("event_type")
    )
