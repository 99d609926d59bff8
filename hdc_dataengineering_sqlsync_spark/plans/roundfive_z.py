"""SURVEY.md §2 round-5 additions, batch II.

Price-index family (Laspeyres / Paasche / Fisher) over a common basket.
Registered after ``roundfive_y`` (plans/__init__.py) so the qids append
to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Fisher = sqrt(L * P): the ONE double expression, shared verbatim.
_FISHER = (
    "round(sqrt(cast(laspeyres_bps as double) * cast(paasche_bps as double))"
    " / 10000.0, 4)"
)

_PRICE_INDEX_ORACLE = f"""
WITH pp AS (
  SELECT l_partkey,
         year(l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
  GROUP BY l_partkey, yr
),
basket AS (
  SELECT b.l_partkey,
         b.q AS q0, b.c * 1000 // b.q AS p0m,
         t.q AS q1, t.c * 1000 // t.q AS p1m
  FROM pp b JOIN pp t ON b.l_partkey = t.l_partkey
  WHERE b.yr = 1996 AND t.yr = 1997
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(p1m * q0) * 10000 // SUM(p0m * q0) AS laspeyres_bps,
         SUM(p1m * q1) * 10000 // SUM(p0m * q1) AS paasche_bps
  FROM basket
)
SELECT n_parts,
       CAST(laspeyres_bps AS BIGINT) AS laspeyres_bps,
       CAST(paasche_bps AS BIGINT) AS paasche_bps,
       {_FISHER} AS fisher_index
FROM agg
"""


@query("wl_price_index_family", "2.12 composite workloads", _PRICE_INDEX_ORACLE)
def wl_price_index_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices over a common basket.

    The inflation-measurement workhorse: over parts sold in BOTH 1996
    and 1997, Laspeyres weights price relatives by the BASE-period
    basket (Σp₁q₀/Σp₀q₀ — overstates, consumers substitute away),
    Paasche by the CURRENT basket (understates), Fisher is their
    geometric mean. Unit prices quantize to integer milli-cents
    (c*1000 div q — the quantization is part of the metric definition,
    making every index numerator/denominator an EXACT int64 sum and
    the indices integer bps); only Fisher's sqrt lives in double, as a
    shared expression string.

    Scale shape: facts collapse map-side to the (part, year) grain;
    the basket is one self-equi-join on part over the reduced table;
    the indices are a single four-integer aggregate. At 100 TB the
    reduced (part, year) table is the broadcast-or-shuffle decision,
    not the fact stream."""
    pp = (
        load(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate").isin(1996, 1997))
        .groupBy("l_partkey", F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "c"
            ),
        )
    )
    b = pp.where(F.col("yr") == 1996).select(
        "l_partkey",
        F.col("q").alias("q0"),
        F.expr("c * 1000 div q").alias("p0m"),
    )
    t = pp.where(F.col("yr") == 1997).select(
        "l_partkey",
        F.col("q").alias("q1"),
        F.expr("c * 1000 div q").alias("p1m"),
    )
    basket = b.join(t, "l_partkey")
    agg = basket.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.expr("sum(p1m * q0) * 10000 div sum(p0m * q0)").alias("laspeyres_bps"),
        F.expr("sum(p1m * q1) * 10000 div sum(p0m * q1)").alias("paasche_bps"),
    )
    return agg.select(
        "n_parts", "laspeyres_bps", "paasche_bps", F.expr(_FISHER).alias("fisher_index")
    )
