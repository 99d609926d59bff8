"""SURVEY.md §2 round-5 additions, batch KK.

Pairwise correlation matrix from one exact-moment pass. Registered
after ``roundfive_aa`` (plans/__init__.py) so the qids append to the END
of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Pearson r from exact integer moments — ONE expression template
# instantiated per pair, shared verbatim with the oracle (the
# agg_corr_covar_exact discipline, generalized to the matrix).
_R = (
    "round((cast(n as double) * cast(s{a}{b} as double)"
    " - cast(s{a} as double) * cast(s{b} as double))"
    " / (sqrt(cast(n as double) * cast(s{a}{a} as double)"
    "         - cast(s{a} as double) * cast(s{a} as double))"
    "    * sqrt(cast(n as double) * cast(s{b}{b} as double)"
    "           - cast(s{b} as double) * cast(s{b} as double))), 4)"
)

_PAIRS = [("q", "p"), ("q", "d"), ("p", "d")]

_MATRIX_ORACLE_TEMPLATE = """
WITH v AS (
  SELECT CAST(l_quantity AS HUGEINT) AS q,
         CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS HUGEINT) AS p,
         CAST(CAST(round(l_discount * 100, 0) AS BIGINT) AS HUGEINT) AS d
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd,
         SUM(q * q) AS sqq, SUM(p * p) AS spp, SUM(d * d) AS sdd,
         SUM(q * p) AS sqp, SUM(q * d) AS sqd, SUM(p * d) AS spd
  FROM v
)
SELECT * FROM (
  SELECT 'p_d' AS pair, {rpd} AS r FROM m
  UNION ALL
  SELECT 'q_d', {rqd} FROM m
  UNION ALL
  SELECT 'q_p', {rqp} FROM m
) ORDER BY pair
"""

_MATRIX_ORACLE = _MATRIX_ORACLE_TEMPLATE.format(
    rpd=_R.format(a="p", b="d"),
    rqd=_R.format(a="q", b="d"),
    rqp=_R.format(a="q", b="p"),
)


@query("agg_corr_matrix_exact", "2.4 aggregations", _MATRIX_ORACLE)
def agg_corr_matrix_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson matrix for 3 measures from ONE moment pass.

    `agg_corr_covar_exact` does one pair; the matrix form is the scale
    lesson: ALL 9 moments (three sums, three squares, three cross
    products) accumulate in a single map-combinable aggregate — one
    scan, one 1-row reduction — and every pairwise r derives from that
    row. The naive per-pair corr() would scan the fact table C(k,2)
    times. Moments ride DECIMAL(38,0)/HUGEINT (cents² per row ~1e12,
    exact at any scale); each r is the SAME expression template the
    single-pair qid uses, instantiated per pair, shared verbatim with
    the oracle.

    Scale shape: one pass, fixed-size state (10 integers), driver-
    sized final math — the feature-correlation screen over 100 TB
    costs exactly one scan."""
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    v = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("p"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
    )
    m = v.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("q")).alias("sq"),
        F.sum(dec("p")).alias("sp"),
        F.sum(dec("d")).alias("sd"),
        F.sum(dec("q") * F.col("q")).alias("sqq"),
        F.sum(dec("p") * F.col("p")).alias("spp"),
        F.sum(dec("d") * F.col("d")).alias("sdd"),
        F.sum(dec("q") * F.col("p")).alias("sqp"),
        F.sum(dec("q") * F.col("d")).alias("sqd"),
        F.sum(dec("p") * F.col("d")).alias("spd"),
    ).localCheckpoint(eager=True)  # ONE pass materializes the 1-row moments
    rows = []
    for a, b in _PAIRS:
        expr = _R.format(a=a, b=b)
        rows.append(
            m.select(F.lit(f"{a}_{b}").alias("pair"), F.expr(expr).alias("r"))
        )
    out = rows[0]
    for r_df in rows[1:]:
        out = out.unionByName(r_df)
    return out.orderBy("pair")
