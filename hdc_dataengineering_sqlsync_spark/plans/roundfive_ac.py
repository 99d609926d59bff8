"""SURVEY.md §2 round-5 additions, batch LL.

Rank statistics and lagged series correlation: Spearman rank correlation
via exact doubled average ranks, and a cross-correlation function over
the reduced daily series at multiple lags. Registered after
``roundfive_ab`` (plans/__init__.py) so the qids append to the END of
the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Pearson r over EXACT integer series (same discipline as
# agg_corr_matrix_exact): one expression template shared verbatim with
# the oracle. Inputs are the 6 moment columns n, sx, sy, sxx, syy, sxy.
_PEARSON = (
    "round((cast(n as double) * cast(sxy as double)"
    " - cast(sx as double) * cast(sy as double))"
    " / (sqrt(cast(n as double) * cast(sxx as double)"
    "         - cast(sx as double) * cast(sx as double))"
    "    * sqrt(cast(n as double) * cast(syy as double)"
    "           - cast(sy as double) * cast(sy as double))), 4)"
)

# Spearman = Pearson over average ranks. Average rank of a tied value =
# min_rank + (ties-1)/2, which is generally a .5 fraction — so both
# engines carry the DOUBLED average rank 2*min_rank + ties - 1, an exact
# integer (Pearson is scale-invariant, the factor 2 cancels). rank() and
# per-value tie counts have identical semantics in Spark and DuckDB, so
# the whole pipeline is integer-exact until the single final division.
_SPEARMAN_ORACLE = f"""
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS d
  FROM lineitem
),
r AS (
  SELECT flag,
         CAST(2 * rank() OVER (PARTITION BY flag ORDER BY q)
              + count(*) OVER (PARTITION BY flag, q) - 1 AS HUGEINT) AS rq,
         CAST(2 * rank() OVER (PARTITION BY flag ORDER BY d)
              + count(*) OVER (PARTITION BY flag, d) - 1 AS HUGEINT) AS rd
  FROM v
),
m AS (
  SELECT flag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(rq) AS sx, SUM(rd) AS sy,
         SUM(rq * rq) AS sxx, SUM(rd * rd) AS syy, SUM(rq * rd) AS sxy
  FROM r GROUP BY flag
)
SELECT flag, {_PEARSON} AS rho FROM m ORDER BY flag
"""


@query("agg_spearman_rank", "2.4 aggregations", _SPEARMAN_ORACLE)
def agg_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (quantity vs discount per returnflag).

    Rank statistics are the robust twin of the exact-moment Pearson
    family: outlier-immune, and — the determinism win — the ranks
    themselves are INTEGERS, so the whole correlation is exact until
    one final division. Ties use the standard average-rank convention,
    carried as the doubled rank ``2*min_rank + ties - 1`` (always an
    integer; Pearson's scale invariance cancels the 2).

    Scale shape: two rank windows per group key (each a keyed sort over
    the group's rows — partition-parallel across groups, no global
    sort), then one map-combinable 6-moment aggregate to #groups rows.
    At 100 TB the only heavy op is the per-group sort Spark already
    does for any rank window; state afterwards is 6 integers per group.
    Moments ride DECIMAL(38,0)/HUGEINT (doubled ranks reach ~2n, their
    squares ~4n², times n rows overflows int64 past ~1e6 rows — the
    exact hazard the decimal cast removes)."""
    from pyspark.sql import Window

    v = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
    )
    wq = Window.partitionBy("flag").orderBy("q")
    wd = Window.partitionBy("flag").orderBy("d")
    r = v.select(
        "flag",
        (2 * F.rank().over(wq)
         + F.count(F.lit(1)).over(Window.partitionBy("flag", "q")) - 1)
        .cast("decimal(38,0)").alias("rq"),
        (2 * F.rank().over(wd)
         + F.count(F.lit(1)).over(Window.partitionBy("flag", "d")) - 1)
        .cast("decimal(38,0)").alias("rd"),
    )
    m = r.groupBy("flag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("rq").alias("sx"),
        F.sum("rd").alias("sy"),
        F.sum(F.col("rq") * F.col("rq")).alias("sxx"),
        F.sum(F.col("rd") * F.col("rd")).alias("syy"),
        F.sum(F.col("rq") * F.col("rd")).alias("sxy"),
    )
    return m.select("flag", F.expr(_PEARSON).alias("rho")).orderBy("flag")


# Cross-correlation at lag L pairs x_t with y_{t+L} over the daily
# series; each lag's Pearson derives from exact integer moments of the
# lead-shifted pair set. lead() drops the tail (no wraparound) in both
# engines identically.
_CCF_LAGS = [0, 1, 2, 3, 7]

_CCF_ORACLE_TEMPLATE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
shifted AS (
  SELECT day, x,
         {lead_cols}
  FROM daily
),
pairs AS (
  {lag_union}
),
m AS (
  SELECT lag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(yl AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(yl AS HUGEINT) * yl) AS syy,
         SUM(CAST(x AS HUGEINT) * yl) AS sxy
  FROM pairs WHERE yl IS NOT NULL GROUP BY lag
)
SELECT lag, CAST(n AS BIGINT) AS n_pairs, {pearson} AS ccf FROM m ORDER BY lag
"""


def _ccf_oracle() -> str:
    lead_cols = ",\n         ".join(
        f"lead(y, {lag}) OVER (ORDER BY day) AS y{lag}" for lag in _CCF_LAGS
    )
    lag_union = "\n  UNION ALL\n  ".join(
        f"SELECT {lag} AS lag, x, y{lag} AS yl FROM shifted" for lag in _CCF_LAGS
    )
    return _CCF_ORACLE_TEMPLATE.format(
        lead_cols=lead_cols, lag_union=lag_union, pearson=_PEARSON
    )


@query("ts_ccf_lags", "2.10 streaming", _ccf_oracle())
def ts_ccf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function: daily order count vs next-day(s) revenue.

    The lagged twin of `ts_acf_lags`: does today's order VOLUME predict
    revenue L days out? For each lag in {0,1,2,3,7}, pair x_t (count)
    with y_{t+L} (revenue cents) via lead() over the day-ordered series
    and compute Pearson from exact integer moments.

    Scale shape: the fact table reduces FIRST to one row per day
    (map-combinable count/sum), so the window/lead/union machinery runs
    over a #days-sized series — a few thousand rows at any corpus size.
    The lead window is a single ordered pass; 5 lag branches re-scan the
    tiny cached series, then one 6-moment aggregate per lag. At 100 TB
    the only fact-table cost is the one daily-rollup scan. y cents² per
    day can reach ~1e17 at big SF so second moments ride HUGEINT /
    DECIMAL(38,0)."""
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("y"),
        )
        .localCheckpoint(eager=True)  # reduce once; lag branches re-scan this
    )
    w = Window.orderBy("day")
    shifted = daily.select(
        "x", *[F.lead("y", lag).over(w).alias(f"y{lag}") for lag in _CCF_LAGS]
    )
    branches = [
        shifted.select(F.lit(lag).alias("lag"), "x", F.col(f"y{lag}").alias("yl"))
        for lag in _CCF_LAGS
    ]
    pairs = branches[0]
    for b in branches[1:]:
        pairs = pairs.unionByName(b)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = (
        pairs.where(F.col("yl").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(dec("x")).alias("sx"),
            F.sum(dec("yl")).alias("sy"),
            F.sum(dec("x") * F.col("x")).alias("sxx"),
            F.sum(dec("yl") * F.col("yl")).alias("syy"),
            F.sum(dec("x") * F.col("yl")).alias("sxy"),
        )
    )
    return m.select(
        "lag",
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(_PEARSON).alias("ccf"),
    ).orderBy("lag")
