"""SURVEY.md §2 round-9 batch T: synchronous label propagation,
Nelson–Aalen cumulative hazard, Holt–Winters seasonal smoothing.

  graph_label_propagation_3it  min-label supersteps, exact partial state
  wl_nelson_aalen_hazard       cumulative hazard with censoring, exact e9
  ts_holt_winters_additive     level+trend+season integer recursion

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.plans.graphs import _cs_edges, _CS_EDGES_SQL
from hdc_dataengineering_sqlsync_spark.registry import load

# ------- 2.12 composite: synchronous min-label propagation (3 supersteps)

_LPA_ORACLE = f"""
WITH {_CS_EDGES_SQL.strip()},
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
l1 AS (
  SELECT e.dst AS node, LEAST(min(l.lbl), min(e.dst)) AS lbl
  FROM edges e JOIN l0 l ON l.node = e.src GROUP BY e.dst
),
l2 AS (
  SELECT e.dst AS node, LEAST(min(l.lbl), min(e.dst)) AS lbl
  FROM edges e JOIN l1 l ON l.node = e.src GROUP BY e.dst
),
l3 AS (
  SELECT e.dst AS node, LEAST(min(l.lbl), min(e.dst)) AS lbl
  FROM edges e JOIN l2 l ON l.node = e.src GROUP BY e.dst
),
sizes AS (
  SELECT lbl, CAST(count(*) AS BIGINT) AS sz FROM l3 GROUP BY lbl
)
SELECT CAST(count(*) AS BIGINT) AS n_labels,
       CAST(max(sz) AS BIGINT) AS max_cluster,
       CAST(min(sz) AS BIGINT) AS min_cluster,
       CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singletons,
       CAST(min(lbl) AS BIGINT) AS min_label
FROM sizes
"""


@query(
    "graph_label_propagation_3it", "2.12 composite workloads", _LPA_ORACLE
)
def graph_label_propagation_3it(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-label propagation (hash-min), 3 supersteps over the
    customer↔supplier trade graph: every node starts labeled with its own
    id; each superstep it adopts min(own id, smallest neighbor label).
    Run to convergence this IS connected components — pinned here at
    exactly 3 supersteps so the PARTIAL state (how far labels travel in
    k hops) is the contract: deterministic, engine-identical integer
    mins, the convergence-rate diagnostic that tells you how many
    Pregel rounds a real components job will need.

    Scale shape: each superstep is ONE keyed join (edges ⋈ labels on
    src — edges bucketed by src at scale, so iterations shuffle only
    the node-sized label table) + ONE keyed min to #nodes rows; the
    classic Pregel superstep expressed relationally, same plan family
    as graph_pagerank (graphs.py)."""
    edges = _cs_edges(spark, sf_dir).localCheckpoint()
    labels = edges.select(F.col("src").alias("node"), F.col("src").alias("lbl")).distinct()
    for _ in range(3):
        labels = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(edges.dst)
            .agg(F.least(F.min("lbl"), F.min(edges.dst)).alias("lbl"))
            .select(F.col("dst").alias("node"), "lbl")
        )
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_labels"),
        F.max("sz").alias("max_cluster"),
        F.min("sz").alias("min_cluster"),
        F.sum(F.when(F.col("sz") == 1, 1).otherwise(0)).alias("singletons"),
        F.min("lbl").alias("min_label"),
    )


# ------ 2.12 composite: Nelson–Aalen cumulative hazard (with censoring)

_NA_ORACLE = """
WITH ship AS (
  SELECT l_orderkey AS k, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
),
obs AS (
  SELECT o.o_orderpriority AS priority,
         CASE WHEN s.ship <= DATE '1997-06-30'
              THEN date_diff('day', o.o_orderdate, s.ship)
              ELSE date_diff('day', o.o_orderdate, DATE '1997-06-30') END
           AS t,
         CASE WHEN s.ship <= DATE '1997-06-30' THEN 1 ELSE 0 END AS ev
  FROM orders o JOIN ship s ON s.k = o.o_orderkey
  WHERE year(o.o_orderdate) = 1996
),
grid AS (
  SELECT priority, t,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS leave
  FROM obs GROUP BY priority, t
),
risk AS (
  SELECT priority, t, d,
         CAST(SUM(leave) OVER (PARTITION BY priority ORDER BY t
                               ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
  FROM grid
),
haz AS (
  SELECT priority, t,
         CAST(SUM(d * 1000000000 // n_risk)
              OVER (PARTITION BY priority ORDER BY t) AS BIGINT) AS h_e9
  FROM risk
),
horizons AS (SELECT unnest([7, 14, 30, 60, 90]) AS horizon)
SELECT h.priority, CAST(z.horizon AS INT) AS horizon,
       CAST(max_by(h.h_e9, h.t) AS BIGINT) AS cum_hazard_e9
FROM haz h JOIN horizons z ON h.t <= z.horizon
GROUP BY h.priority, z.horizon
ORDER BY priority, horizon
"""


@query("wl_nelson_aalen_hazard", "2.12 composite workloads", _NA_ORACLE)
def wl_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ for order
    fulfillment with REAL right-censoring (the 1996 cohort observed
    through 1997-06-30; later ships are censored at the cutoff) — the
    estimator that, unlike a naive mean time-to-ship, stays unbiased
    when slow orders are still open. Kaplan–Meier's additive sibling:
    every dᵢ/nᵢ term is one exact integral e9 division, the running sum
    is integer, so the curve is bit-identical in both engines; read out
    at the 7/14/30/60/90-day horizons per order priority.

    Scale shape: the duration grid reduces map-side to (priority, day)
    cells; at-risk counts are a REVERSE running sum and the hazard a
    forward one — both partition-parallel per priority over ≤ a few
    hundred day rows regardless of fact volume; horizon readout joins a
    5-row broadcast dim with max_by."""
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.max("l_shipdate").alias("ship"))
    )
    o = load(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1996)
    cut = F.lit("1997-06-30").cast("date")
    obs = o.join(ship, o.o_orderkey == ship.k).select(
        F.col("o_orderpriority").alias("priority"),
        F.when(F.col("ship") <= cut, F.datediff("ship", "o_orderdate"))
        .otherwise(F.datediff(cut, F.col("o_orderdate")))
        .alias("t"),
        F.when(F.col("ship") <= cut, 1).otherwise(0).alias("ev"),
    )
    grid = obs.groupBy("priority", "t").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("leave")
    )
    w_rev = (
        Window.partitionBy("priority")
        .orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = grid.select(
        "priority", "t", "d", F.sum("leave").over(w_rev).alias("n_risk")
    )
    w_fwd = (
        Window.partitionBy("priority")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    haz = risk.select(
        "priority",
        "t",
        F.sum(F.expr("d * 1000000000 DIV n_risk")).over(w_fwd).alias("h_e9"),
    )
    horizons = spark.range(1).select(
        F.explode(F.array(*[F.lit(h) for h in (7, 14, 30, 60, 90)])).alias(
            "horizon"
        )
    )
    return (
        haz.join(F.broadcast(horizons), haz.t <= horizons.horizon)
        .groupBy("priority", F.col("horizon").cast("int").alias("horizon"))
        .agg(F.max_by("h_e9", "t").alias("cum_hazard_e9"))
        .orderBy("priority", "horizon")
    )


# --- 2.10 time series: Holt–Winters additive (level + trend + season s=4)

# alpha=0.2, beta=0.1, gamma=0.3 as exact tenths; all state in integer
# cents; DIV/'//' truncate identically in both engines (probe-verified,
# including negatives: -7//10 = 0 in DuckDB, trunc like Spark DIV)
_HW_ORACLE = """
WITH RECURSIVE q AS (
  SELECT l_returnflag AS flag,
         date_trunc('quarter', l_shipdate) AS qt,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem WHERE year(l_shipdate) BETWEEN 1993 AND 1997
  GROUP BY 1, 2
),
seq AS (
  SELECT flag, x,
         CAST(row_number() OVER (PARTITION BY flag ORDER BY qt) AS BIGINT)
           AS rn
  FROM q
),
r AS (
  SELECT flag, rn, x AS lvl, CAST(0 AS BIGINT) AS trend,
         CAST(0 AS BIGINT) AS s1, CAST(0 AS BIGINT) AS s2,
         CAST(0 AS BIGINT) AS s3, CAST(0 AS BIGINT) AS s4
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT flag, rn, lvl_new,
         CAST(((lvl_new - lvl_old) + 9 * trend_old) // 10 AS BIGINT),
         s2, s3, s4,
         CAST((3 * (x - lvl_new) + 7 * s1) // 10 AS BIGINT)
  FROM (
    SELECT s.flag, s.rn, s.x, r.s1, r.s2, r.s3, r.s4,
           CAST((2 * (s.x - r.s1) + 8 * (r.lvl + r.trend)) // 10 AS BIGINT)
             AS lvl_new,
           r.lvl AS lvl_old, r.trend AS trend_old
    FROM r JOIN seq s ON s.flag = r.flag AND s.rn = r.rn + 1
  )
),
last AS (SELECT flag, max(rn) AS n FROM r GROUP BY flag)
SELECT r.flag, CAST(l.n AS BIGINT) AS n_quarters,
       CAST(r.lvl AS BIGINT) AS level_cents,
       CAST(r.trend AS BIGINT) AS trend_cents,
       CAST(r.s1 AS BIGINT) AS season_next_cents,
       CAST(r.lvl + r.trend + r.s1 AS BIGINT) AS forecast_next_cents
FROM r JOIN last l ON l.flag = r.flag AND r.rn = l.n
ORDER BY r.flag
"""

_HW_SCHEMA = T.StructType(
    [
        T.StructField("flag", T.StringType()),
        T.StructField("n_quarters", T.LongType()),
        T.StructField("level_cents", T.LongType()),
        T.StructField("trend_cents", T.LongType()),
        T.StructField("season_next_cents", T.LongType()),
        T.StructField("forecast_next_cents", T.LongType()),
    ]
)


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division — Spark DIV and DuckDB integer '//'."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _hw_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("qt")
    xs = [int(v) for v in pdf["x"]]
    lvl, trend = xs[0], 0
    season = [0, 0, 0, 0]  # s1 = component due NEXT step (lag-4 slot)
    for x in xs[1:]:
        lvl_new = _tdiv(2 * (x - season[0]) + 8 * (lvl + trend), 10)
        trend = _tdiv((lvl_new - lvl) + 9 * trend, 10)
        s_new = _tdiv(3 * (x - lvl_new) + 7 * season[0], 10)
        season = season[1:] + [s_new]
        lvl = lvl_new
    return pd.DataFrame(
        [
            {
                "flag": pdf["flag"].iloc[0],
                "n_quarters": len(xs),
                "level_cents": lvl,
                "trend_cents": trend,
                "season_next_cents": season[0],
                "forecast_next_cents": lvl + trend + season[0],
            }
        ]
    )


@query("ts_holt_winters_additive", "2.10 streaming", _HW_ORACLE)
def ts_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters additive triple smoothing — level + trend + a
    rotating 4-slot seasonal register over quarterly net revenue per
    return flag (1993–1997): the seasonal upgrade of ts_holt_linear that
    forecasts 'next quarter = level + trend + the season due next'.
    The recursion runs in exact integer cents with tenth-weight
    coefficients (α=0.2, β=0.1, γ=0.3) and truncating division, which
    both engines share even on negative deseasonalized residuals
    (probe: DuckDB integer '//' truncates, NOT floors) — so a 20-step,
    6-register recursion stays bit-identical.

    Scale shape: the fact stream reduces to (flag, quarter) map-side
    FIRST (20 rows per flag at any volume); the inherently sequential
    recursion runs per-flag via applyInPandas — partition-parallel
    across flags, O(quarters) state each, mirrored by the oracle's
    RECURSIVE CTE carrying the same 6 integer registers."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").between(1993, 1997)
    )
    q = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.date_trunc("quarter", "l_shipdate").alias("qt"),
    ).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            ).cast("long")
        ).alias("x")
    )
    return (
        q.groupBy("flag")
        .applyInPandas(_hw_group, schema=_HW_SCHEMA)
        .orderBy("flag")
    )
