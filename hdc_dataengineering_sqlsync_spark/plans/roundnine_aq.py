"""SURVEY.md §2 round-9 batch AQ: consistent-cut audit, Macaulay
duration, drawdown duration.

  sync_consistent_cut_audit  parent-rule snapshot vs naive per-table cuts
  wl_macaulay_duration       exact-rational cash-flow duration
  ts_drawdown_duration       longest underwater spell (peak→recovery)

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.6 sync & dataops: consistent multi-table cut, audited

_CUT = "1996-06-30"

_CUT_ORACLE = f"""
WITH cut_orders AS (
  SELECT o_orderkey FROM orders WHERE o_orderdate <= DATE '{_CUT}'
),
parent_rule AS (
  SELECT l.l_orderkey, l.l_shipdate
  FROM lineitem l JOIN cut_orders o ON o.o_orderkey = l.l_orderkey
),
naive_rule AS (
  SELECT l_orderkey FROM lineitem WHERE l_shipdate <= DATE '{_CUT}'
)
SELECT
  CAST((SELECT count(*) FROM cut_orders) AS BIGINT) AS n_orders_in_cut,
  CAST((SELECT count(*) FROM parent_rule) AS BIGINT) AS n_lines_parent_rule,
  CAST((SELECT count(*) FROM naive_rule) AS BIGINT) AS n_lines_naive_rule,
  CAST((SELECT count(*) FROM naive_rule n
        WHERE NOT EXISTS (SELECT 1 FROM cut_orders c
                          WHERE c.o_orderkey = n.l_orderkey)) AS BIGINT)
    AS n_naive_orphans,
  CAST((SELECT count(*) FROM parent_rule p
        WHERE p.l_shipdate > DATE '{_CUT}') AS BIGINT)
    AS n_parent_late_lines
"""


@query("sync_consistent_cut_audit", "2.6 sync & dataops", _CUT_ORACLE)
def sync_consistent_cut_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent multi-table cut — the snapshot-export correctness rule
    (back up orders and lineitem 'as of June 30'): the PARENT-rule cut
    takes children by membership of their parent in the cut (exports
    are referentially closed by construction), while the naive
    per-table timestamp cut (each table filtered on its own date)
    produces ORPHANS — lineitems shipped before the cut whose orders
    land after it. The audit counts both cuts and the naive rule's
    orphans: a nonzero orphan count is the broken-restore bug this op
    exists to prevent.

    Scale shape: the parent rule is one keyed semi-join co-partitioned
    with the fact; orphan counts are anti-join censuses on the same
    key — every predicate pushes to the scans."""
    cut = F.lit(_CUT).cast("date")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") <= cut)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    parent_rule = li.join(
        o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    )
    naive_rule = li.where(F.col("l_shipdate") <= cut)
    naive_orphans = naive_rule.join(
        o.select("o_orderkey"),
        naive_rule.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    parent_only = parent_rule.where(F.col("l_shipdate") > cut)
    a = o.agg(F.count(F.lit(1)).alias("n_orders_in_cut"))
    b = parent_rule.agg(F.count(F.lit(1)).alias("n_lines_parent_rule"))
    c = naive_rule.agg(F.count(F.lit(1)).alias("n_lines_naive_rule"))
    d = naive_orphans.agg(F.count(F.lit(1)).alias("n_naive_orphans"))
    e = parent_only.agg(F.count(F.lit(1)).alias("n_parent_late_lines"))
    return a.crossJoin(b).crossJoin(c).crossJoin(d).crossJoin(e)


# ------ 2.12 composite: Macaulay duration with exact rational discounting

_MD_FACTORS = [(k, 95**k, 100**k) for k in range(8)]
_MD_FACTOR_SQL = ", ".join(f"({k}, {n}, {d})" for k, n, d in _MD_FACTORS)

_MD_ORACLE = f"""
WITH q AS (
  SELECT c.c_mktsegment AS segment,
         (year(o.o_orderdate) - 1995) * 4 + quarter(o.o_orderdate) - 1
           AS k,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE year(o.o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2
),
f(k, num, den) AS (VALUES {_MD_FACTOR_SQL}),
pv AS (
  SELECT q.segment, q.k,
         CAST(CAST(q.cents AS HUGEINT) * f.num // f.den AS HUGEINT) AS term
  FROM q JOIN f ON f.k = q.k
)
SELECT segment,
       CAST(SUM(term) AS BIGINT) AS npv_cents,
       CAST(SUM(CAST(k AS HUGEINT) * term) * 1000 // SUM(term) AS BIGINT)
         AS duration_milli_quarters
FROM pv GROUP BY segment ORDER BY segment
"""


@query("wl_macaulay_duration", "2.12 composite workloads", _MD_ORACLE)
def wl_macaulay_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Macaulay duration — the PV-weighted average arrival time of a
    cash-flow stream (the interest-rate sensitivity number next to
    wl_npv_exact_discount's level): every per-quarter PV term is the
    exact integral rev·95^k/100^k (the shared factor-table device), and
    the duration closes with ONE wide-integer division onto the
    milli-quarter grid — Σk·PV / ΣPV with no float anywhere.

    Scale shape: quarter-grain keyed agg map-side; 8-row broadcast
    factor table; per-segment fold to 5 rows."""
    q = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(1995, 1996))
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (
                (F.year("o_orderdate") - 1995) * 4
                + F.quarter("o_orderdate")
                - 1
            ).alias("k"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    f = spark.createDataFrame(_MD_FACTORS, "k int, num long, den long")
    pv = q.join(F.broadcast(f), "k").select(
        "segment",
        "k",
        F.expr(
            "CAST(CAST(cents AS DECIMAL(38,0)) * num DIV den"
            " AS DECIMAL(38,0))"
        ).alias("term"),
    )
    return (
        pv.groupBy("segment")
        .agg(
            F.sum("term").cast("long").alias("npv_cents"),
            F.expr(
                "CAST(SUM(CAST(k AS DECIMAL(38,0)) * term) * 1000"
                " DIV SUM(term) AS BIGINT)"
            ).alias("duration_milli_quarters"),
        )
        .orderBy("segment")
    )


# ------ 2.10 time series: drawdown DURATION (longest underwater spell)

_DD_ORACLE = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1
),
cum AS (
  SELECT d, CAST(SUM(x) OVER (ORDER BY d) AS BIGINT) AS level
  FROM daily
),
uw AS (
  SELECT d, level,
         max(level) OVER (ORDER BY d) AS peak,
         CASE WHEN level < max(level) OVER (ORDER BY d) THEN 1 ELSE 0 END
           AS under
  FROM cum
),
isl AS (
  SELECT d, under,
         CAST(SUM(CASE WHEN under = 0 THEN 1 ELSE 0 END)
              OVER (ORDER BY d) AS BIGINT) AS grp
  FROM uw
),
spells AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS days_under,
         min(d) AS spell_start
  FROM isl WHERE under = 1 GROUP BY grp
)
SELECT CAST(count(*) AS BIGINT) AS n_spells,
       CAST(COALESCE(max(days_under), 0) AS BIGINT) AS longest_spell_days,
       min(CASE WHEN days_under = (SELECT max(days_under) FROM spells)
                THEN spell_start END) AS longest_spell_start,
       CAST(COALESCE(SUM(days_under), 0) AS BIGINT) AS total_days_under
FROM spells
"""


@query(
    "ts_drawdown_duration", "2.10 streaming/time series", _DD_ORACLE
)
def ts_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown DURATION — the risk number ts_drawdown_max hides: not
    how deep the trough was but how LONG the series stayed underwater
    (below its running peak) before recovering — investors fire
    managers over time-under-water, not depth. Underwater days segment
    into spells by the gap-and-island device keyed on running counts of
    at-peak days; the census reports spell count, the longest spell
    (earliest tie-break), and total underwater days — all exact
    integers on the cumulative cents series.

    Scale shape: day-grain map-side reduction; running max + islands
    run over ≤730 day rows, never the fact."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1995, 1996)
    )
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        ).alias("x")
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select("d", F.sum("x").over(wd).alias("level"))
    uw = cum.select(
        "d",
        F.when(
            F.col("level") < F.max("level").over(wd), 1
        )
        .otherwise(0)
        .alias("under"),
    )
    isl = uw.select(
        "d",
        "under",
        F.sum(F.when(F.col("under") == 0, 1).otherwise(0))
        .over(wd)
        .alias("grp"),
    )
    spells = (
        isl.where(F.col("under") == 1)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("days_under"),
            F.min("d").alias("spell_start"),
        )
    )
    mx = spells.agg(F.max("days_under").alias("mx"))
    return (
        spells.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).alias("n_spells"),
            F.coalesce(F.max("days_under"), F.lit(0)).alias(
                "longest_spell_days"
            ),
            F.min(
                F.when(
                    F.col("days_under") == F.col("mx"), F.col("spell_start")
                )
            ).alias("longest_spell_start"),
            F.coalesce(F.sum("days_under"), F.lit(0)).alias(
                "total_days_under"
            ),
        )
    )
