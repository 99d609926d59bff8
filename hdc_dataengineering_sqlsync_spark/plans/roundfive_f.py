"""SURVEY.md §2 round-5 additions, batch O.

Batch sessionization census, SaaS revenue-retention accounting, and exact
graph assortativity. Registered after ``roundfive_e`` (plans/__init__.py)
so the qids append to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------------------- 2.5 windows: gap-based sessionization census

_SESSIONIZE_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS x, event_id FROM events
),
flagged AS (
  SELECT user_id, x,
         CASE WHEN x - lag(x) OVER w > 1800000000
                OR lag(x) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY x, event_id)
),
sess AS (
  SELECT user_id, x,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         MAX(x) - MIN(x) AS duration_us
  FROM sess GROUP BY user_id, session_id
)
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(n_events) * 10000 // COUNT(*) AS BIGINT) AS events_per_session_bps,
       CAST(2 * median(duration_us) AS BIGINT) AS med2_duration_us
FROM per_session
"""


@query("win_sessionize_gap", "2.5 windows", _SESSIONIZE_ORACLE)
def win_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-minute-gap islands + session census.

    The analytical (batch) form of the declared streaming session
    windows: a session breaks where the gap to the previous event
    exceeds 30 minutes — lag + running-sum-of-breaks assigns session ids
    in ONE ordered pass per user, then the census reduces to a single
    summary row (sessions, events/session in integer bps, doubled-median
    session duration — the exact-integer median idiom).

    Scale shape: both windows share the SAME (user_id) partitioning and
    (x, event_id) sort — one shuffle, one sort, two window functions
    over it; per-user histories are small and independent. The census
    is two keyed aggregates on reduced data."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("x"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("x", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (F.col("x") - F.lag("x").over(w) > 1800000000)
            | F.lag("x").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("x") - F.min("x")).alias("duration_us"),
    )
    return per_session.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.expr("sum(n_events) * 10000 div count(1)").alias(
            "events_per_session_bps"
        ),
        (2 * F.median("duration_us")).cast("long").alias("med2_duration_us"),
    )


# ----------------------- 2.12 workloads: net revenue retention (NRR)

_NRR_ORACLE = """
WITH cm AS (
  SELECT o_custkey AS cust,
         year(o_orderdate) * 12 + month(o_orderdate) AS mo,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY cust, mo
),
paired AS (
  SELECT prev.mo + 1 AS mo,
         prev.cents AS prev_cents,
         COALESCE(cur.cents, 0) AS ret_cents
  FROM cm prev
  LEFT JOIN cm cur ON cur.cust = prev.cust AND cur.mo = prev.mo + 1
)
SELECT CAST(mo AS BIGINT) AS mo,
       CAST(COUNT(*) AS BIGINT) AS n_base_customers,
       CAST(SUM(prev_cents) AS BIGINT) AS base_cents,
       CAST(SUM(ret_cents) AS BIGINT) AS retained_cents,
       CAST(SUM(ret_cents) * 10000 // SUM(prev_cents) AS BIGINT) AS nrr_bps
FROM paired GROUP BY mo ORDER BY mo
"""


@query("wl_net_revenue_retention", "2.12 composite workloads", _NRR_ORACLE)
def wl_net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue retention: this month's revenue from LAST month's payers.

    The SaaS accounting metric (NRR >100% = expansion beats churn): for
    each month m, the base is every customer with month m-1 revenue;
    retained revenue is what those same customers spent in m (including
    zero for the churned). All money in exact integer cents, the rate in
    integer basis points.

    Scale shape: facts collapse FIRST to the (customer, month) grain —
    one map-combinable aggregate — then a self-equi-join on
    (customer, month+1) over the reduced table (co-partitioned on
    customer; months are a linear integer so the +1 probe is an equi
    key, not a range), and a final tiny month census."""
    cm = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("cust"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mo"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    prev = cm.select("cust", F.col("mo").alias("pmo"), F.col("cents").alias("prev_cents"))
    cur = cm.select("cust", "mo", F.col("cents").alias("cur_cents"))
    paired = prev.join(
        cur, (prev.cust == cur.cust) & (cur.mo == prev.pmo + 1), "left"
    ).select(
        (F.col("pmo") + 1).alias("mo"),
        "prev_cents",
        F.coalesce("cur_cents", F.lit(0)).alias("ret_cents"),
    )
    return (
        paired.groupBy("mo")
        .agg(
            F.count(F.lit(1)).alias("n_base_customers"),
            F.sum("prev_cents").alias("base_cents"),
            F.sum("ret_cents").alias("retained_cents"),
            F.expr("sum(ret_cents) * 10000 div sum(prev_cents)").alias(
                "nrr_bps"
            ),
        )
        .select(
            F.col("mo").cast("long").alias("mo"),
            "n_base_customers",
            "base_cents",
            "retained_cents",
            "nrr_bps",
        )
        .orderBy("mo")
    )


# ------------------- 2.12 workloads: exact degree assortativity

# ONE expression string for the final Pearson formula, formatted into both
# engines verbatim (the agg_corr_covar_exact / _det3 discipline): identical
# IEEE expression trees by construction.
_ASSORT_R = (
    "round((cast(n as double) * cast(sxy as double)"
    " - cast(sx as double) * cast(sy as double))"
    " / (sqrt(cast(n as double) * cast(sxx as double)"
    "         - cast(sx as double) * cast(sx as double))"
    "    * sqrt(cast(n as double) * cast(syy as double)"
    "           - cast(sy as double) * cast(sy as double))), 4)"
)

_ASSORT_ORACLE = f"""
WITH e0 AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
nodes AS (
  SELECT c AS node, COUNT(*) AS deg FROM e0 GROUP BY c
  UNION ALL
  SELECT s + 1000000, COUNT(*) FROM e0 GROUP BY s
),
dir_edges AS (
  SELECT c AS u, s + 1000000 AS v FROM e0
  UNION ALL
  SELECT s + 1000000, c FROM e0
),
joined AS (
  SELECT du.deg AS x, dv.deg AS y
  FROM dir_edges
  JOIN nodes du ON dir_edges.u = du.node
  JOIN nodes dv ON dir_edges.v = dv.node
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM joined
)
SELECT CAST(n AS BIGINT) AS n_directed_edges,
       {_ASSORT_R} AS assortativity_r
FROM m
"""


@query("graph_assortativity_exact", "2.12 composite workloads", _ASSORT_ORACLE)
def graph_assortativity_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the trade graph, exact-moment Pearson.

    Do high-degree nodes trade with high-degree nodes? The network-
    science summary (Newman's r) over the customer-supplier bipartite
    graph: Pearson correlation of endpoint degrees over the DIRECTED
    edge list (both directions, so the statistic is symmetric).
    Disassortative r < 0 is the expected hub-and-spoke signature.

    Exactness: degrees are integers, so every moment (n, Σx, Σy, Σxy,
    Σx², Σy²) accumulates exactly — DECIMAL(38,0) here, HUGEINT in the
    oracle (second moments blow int64 at ~1e12 edges × 1e6 degrees) —
    and the ONE final double formula is a shared expression string
    formatted into both engines verbatim (the agg_corr_covar_exact
    discipline: identical IEEE trees by construction).

    Scale shape: distinct edge derivation is one (cust, supp) hash agg;
    degrees are two keyed counts; the edge-to-degree join is equi-keyed
    on node id (at 100 TB the degree table is the broadcast/bloom side);
    the moment pass is ONE map-combinable aggregate."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    # e0 feeds SIX consumers through nodes/du/dv/dir_edges; without a
    # checkpoint the orders-join-lineitem-distinct subtree recomputes six
    # times (r10 plan audit: 12 fact scans in one plan). Materialize the
    # edge list once (the graphs.py discipline), and the node-degree table
    # (|nodes| rows) once for its two du/dv reads.
    e0 = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.groupBy(F.col("c").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .unionByName(
            e0.groupBy((F.col("s") + 1000000).alias("node")).agg(
                F.count(F.lit(1)).alias("deg")
            )
        )
        .localCheckpoint(eager=True)
    )
    dir_edges = e0.select(
        F.col("c").alias("u"), (F.col("s") + 1000000).alias("v")
    ).unionByName(
        e0.select((F.col("s") + 1000000).alias("u"), F.col("c").alias("v"))
    )
    du = nodes.select(F.col("node").alias("u"), F.col("deg").alias("x"))
    dv = nodes.select(F.col("node").alias("v"), F.col("deg").alias("y"))
    joined = dir_edges.join(du, "u").join(dv, "v")
    m = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.expr(_ASSORT_R).alias("assortativity_r"),
    )
