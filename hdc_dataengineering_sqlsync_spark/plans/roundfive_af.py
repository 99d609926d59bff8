"""SURVEY.md §2 round-5 additions, batch OO.

Per-node local clustering coefficients (the node-level refinement of
``graph_triangle_stats``'s global census) and a duplicate-payment audit
self-join. Registered after ``roundfive_ae`` (plans/__init__.py) so the
qids append to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Local clustering coefficient c(v) = 2·t(v) / (d(v)·(d(v)−1)) for the
# part co-purchase graph (same ≥2-support p1<p2 edge derivation as
# graph_triangle_stats). Every class boundary is decided by INTEGER
# cross-multiplication against c ∈ {0, ¼, ½}: 8t vs d(d−1) and 4t vs
# d(d−1) — no division, so a node sitting exactly on a boundary cannot
# flap between engines.
_LCC_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
e AS (
  SELECT a.p AS p1, b.p AS p2
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT p1 AS p FROM e UNION ALL SELECT p2 AS p FROM e)
  GROUP BY p
),
tri AS (
  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
  FROM e e1
  JOIN e e2 ON e2.p1 = e1.p2
  JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
),
tcnt AS (
  SELECT v, CAST(count(*) AS BIGINT) AS t
  FROM (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
  GROUP BY v
),
node AS (
  SELECT deg.p, deg.d, COALESCE(tcnt.t, 0) AS t
  FROM deg LEFT JOIN tcnt ON tcnt.v = deg.p
  WHERE deg.d >= 2
)
SELECT CASE WHEN t = 0 THEN 'zero'
            WHEN 8 * t < d * (d - 1) THEN 'low'
            WHEN 4 * t < d * (d - 1) THEN 'mid'
            ELSE 'high' END AS cls,
       COUNT(*) AS n_nodes,
       CAST(SUM(t) AS BIGINT) AS tri_slots,
       CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS wedges
FROM node GROUP BY 1 ORDER BY cls
"""


@query("graph_clustering_local", "2.12 composite workloads", _LCC_ORACLE)
def graph_clustering_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient census of the part co-purchase graph.

    The node-level refinement of `graph_triangle_stats`'s single global
    ratio: c(v) = 2·t(v)/(d(v)(d(v)−1)) tells which nodes sit in dense
    cliques vs star hubs — the feature that separates "bought together"
    communities from catalog-spanning hub parts. Nodes with d ≥ 2 fall
    into classes {zero, low < ¼, mid < ½, high}; every boundary is an
    INTEGER cross-multiplication (8t vs d(d−1), 4t vs d(d−1)), so no
    division ever decides a class.

    Scale shape: reuses the support-pruned oriented edge list (bounded
    basket self-join, never corpus-quadratic). Per-node triangle counts
    come from the SAME two-keyed-equi-join triangle enumeration as the
    global census, aggregated once per role via union — the triangle
    set streams through a hash aggregate without materializing. Final
    census is 4 rows."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("p1", "p2")
        .localCheckpoint()  # edges feed degree + 3 triangle roles: derive once
    )
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.p1") == F.col("e1.p2"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1")) & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .select(
            F.col("e1.p1").alias("a"), F.col("e1.p2").alias("b"), F.col("e2.p2").alias("c")
        )
    )
    tcnt = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    node = (
        deg.join(tcnt, deg.p == tcnt.v, "left")
        .select("p", "d", F.coalesce(F.col("t"), F.lit(0)).alias("t"))
        .where(F.col("d") >= 2)
    )
    dd1 = F.col("d") * (F.col("d") - 1)
    cls = (
        F.when(F.col("t") == 0, "zero")
        .when(8 * F.col("t") < dd1, "low")
        .when(4 * F.col("t") < dd1, "mid")
        .otherwise("high")
    )
    return (
        node.groupBy(cls.alias("cls"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("t").alias("tri_slots"),
            F.expr("cast(sum(d * (d - 1)) div 2 as bigint)").alias("wedges"),
        )
        .orderBy("cls")
    )


# Duplicate-payment audit: same customer, same exact amount, order dates
# within 7 days. The BLOCKING KEY is the (custkey, cents) equality —
# amount equality is the selective predicate, so the candidate join is a
# plain equi-join and the ±7d window is a residual filter, never a range
# join. o1 < o2 orients each pair once.
_DUPPAY_ORACLE = """
WITH o AS (
  SELECT o_orderkey AS k, o_custkey AS cust,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS day
  FROM orders WHERE o_orderstatus <> 'F'
),
pairs AS (
  SELECT a.cust, a.cents, a.k AS k1, b.k AS k2,
         CAST(abs(date_diff('day', a.day, b.day)) AS BIGINT) AS gap_days
  FROM o a JOIN o b ON a.cust = b.cust AND a.cents = b.cents AND a.k < b.k
  WHERE abs(date_diff('day', a.day, b.day)) <= 7
)
SELECT cust, cents, k1, k2, gap_days
FROM pairs ORDER BY cust, cents, k1, k2 LIMIT 100
"""


@query("wl_duplicate_payment_detect", "2.12 composite workloads", _DUPPAY_ORACLE)
def wl_duplicate_payment_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment audit: same customer + same exact amount within 7 days.

    The classic accounts-payable control (double-billed invoices,
    double-submitted orders). The join is deliberately EQUALITY-blocked
    on (custkey, amount_cents): amount equality is the selective
    predicate, so candidates come from a plain shuffled equi-join and
    the ±7-day proximity is a cheap residual filter — never a range
    join, never per-customer quadratic (fan-out is bounded by how many
    orders share one exact amount for one customer, ~1). Amounts
    compare as integer CENTS — float equality on money is the bug this
    audit exists to catch. o1 < o2 on orderkey orients each pair once.

    Scale shape: one shuffle on the compound key, residual filter
    map-side, top-100 ordered sample via TakeOrderedAndProject (no full
    sort). At 100 TB the pair fan-out stays linear because the blocking
    key is near-unique."""
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") != "F")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .where(F.abs(F.datediff(F.col("a.day"), F.col("b.day"))) <= 7)
        .select(
            F.col("a.cust").alias("cust"),
            F.col("a.cents").alias("cents"),
            F.col("a.k").alias("k1"),
            F.col("b.k").alias("k2"),
            F.abs(F.datediff(F.col("a.day"), F.col("b.day"))).cast("long")
            .alias("gap_days"),
        )
    )
    return pairs.orderBy("cust", "cents", "k1", "k2").limit(100)
