"""SURVEY.md §2.12 composite-workload extensions (split out of the
round-4 modules, r5).

Retention cohorts, market-basket pairs + lift, ABC/Pareto, RFM, DAU/WAU
stickiness, supplier HHI, and inter-purchase gap cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load



# ---------------------------------------------------------- 2.12 workloads

_RETENTION_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(date_diff('day', DATE '2024-01-01',
                              CAST(date_trunc('day', ts) AS DATE)) / 7) AS INT)
           AS wk
  FROM events
),
cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ud GROUP BY user_id)
SELECT c.cohort_wk, u.wk - c.cohort_wk AS week_offset,
       count(DISTINCT u.user_id) AS n_users
FROM ud u JOIN cohort c USING (user_id)
GROUP BY c.cohort_wk, week_offset
ORDER BY c.cohort_wk, week_offset
"""


@query("wl_retention_cohorts", "2.12 composite workloads", _RETENTION_ORACLE)
def wl_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics composite:
    users cohort by their first active week (weeks since 2024-01-01,
    integer arithmetic), and each later active week counts them at that
    offset; row (w, k) = users from cohort w still active k weeks in.
    Shape: distinct (user, week) map-side, per-user min-week agg (150
    rows) BROADCAST back — the fact stream never shuffles twice — then one
    grouped distinct count. At 100 TB the cohort table is users-sized, not
    events-sized, so the broadcast stays small relative to the scan."""
    e = load(spark, sf_dir, "events")
    wk = F.floor(F.datediff(F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01")) / 7).cast(
        "int"
    )
    ud = e.select("user_id", wk.alias("wk")).distinct()
    cohort = ud.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ud.join(F.broadcast(cohort), "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_wk", "week_offset")
    )


_BASKET_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY p1, p2
ORDER BY n DESC, p1, p2
LIMIT 20
"""


@query("wl_basket_pairs", "2.12 composite workloads", _BASKET_ORACLE)
def wl_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs ordered together in
    the same order — the association-mining composite. The self-join keys
    on l_orderkey, whose fan-out is bounded by lines-per-order (≤7 here,
    small everywhere), so pair generation is linear in rows × basket size,
    never corpus-quadratic; the distinct pre-pass collapses duplicate
    (order, part) lines before pairing, and the top-20 plans as
    TakeOrderedAndProject after one keyed count."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    b = op.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("p2"))
    return (
        op.join(b, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_partkey") < F.col("p2")))
        .groupBy(F.col("l_partkey").alias("p1"), "p2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p1", "p2")
        .limit(20)
    )


_ABC_ORACLE = """
WITH pr AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(rev) OVER () AS BIGINT) AS tot
  FROM pr
)
SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc_class,
       count(*) AS n_parts,
       round(CAST(sum(rev) AS DOUBLE) / 1e4, 2) AS class_revenue
FROM ranked GROUP BY abc_class ORDER BY abc_class
"""


@query("wl_abc_pareto", "2.12 composite workloads", _ABC_ORACLE)
def wl_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification — parts bucketed by cumulative revenue
    share (A ≤ 80%, B ≤ 95%, C rest), the inventory-analytics composite.
    Scale-correct: the fact stream reduces to per-part EXACT int64
    1e-4-unit revenues first (the wl_product_profit money path — 2-decimal
    price × 2-decimal discount factor terminates at 4 decimals), and only
    the #parts-row series is window-scanned; class boundaries compare
    `cum*100 <= tot*{80,95}` in pure integers, so no float share can flap
    a part across classes. The global-ORDER window is the honest cost: a
    Pareto ranking is inherently a total order over parts (#parts ≪
    #rows); at 100 TB the per-part agg shards, the ranking runs over the
    reduced series."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc = F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    pr = li.groupBy("l_partkey").agg(F.sum(cents * disc).alias("rev"))
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    ranked = pr.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(w).alias("cum"),
        F.sum("rev").over(wt).alias("tot"),
    )
    cls = (
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, F.lit("A"))
        .when(F.col("cum") * 100 <= F.col("tot") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        ranked.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev").cast("double") / 1e4, 2).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


_RFM_ORACLE = """
WITH rfm AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-09-01') AS BIGINT)
           AS recency,
         count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT ntile(4) OVER (ORDER BY recency, o_custkey) AS r_score,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM rfm
)
SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score, count(*) AS n_customers
FROM scored GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


@query("wl_rfm_segmentation", "2.12 composite workloads", _RFM_ORACLE)
def wl_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary quartile
    scores (ntile(4), best = 1) and the segment census, the canonical CRM
    composite. Determinism: every metric is exact (day diff, count, int64
    cents) and every ntile carries a custkey tiebreak so quartile
    boundaries cannot flap; ntile's larger-earlier-bucket fill rule is the
    same in both engines. Shape: one keyed agg to #customers rows, three
    windows over that reduced table, one final census agg."""
    o = load(spark, sf_dir, "orders")
    ref = F.lit("2001-09-01").cast("date")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(ref, F.to_date(F.max("o_orderdate"))).cast("long").alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("monetary"),
    )
    scored = rfm.select(
        F.ntile(4).over(Window.orderBy("recency", "o_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "o_custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary"), "o_custkey")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


# -------------------------------------------- 2.12 DAU/WAU stickiness

_STICKINESS_ORACLE = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
days AS (SELECT DISTINCT d FROM ud),
dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
wau AS (
  SELECT g.d, count(DISTINCT u.user_id) AS wau
  FROM days g JOIN ud u ON u.d BETWEEN g.d - 6 AND g.d
  GROUP BY g.d
)
SELECT g.d AS day, dau.dau, wau.wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
FROM days g JOIN dau ON dau.d = g.d JOIN wau ON wau.d = g.d
ORDER BY day
"""


@query("wl_dau_wau_stickiness", "2.12 composite workloads", _STICKINESS_ORACLE)
def wl_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement composite: daily active
    users over trailing-7-day active users. The scale move: the trailing
    window is NOT a range join — each (user, day) activity row EXPLODES to
    the ≤7 future days it covers (`sequence(d, d+6)`), turning WAU into a
    plain keyed distinct count on an EQUI key. The fact stream reduces to
    distinct (user, day) first (bounded: users × days), the fan-out is a
    constant 7, and everything downstream hash-partitions on day."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    cover = ud.select(
        "user_id", F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("d")
    )
    wau = (
        cover.join(days, "d")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "d")
        .join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias("stickiness"),
        )
        .orderBy("day")
    )


# ------------------------------------ 2.12 association rules + degree law

_LIFT_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT count(DISTINCT o) AS n_orders FROM op),
c AS (SELECT p, count(*) AS cnt FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, count(*) AS c12
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
),
top AS (
  SELECT p1, p2, c12 FROM pairs ORDER BY c12 DESC, p1, p2 LIMIT 20
)
SELECT t.p1, t.p2, CAST(t.c12 AS BIGINT) AS c12,
       round(CAST(t.c12 AS DOUBLE) / c1.cnt, 4) AS conf_1_to_2,
       round(CAST(t.c12 AS DOUBLE) / c2.cnt, 4) AS conf_2_to_1,
       round(CAST(t.c12 AS DOUBLE) * n.n_orders / (CAST(c1.cnt AS DOUBLE) * c2.cnt), 4)
         AS lift
FROM top t JOIN c c1 ON c1.p = t.p1 JOIN c c2 ON c2.p = t.p2, n
ORDER BY c12 DESC, p1, p2
"""


@query("wl_basket_lift", "2.12 composite workloads", _LIFT_ORACLE)
def wl_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the top-20 co-purchased pairs: confidence in
    both directions and lift (`c12·N / (c1·c2)` — >1 means genuinely
    associated, not just popular) — the metric layer wl_basket_pairs
    feeds. All counts exact integers (distinct-order support), three
    rounded divisions at the end; the per-part support table is tiny and
    broadcast back onto the pair list. Same basket-bounded self-join as
    the pair mining — nothing corpus-quadratic."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    op = op.localCheckpoint()  # pairs + supports + order count share it
    n_orders = op.select("o").distinct().count()
    c = op.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = op.alias("a"), op.alias("b")
    top = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .orderBy(F.col("c12").desc(), "p1", "p2")
        .limit(20)
    )
    c1 = c.select(F.col("p").alias("p1"), F.col("cnt").alias("cnt1"))
    c2 = c.select(F.col("p").alias("p2"), F.col("cnt").alias("cnt2"))
    return (
        top.join(F.broadcast(c1), "p1")
        .join(F.broadcast(c2), "p2")
        .select(
            "p1",
            "p2",
            "c12",
            F.round(F.col("c12").cast("double") / F.col("cnt1"), 4).alias("conf_1_to_2"),
            F.round(F.col("c12").cast("double") / F.col("cnt2"), 4).alias("conf_2_to_1"),
            F.round(
                F.col("c12").cast("double") * n_orders
                / (F.col("cnt1").cast("double") * F.col("cnt2")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("c12").desc(), "p1", "p2")
    )


# -------------------------------------- 2.12 concentration + repurchase

_HHI_ORACLE = """
WITH rev AS (
  SELECT n.n_name AS nation, l.l_suppkey AS s,
         sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS cents
  FROM lineitem l
  JOIN supplier su ON su.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = su.s_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT nation, sum(cents) AS t, count(*) AS n_suppliers FROM rev GROUP BY nation)
SELECT r.nation, CAST(max(t2.n_suppliers) AS BIGINT) AS n_suppliers,
       round(sum((CAST(r.cents AS DOUBLE) / max_t.t) * (CAST(r.cents AS DOUBLE) / max_t.t))
             * 10000, 2) AS hhi
FROM rev r
JOIN (SELECT nation, t FROM tot) max_t ON max_t.nation = r.nation
JOIN (SELECT nation, n_suppliers FROM tot) t2 ON t2.nation = r.nation
GROUP BY r.nation ORDER BY r.nation
"""


@query("wl_supplier_hhi", "2.12 composite workloads", _HHI_ORACLE)
def wl_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index per nation: Σ of
    squared supplier revenue shares ×10000 (the antitrust 2500 threshold
    scale) — the concentration screen a marketplace/sourcing pipeline runs
    per region. Revenue reduces to exact int64 cents per (nation,
    supplier) FIRST (one keyed agg), shares and their squares compute once
    over that tiny table (≤ #suppliers rows), identical double expression
    in both engines, one rounded output."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    rev = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("l_suppkey").alias("s"))
        .agg(F.sum(cents).alias("cents"))
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("nation")
    share = F.col("cents").cast("double") / F.sum("cents").over(wp)
    return (
        rev.select("nation", share.alias("share"))
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.col("share") * F.col("share")) * 10000, 2).alias("hhi"),
        )
        .orderBy("nation")
    )


_GAP_ORACLE = """
WITH seq AS (
  SELECT c.c_mktsegment AS segment,
         date_diff('day',
                   lag(o.o_orderdate)
                     OVER (PARTITION BY o.o_custkey ORDER BY o.o_orderdate, o.o_orderkey),
                   o.o_orderdate) AS gap
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
SELECT segment, count(gap) AS n_gaps,
       round(CAST(sum(gap) AS DOUBLE) / count(gap), 2) AS avg_gap_days,
       CAST(max(gap) AS INT) AS max_gap_days
FROM seq GROUP BY segment ORDER BY segment
"""


@query("wl_interpurchase_gap", "2.12 composite workloads", _GAP_ORACLE)
def wl_interpurchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap analytics per market segment — the repurchase-
    cadence metric behind churn models: per customer, days between
    consecutive orders (lag window keyed (date, orderkey) for total
    order), rolled up to segment count / exact-integer average / max.
    Windows partition per customer (parallelism = #customers); the rollup
    is one keyed agg over integer day gaps — order-free and engine-exact,
    one final division."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap"),
        )
    )
    return (
        seq.groupBy("segment")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.round(F.sum("gap").cast("double") / F.count("gap"), 2).alias("avg_gap_days"),
            F.max("gap").cast("int").alias("max_gap_days"),
        )
        .orderBy("segment")
    )
