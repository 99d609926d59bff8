"""SURVEY.md §2 round-9 batch U: AR aging buckets, DSO countback,
vendor scorecard.

  wl_ar_aging_buckets   open receivables by age bucket at a snapshot
  wl_dso_countback      DSO by the exhaustion method, exact milli-days
  wl_vendor_scorecard   weighted composite of OTD/quality/price, bps

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------- 2.12 composite: accounts-receivable aging at a snapshot date

_AGING_ORACLE = """
WITH open_lines AS (
  SELECT o.o_orderkey, c.c_mktsegment AS segment,
         date_diff('day', o.o_orderdate, DATE '1997-01-01') AS age,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_orderdate < DATE '1997-01-01'
    AND l.l_shipdate > DATE '1997-01-01'
)
SELECT segment,
       CASE WHEN age <= 30 THEN '00-30' WHEN age <= 60 THEN '31-60'
            WHEN age <= 90 THEN '61-90' ELSE '90+' END AS bucket,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(SUM(cents) AS BIGINT) AS open_cents
FROM open_lines
GROUP BY 1, 2 ORDER BY segment, bucket
"""


@query("wl_ar_aging_buckets", "2.12 composite workloads", _AGING_ORACLE)
def wl_ar_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable aging — the collections report every finance
    close produces: as of a snapshot date, every unshipped (still-open)
    line's value bucketed by how long its order has been outstanding
    (0–30 / 31–60 / 61–90 / 90+ days). The 90+ bucket is the write-off
    risk radar; value in exact integer cents so the buckets reconcile
    to the ledger exactly.

    Scale shape: the snapshot predicates (orderdate < snap < shipdate)
    push down to the scans; one orderkey-keyed join co-partitioned with
    the fact, customer joined on its key; the census folds map-side to
    segments × 4 buckets (distinct-order count shares the same shuffle
    key as the join)."""
    snap = F.lit("1997-01-01").cast("date")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > snap)
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < snap)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    open_lines = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            F.col("c_mktsegment").alias("segment"),
            F.datediff(snap, "o_orderdate").alias("age"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            )
            .cast("long")
            .alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age") <= 30, "00-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        open_lines.groupBy("segment", bucket.alias("bucket"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("cents").alias("open_cents"),
        )
        .orderBy("segment", "bucket")
    )


# ------ 2.12 composite: DSO by the countback (exhaustion) method

_DSO_ORACLE = """
WITH line_val AS (
  SELECT o.o_orderdate, l.l_shipdate,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
months AS (
  SELECT DISTINCT date_trunc('month', o_orderdate) AS mon
  FROM orders WHERE year(o_orderdate) = 1995
),
billings AS (
  SELECT date_trunc('month', o_orderdate) AS bmon,
         CAST(SUM(cents) AS BIGINT) AS b
  FROM line_val GROUP BY 1
),
ar AS (
  SELECT m.mon, CAST(SUM(v.cents) AS BIGINT) AS ar_cents
  FROM months m JOIN line_val v
    ON v.o_orderdate < CAST(m.mon AS DATE) + INTERVAL 1 MONTH
   AND v.l_shipdate >= CAST(m.mon AS DATE) + INTERVAL 1 MONTH
  GROUP BY 1
),
walk AS (
  SELECT a.mon, a.ar_cents, b.bmon, b.b,
         date_diff('day', CAST(b.bmon AS DATE),
                   CAST(b.bmon AS DATE) + INTERVAL 1 MONTH) AS dim,
         CAST(SUM(b.b) OVER (PARTITION BY a.mon ORDER BY b.bmon DESC)
              AS BIGINT) AS cum_b
  FROM ar a JOIN billings b ON b.bmon <= a.mon
),
full_months AS (
  SELECT mon, ar_cents,
         CAST(COALESCE(SUM(CASE WHEN cum_b <= ar_cents THEN dim END), 0)
              AS BIGINT) AS full_days,
         CAST(COALESCE(SUM(CASE WHEN cum_b <= ar_cents THEN b END), 0)
              AS BIGINT) AS covered
  FROM walk GROUP BY mon, ar_cents
),
partial AS (
  SELECT w.mon,
         CAST(min(CASE WHEN w.cum_b > f.ar_cents
                       THEN (f.ar_cents - f.covered) * w.dim * 1000 // w.b
                  END) AS BIGINT) AS frac_milli
  FROM walk w JOIN full_months f ON f.mon = w.mon
  WHERE w.cum_b > f.ar_cents
    AND w.cum_b - w.b <= f.ar_cents
  GROUP BY w.mon
)
SELECT CAST(f.mon AS DATE) AS month, f.ar_cents,
       CAST(f.full_days * 1000 + COALESCE(p.frac_milli, 0) AS BIGINT)
         AS dso_milli_days
FROM full_months f LEFT JOIN partial p ON p.mon = f.mon
ORDER BY month
"""


@query("wl_dso_countback", "2.12 composite workloads", _DSO_ORACLE)
def wl_dso_countback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days-sales-outstanding by the COUNTBACK (exhaustion) method — the
    auditor's DSO, not the ratio shortcut: month-end open receivables
    are walked backward through monthly billings, consuming whole
    months while they fit and pro-rating the first month that doesn't
    (frac = remainder × days-in-month / that month's billings). Exact
    integer cents throughout; the pro-rata closes with ONE integral
    milli-day division, so the reported DSO is bit-stable.

    Scale shape: billings reduce map-side to month grain; month-end AR
    joins the fact to a ~12-row broadcast month dim; the countback walk
    is a descending running sum over months×history pairs (≤12×84 tiny
    rows) — never over the fact table."""
    lv = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderdate",
            "l_shipdate",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            )
            .cast("long")
            .alias("cents"),
        )
    )
    months = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1995)
        .select(F.trunc("o_orderdate", "month").alias("mon"))
        .distinct()
    )
    billings = lv.groupBy(
        F.trunc("o_orderdate", "month").alias("bmon")
    ).agg(F.sum("cents").alias("b"))
    nxt = F.add_months(F.col("mon"), 1)
    ar = (
        F.broadcast(months)
        .join(lv, (lv.o_orderdate < nxt) & (lv.l_shipdate >= nxt))
        .groupBy("mon")
        .agg(F.sum("cents").alias("ar_cents"))
    )
    w = Window.partitionBy("mon").orderBy(F.col("bmon").desc())
    # walk is tiny (months x billing-history pairs, <=12x84 rows) but its
    # lineage holds BOTH fact-join legs (month-end AR and month billings);
    # it feeds the full-months census AND the pro-rata probe below, so
    # checkpoint it once — the r10 plan audit caught the recompute (the
    # fact subtrees appeared three times in one plan without this).
    walk = (
        ar.join(billings, billings.bmon <= ar.mon)
        .select(
            "mon",
            "ar_cents",
            "bmon",
            "b",
            F.datediff(F.add_months("bmon", 1), "bmon").alias("dim"),
        )
        .withColumn(
            "cum_b",
            F.sum("b").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .localCheckpoint(eager=True)
    )
    full = walk.groupBy("mon", "ar_cents").agg(
        F.coalesce(
            F.sum(F.when(F.col("cum_b") <= F.col("ar_cents"), F.col("dim"))),
            F.lit(0),
        ).alias("full_days"),
        F.coalesce(
            F.sum(F.when(F.col("cum_b") <= F.col("ar_cents"), F.col("b"))),
            F.lit(0),
        ).alias("covered"),
    )
    wf = walk.select("mon", "b", "dim", "cum_b")
    partial = (
        wf.join(full.select("mon", "ar_cents", "covered"), "mon")
        .where(
            (F.col("cum_b") > F.col("ar_cents"))
            & (F.col("cum_b") - F.col("b") <= F.col("ar_cents"))
        )
        .groupBy("mon")
        .agg(
            F.min(
                F.expr("(ar_cents - covered) * dim * 1000 DIV b")
            ).alias("frac_milli")
        )
    )
    return (
        full.join(partial, "mon", "left")
        .select(
            F.col("mon").cast("date").alias("month"),
            "ar_cents",
            (
                F.col("full_days") * 1000
                + F.coalesce("frac_milli", F.lit(0))
            ).alias("dso_milli_days"),
        )
        .orderBy("month")
    )


# -------- 2.12 composite: vendor scorecard (weighted composite, bps)

_SCORECARD_ORACLE = """
WITH per_supp AS (
  SELECT s.s_nationkey,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_otd,
         CAST(SUM(CASE WHEN l.l_returnflag <> 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_ok,
         CAST(SUM(CAST(floor(l.l_discount * 10000 + 0.5) AS BIGINT))
              AS BIGINT) AS disc_bps_sum
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1
),
scored AS (
  SELECT s_nationkey, n_lines,
         n_otd * 10000 // n_lines AS otd_bps,
         n_ok * 10000 // n_lines AS quality_bps,
         disc_bps_sum // n_lines AS discount_bps
  FROM per_supp
)
SELECT n.n_name AS nation, n_lines, otd_bps, quality_bps, discount_bps,
       CAST((4 * otd_bps + 4 * quality_bps + 2 * discount_bps) // 10
            AS BIGINT) AS composite_bps
FROM scored JOIN nation n ON n.n_nationkey = s_nationkey
ORDER BY nation
"""


@query("wl_vendor_scorecard", "2.12 composite workloads", _SCORECARD_ORACLE)
def wl_vendor_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vendor scorecard — the weighted composite procurement reviews
    vendors on: on-time delivery (ship within the 30-day SLA — the
    testdata schema carries no commit date), quality (non-returned
    share), and price competitiveness (average discount granted), each
    an exact integer bps rate, blended 40/40/20 with integral
    arithmetic so two engines — or two quarters — never disagree on a
    vendor's rank by a rounding artifact.

    Scale shape: one suppkey-keyed join (supplier dim broadcast at
    these scales; co-partitioned at 100 TB) feeding a nation-grain
    4-moment fold — map-side combinable; the scorecard math runs on
    the ~25-row nation table."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_returnflag", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(
                    F.col("l_shipdate") <= F.date_add("o_orderdate", 30), 1
                ).otherwise(0)
            ).alias("n_otd"),
            F.sum(
                F.when(F.col("l_returnflag") != "R", 1).otherwise(0)
            ).alias("n_ok"),
            F.sum(
                F.floor(F.col("l_discount") * 10000 + 0.5).cast("long")
            ).alias("disc_bps_sum"),
        )
    )
    scored = per.select(
        "s_nationkey",
        "n_lines",
        F.expr("n_otd * 10000 DIV n_lines").alias("otd_bps"),
        F.expr("n_ok * 10000 DIV n_lines").alias("quality_bps"),
        F.expr("disc_bps_sum DIV n_lines").alias("discount_bps"),
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        scored.join(F.broadcast(n), scored.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n_lines",
            "otd_bps",
            "quality_bps",
            "discount_bps",
            F.expr(
                "(4 * otd_bps + 4 * quality_bps + 2 * discount_bps) DIV 10"
            ).alias("composite_bps"),
        )
        .orderBy("nation")
    )
