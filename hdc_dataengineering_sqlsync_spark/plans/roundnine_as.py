"""SURVEY.md §2 round-9 batch AS: pocket-price waterfall, 4-4-5 retail
calendar, priority-inversion audit.

  wl_pocket_price_waterfall  gross→net→pocket stages in exact cents
  fn_retail_calendar_445     date → 4-4-5 fiscal period, integer math
  wl_priority_inversion_audit  does URGENT actually ship faster?

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: pocket-price waterfall (gross→net→pocket)

_POCKET_ORACLE = """
WITH stages AS (
  SELECT p.p_brand AS brand,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS gross,
         CAST(floor(l.l_extendedprice * l.l_discount * 100 + 0.5)
              AS BIGINT) AS disc,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * l.l_tax * 100
                    + 0.5) AS BIGINT) AS tax
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(l.l_shipdate) = 1996
)
SELECT brand,
       CAST(SUM(gross) AS BIGINT) AS gross_cents,
       CAST(SUM(disc) AS BIGINT) AS discount_cents,
       CAST(SUM(gross) - SUM(disc) AS BIGINT) AS invoice_cents,
       CAST(SUM(tax) AS BIGINT) AS tax_cents,
       CAST(SUM(gross) - SUM(disc) + SUM(tax) AS BIGINT) AS pocket_cents,
       CAST(SUM(disc) * 10000 // SUM(gross) AS BIGINT) AS leakage_bps
FROM stages GROUP BY brand ORDER BY brand
"""


@query(
    "wl_pocket_price_waterfall", "2.12 composite workloads", _POCKET_ORACLE
)
def wl_pocket_price_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pocket-price waterfall — pricing's core diagnostic (list price is
    fiction; what lands in the pocket is real): gross → discount
    leakage → invoice → tax → pocket, per brand, every stage an exact
    integer cent sum quantized AT THE LINE (floor(x·100+0.5) per
    component before summing — the waterfall must reconcile stage by
    stage, and per-line quantization is how invoices actually round).
    Leakage in exact bps is the number pricing reviews sort on.

    Scale shape: one keyed agg over the broadcast part join — all four
    stage sums ride the same map-combinable pass."""
    li = load(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1996)
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    stages = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "brand",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("gross"),
        F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100 + 0.5)
        .cast("long")
        .alias("disc"),
        F.floor(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * F.col("l_tax")
            * 100
            + 0.5
        )
        .cast("long")
        .alias("tax"),
    )
    return (
        stages.groupBy("brand")
        .agg(
            F.sum("gross").alias("gross_cents"),
            F.sum("disc").alias("discount_cents"),
            (F.sum("gross") - F.sum("disc")).alias("invoice_cents"),
            F.sum("tax").alias("tax_cents"),
            (F.sum("gross") - F.sum("disc") + F.sum("tax")).alias(
                "pocket_cents"
            ),
            F.expr("SUM(disc) * 10000 DIV SUM(gross)").alias("leakage_bps"),
        )
        .orderBy("brand")
    )


# ------ 2.7 scalar functions: 4-4-5 retail calendar mapping

# fiscal year starts on the fixed epoch 1992-01-01 (a Wednesday is fine —
# the mapping is pure week arithmetic from the anchor, no weekday games)
_CAL_ORACLE = """
WITH d AS (
  SELECT o_orderkey AS k, o_orderdate AS dt,
         date_diff('day', DATE '1992-01-01', o_orderdate) // 7 AS wk
  FROM orders WHERE year(o_orderdate) BETWEEN 1994 AND 1996
),
mapped AS (
  SELECT k, dt, wk,
         wk // 52 AS fy,
         wk % 52 AS wk_in_year,
         CASE WHEN (wk % 52) % 13 < 4 THEN 1
              WHEN (wk % 52) % 13 < 8 THEN 2 ELSE 3 END
           + ((wk % 52) // 13) * 3 AS fp
  FROM d
)
SELECT CAST(fy AS INT) AS fiscal_year, CAST(fp AS INT) AS fiscal_period,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(dt) AS first_day, max(dt) AS last_day
FROM mapped GROUP BY fy, fp ORDER BY fiscal_year, fiscal_period
"""


@query("fn_retail_calendar_445", "2.7 scalar functions", _CAL_ORACLE)
def fn_retail_calendar_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4-4-5 retail calendar — the fiscal mapping every retail
    analytics migration curses: weeks since a fixed anchor bucket into
    4-week/4-week/5-week periods (three per 13-week quarter, twelve per
    52-week year), all PURE integer division on day counts — no
    weekday logic, no locale, no month lengths — so two engines cannot
    disagree on which period a date belongs to. The census (orders per
    fiscal period with first/last day) exposes the 4-4-5 ↔ Gregorian
    misalignment that breaks naive month-over-month comparisons.

    Scale shape: the mapping is map-side scalar arithmetic; the census
    folds to fiscal-period cells."""
    d = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").between(1994, 1996))
        .select(
            F.col("o_orderdate").alias("dt"),
            F.expr(
                "datediff(o_orderdate, DATE '1992-01-01') DIV 7"
            ).alias("wk"),
        )
    )
    mapped = d.select(
        "dt",
        F.expr("wk DIV 52").cast("int").alias("fiscal_year"),
        (
            F.expr(
                "CASE WHEN (wk % 52) % 13 < 4 THEN 1"
                " WHEN (wk % 52) % 13 < 8 THEN 2 ELSE 3 END"
            )
            + F.expr("((wk % 52) DIV 13) * 3")
        )
        .cast("int")
        .alias("fiscal_period"),
    )
    return (
        mapped.groupBy("fiscal_year", "fiscal_period")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("dt").alias("first_day"),
            F.max("dt").alias("last_day"),
        )
        .orderBy("fiscal_year", "fiscal_period")
    )


# ------ 2.12 composite: priority-inversion audit (stochastic dominance)

_INVERSION_ORACLE = """
WITH ship AS (
  SELECT l_orderkey AS k, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
),
lead_ AS (
  SELECT o.o_orderpriority AS prio,
         date_diff('day', o.o_orderdate, s.ship) AS lt
  FROM orders o JOIN ship s ON s.k = o.o_orderkey
  WHERE year(o.o_orderdate) = 1996
    AND o.o_orderpriority IN ('1-URGENT', '5-LOW')
),
hu AS (
  SELECT lt, CAST(count(*) AS BIGINT) AS c FROM lead_
  WHERE prio = '1-URGENT' GROUP BY lt
),
hl AS (
  SELECT lt, CAST(count(*) AS BIGINT) AS c FROM lead_
  WHERE prio = '5-LOW' GROUP BY lt
),
u2 AS (
  SELECT CAST(SUM(CASE WHEN hu.lt > hl.lt
                       THEN 2 * CAST(hu.c AS HUGEINT) * hl.c
                       WHEN hu.lt = hl.lt
                       THEN CAST(hu.c AS HUGEINT) * hl.c
                       ELSE 0 END) AS HUGEINT) AS twice_u,
         CAST((SELECT SUM(c) FROM hu) AS HUGEINT) AS nu,
         CAST((SELECT SUM(c) FROM hl) AS HUGEINT) AS nl
  FROM hu CROSS JOIN hl
)
SELECT CAST(nu AS BIGINT) AS n_urgent,
       CAST(nl AS BIGINT) AS n_low,
       CAST(twice_u AS BIGINT) AS twice_u,
       CAST(twice_u * 10000 // (2 * nu * nl) AS BIGINT) AS inversion_bps
FROM u2
"""


@query(
    "wl_priority_inversion_audit", "2.12 composite workloads",
    _INVERSION_ORACLE,
)
def wl_priority_inversion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority inversion — does 1-URGENT actually beat 5-LOW out the
    door? The pairwise probability P(urgent slower than low) with ties
    half-credited — exactly the Mann–Whitney U scaled to bps
    (inversion_bps near 5000 = priority is theater; near 0 = the queue
    honors it). The doubled-U trick (2U = 2·#> + #=) keeps everything
    integer, and the count runs on the CROSS-JOINED lead-time
    HISTOGRAMS (≤ a few hundred cells each), never on order pairs.

    Scale shape: lead times from one keyed agg; two day-grain
    histograms; the U census is a histogram cross join — |cells|², not
    |orders|²."""
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.max("l_shipdate").alias("ship"))
    )
    o = load(spark, sf_dir, "orders").where(
        (F.year("o_orderdate") == 1996)
        & F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    lead = o.join(ship, o.o_orderkey == ship.k).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff("ship", "o_orderdate").alias("lt"),
    )
    hu = (
        lead.where(F.col("prio") == "1-URGENT")
        .groupBy("lt")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("lt").alias("ult"), F.col("c").alias("uc"))
    )
    hl = (
        lead.where(F.col("prio") == "5-LOW")
        .groupBy("lt")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("lt").alias("llt"), F.col("c").alias("lc"))
    )
    nu = hu.agg(F.sum("uc").cast("decimal(38,0)").alias("nu"))
    nl = hl.agg(F.sum("lc").cast("decimal(38,0)").alias("nl"))
    cross = hu.crossJoin(hl).agg(
        F.sum(
            F.when(
                F.col("ult") > F.col("llt"),
                2 * F.col("uc").cast("decimal(38,0)") * F.col("lc"),
            )
            .when(
                F.col("ult") == F.col("llt"),
                F.col("uc").cast("decimal(38,0)") * F.col("lc"),
            )
            .otherwise(0)
        ).alias("twice_u")
    )
    return (
        cross.crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nl))
        .select(
            F.col("nu").cast("long").alias("n_urgent"),
            F.col("nl").cast("long").alias("n_low"),
            F.col("twice_u").cast("long").alias("twice_u"),
            F.expr(
                "CAST(twice_u * 10000 DIV (2 * nu * nl) AS BIGINT)"
            ).alias("inversion_bps"),
        )
    )
