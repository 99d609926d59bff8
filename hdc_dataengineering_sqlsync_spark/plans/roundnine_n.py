"""SURVEY.md §2 round-9 batch N: two-antecedent association rules, the
A/B sample-ratio-mismatch guardrail, and the 3-D skyline.

  wl_rules_two_antecedent  {A,B}→C confidence from triple/pair supports
  wl_ab_srm_guardrail      sample-ratio mismatch χ² in pure integers
  wl_skyline_3d            d>2 Pareto frontier via blocked dominance anti-join

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ----- 2.12 composite: {A,B} → C rules (apriori rule generation, k=3)

# shares the basket-enumeration CTE prefix with wl_basket_triples
# (roundnine_g.BASKET_ENUM_CTES) so an enumeration fix lands in both
from hdc_dataengineering_sqlsync_spark.plans.roundnine_g import (  # noqa: E402
    BASKET_ENUM_CTES,
    brand_baskets,
    triple_supports,
)

_RULES_ORACLE = (
    BASKET_ENUM_CTES
    + """
, tsupp AS (
  SELECT b1, b2, b3, CAST(count(*) AS BIGINT) AS c3
  FROM tri GROUP BY 1, 2, 3
),
psupp AS (
  SELECT b1, b2, CAST(count(*) AS BIGINT) AS c2
  FROM (SELECT arr[i] AS b1, unnest(arr[i+1:]) AS b2 FROM idx)
  GROUP BY 1, 2
)
SELECT t.b1 AS ante1, t.b2 AS ante2, t.b3 AS conseq, t.c3 AS support,
       CAST(t.c3 * 10000 // p.c2 AS BIGINT) AS conf_bps
FROM tsupp t JOIN psupp p ON p.b1 = t.b1 AND p.b2 = t.b2
ORDER BY support DESC, conf_bps DESC, ante1, ante2, conseq
LIMIT 15
"""
)


@query("wl_rules_two_antecedent", "2.12 composite workloads", _RULES_ORACLE)
def wl_rules_two_antecedent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori RULE GENERATION at k=3: {A,B} → C with confidence =
    supp(ABC) · 10⁴ div supp(AB) — the two-antecedent rules that pair
    mining (`wl_basket_lift`) cannot produce and triple counting alone
    (`wl_basket_triples`) does not score. The consequent is the ordered
    triple's LAST element, each rule scored once against its ordered
    antecedent pair; exact integer confidence, ties broken on the full
    key.

    Scale shape: the SAME blocked-by-order-key expansions as the pair
    and triple miners (never corpus-quadratic), with the pair-support
    table broadcast onto the triple supports; top-15 is TakeOrdered."""
    # pair supports + triple supports share the materialized basket
    basket = brand_baskets(spark, sf_dir).localCheckpoint()
    tsupp = triple_supports(basket)
    a, c = basket.alias("a"), basket.alias("c")
    psupp = (
        a.join(c, (F.col("c.ok") == F.col("a.ok")) & (F.col("c.b") > F.col("a.b")))
        .groupBy(F.col("a.b").alias("b1"), F.col("c.b").alias("b2"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return (
        tsupp.join(F.broadcast(psupp), ["b1", "b2"])
        .select(
            F.col("b1").alias("ante1"),
            F.col("b2").alias("ante2"),
            F.col("b3").alias("conseq"),
            F.col("c3").alias("support"),
            F.expr("c3 * 10000 DIV c2").alias("conf_bps"),
        )
        .orderBy(
            F.col("support").desc(),
            F.col("conf_bps").desc(),
            "ante1",
            "ante2",
            "conseq",
        )
        .limit(15)
    )


# ------- 2.12 composite: sample-ratio-mismatch guardrail (exact χ²)

# SRM: 50/50 assignment, χ² = (o1−o2)²/n vs the 95% cutoff 3.8415.
# Cross-multiplied: (o1−o2)² · 10⁴ > 38415 · n — pure int64 (counts²·10⁴
# stays ≪ 2⁶³ through 1000× fixture scale; divide by n first past that).

_SRM_ORACLE = """
WITH assigned AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         CAST(SUM(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS o_a,
         CAST(SUM(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS o_b
  FROM orders WHERE year(o_orderdate) = 1996
  GROUP BY 1
)
SELECT CAST(mon AS DATE) AS month, o_a, o_b,
       CAST((o_a - o_b) * (o_a - o_b) * 10000 // (o_a + o_b) AS BIGINT)
         AS chi2_e4,
       CASE WHEN (o_a - o_b) * (o_a - o_b) * 10000 > 38415 * (o_a + o_b)
            THEN 1 ELSE 0 END AS srm_flag
FROM assigned ORDER BY month
"""


@query("wl_ab_srm_guardrail", "2.12 composite workloads", _SRM_ORACLE)
def wl_ab_srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch — the guardrail every experimentation
    platform checks BEFORE reading any metric: under a 50/50 split the
    arm counts must pass the 1-df goodness-of-fit test, and a failure
    means the assignment itself is broken (bots, logging loss, biased
    bucketing) so the experiment is void. χ² = (o_a−o_b)²/n compared to
    the 95% cutoff by cross-multiplication — (o_a−o_b)²·10⁴ > 38415·n —
    so the flag is exact integer arithmetic; χ²·10⁴ is also reported.
    Complements `wl_ab_test_ztest` (the metric) with the validity check
    that must precede it.

    Scale shape: ONE map-side-combinable keyed agg over the pruned scan;
    flag math on the month-cell table."""
    o = load(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1996)
    assigned = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.sum(F.when(F.col("o_custkey") % 2 == 0, 1).otherwise(0)).alias("o_a"),
        F.sum(F.when(F.col("o_custkey") % 2 == 1, 1).otherwise(0)).alias("o_b"),
    )
    return (
        assigned.select(
            F.col("mon").cast("date").alias("month"),
            "o_a",
            "o_b",
            F.expr(
                "(o_a - o_b) * (o_a - o_b) * 10000 DIV (o_a + o_b)"
            ).alias("chi2_e4"),
            F.expr(
                "CASE WHEN (o_a - o_b) * (o_a - o_b) * 10000"
                " > 38415 * (o_a + o_b) THEN 1 ELSE 0 END"
            ).alias("srm_flag"),
        )
        .orderBy("month")
    )


# ------- 2.12 composite: 3-D skyline (Pareto frontier, d > 2)

_SKY3_ORACLE = """
WITH demand AS (
  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS dem
  FROM lineitem GROUP BY l_partkey
),
pts AS (
  SELECT DISTINCT p.p_brand AS brand, CAST(p.p_size AS BIGINT) AS size,
         CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT) AS cents,
         d.dem
  FROM part p JOIN demand d ON d.l_partkey = p.p_partkey
),
sky AS (
  SELECT * FROM pts a
  WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.brand = a.brand
      AND q.size <= a.size AND q.cents <= a.cents AND q.dem >= a.dem
      AND (q.size < a.size OR q.cents < a.cents OR q.dem > a.dem)
  )
)
SELECT brand, CAST(count(*) AS BIGINT) AS n_frontier,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(dem) AS BIGINT) AS max_dem
FROM sky GROUP BY brand ORDER BY brand
"""


@query("wl_skyline_3d", "2.12 composite workloads", _SKY3_ORACLE)
def wl_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D skyline — the d>2 Pareto frontier `wl_skyline_pareto_2d`'s
    docstring defers to: parts minimizing (size, price) while maximizing
    demand, per brand. Past two dimensions the running-prefix-min trick
    dies (no total order exists), so the operator is a DOMINANCE
    ANTI-JOIN — blocked per brand over the DISTINCT point set, with
    strict-on-at-least-one-axis semantics so ties survive (the standard
    skyline definition). Reported as the per-brand frontier census.

    Scale shape: the fact scan reduces to per-part demand (map-side),
    points dedup to the distinct tuple grid BEFORE the quadratic step,
    and the anti-join blocks on brand — per-block cost |pts|², bounded
    by the dimension table, never the fact table; the left-anti join is
    the one shuffle pair."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    demand = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("dem")
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_brand").alias("brand"),
        F.col("p_size").cast("long").alias("size"),
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    pts = (
        p.join(demand, p.p_partkey == demand.l_partkey)
        .select("brand", "size", "cents", "dem")
        .distinct()
    )
    a, q = pts.alias("a"), pts.alias("q")
    dominated = a.join(
        q,
        (F.col("q.brand") == F.col("a.brand"))
        & (F.col("q.size") <= F.col("a.size"))
        & (F.col("q.cents") <= F.col("a.cents"))
        & (F.col("q.dem") >= F.col("a.dem"))
        & (
            (F.col("q.size") < F.col("a.size"))
            | (F.col("q.cents") < F.col("a.cents"))
            | (F.col("q.dem") > F.col("a.dem"))
        ),
        "left_semi",
    )
    sky = pts.exceptAll(dominated)
    return (
        sky.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_frontier"),
            F.min("cents").alias("min_cents"),
            F.max("dem").alias("max_dem"),
        )
        .orderBy("brand")
    )
