"""SURVEY.md §2 round-9 batch W: decision-stump split search,
Kruskal–Wallis rank test, format-conformance DQ.

  wl_gini_split_stump    best binary split by exact fixed-point Gini cost
  wl_kruskal_wallis      rank-based one-way test, doubled-rank integers
  dq_format_conformance  regex conformance census over deterministic dirt

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: decision-stump split search, exact Gini cost

_GINI_SPLIT_ORACLE = """
WITH cells AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS pos
  FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(n) AS nt, SUM(pos) AS post FROM cells),
cum AS (
  SELECT q,
         CAST(SUM(n) OVER (ORDER BY q) AS HUGEINT) AS nl,
         CAST(SUM(pos) OVER (ORDER BY q) AS HUGEINT) AS posl
  FROM cells
),
cost AS (
  SELECT c.q AS threshold,
         CAST(c.nl AS BIGINT) AS n_left,
         CAST(c.posl AS BIGINT) AS pos_left,
         CAST(t.nt - c.nl AS BIGINT) AS n_right,
         CAST(t.post - c.posl AS BIGINT) AS pos_right,
         CAST(
           (c.nl * c.nl - c.posl * c.posl
            - (c.nl - c.posl) * (c.nl - c.posl)) * 1000000000 // c.nl
           + ((t.nt - c.nl) * (t.nt - c.nl)
              - (t.post - c.posl) * (t.post - c.posl)
              - ((t.nt - c.nl) - (t.post - c.posl))
                * ((t.nt - c.nl) - (t.post - c.posl))) * 1000000000
             // (t.nt - c.nl)
           AS BIGINT) AS cost_e9
  FROM cum c CROSS JOIN tot t
  WHERE c.nl < t.nt
)
SELECT * FROM cost ORDER BY cost_e9, threshold LIMIT 1
"""


@query("wl_gini_split_stump", "2.12 composite workloads", _GINI_SPLIT_ORACLE)
def wl_gini_split_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search — the inner loop of every tree
    learner: scan candidate thresholds on quantity, score each binary
    split by weighted Gini impurity, return the argmin. The cost is
    held EXACT: n·Gini(n,pos) = (n² − pos² − neg²)/n per side, each side
    closed with one integral e9 division in wide integers (n² crosses
    int64 past ~3e9 rows — HUGEINT/DECIMAL(38,0) carries it), so the
    winning threshold can never flip on float noise — the
    reproducibility property distributed tree training needs.

    Scale shape: the feature histogram reduces map-side to ~50 quantity
    cells; cumulative left-side counts are ONE ordered pass over those
    cells (never the fact); the argmin is a 50-row sort. At 100 TB the
    histogram is the only fact-sized work — one map-combinable agg."""
    cells = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.round("l_quantity").cast("long").alias("q"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("pos"),
        )
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "q",
        F.sum("n").over(w).cast("decimal(38,0)").alias("nl"),
        F.sum("pos").over(w).cast("decimal(38,0)").alias("posl"),
    )
    tot = cells.agg(
        F.sum("n").cast("decimal(38,0)").alias("nt"),
        F.sum("pos").cast("decimal(38,0)").alias("post"),
    )
    cost = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("nl") < F.col("nt"))
        .select(
            F.col("q").alias("threshold"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("posl").cast("long").alias("pos_left"),
            (F.col("nt") - F.col("nl")).cast("long").alias("n_right"),
            (F.col("post") - F.col("posl")).cast("long").alias("pos_right"),
            F.expr(
                "CAST((nl * nl - posl * posl - (nl - posl) * (nl - posl))"
                " * 1000000000 DIV nl"
                " + ((nt - nl) * (nt - nl) - (post - posl) * (post - posl)"
                "    - ((nt - nl) - (post - posl))"
                "      * ((nt - nl) - (post - posl))) * 1000000000"
                "   DIV (nt - nl) AS BIGINT)"
            ).alias("cost_e9"),
        )
    )
    return cost.orderBy("cost_e9", "threshold").limit(1)


# ------ 2.12 composite: Kruskal–Wallis H via doubled integer ranks

_KW_ORACLE = """
WITH vals AS (
  SELECT o_orderpriority AS grp,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
cells AS (
  SELECT cents, grp, CAST(count(*) AS BIGINT) AS c
  FROM vals GROUP BY cents, grp
),
vcell AS (
  SELECT cents, CAST(SUM(c) AS BIGINT) AS cnt FROM cells GROUP BY cents
),
ranked AS (
  SELECT cents, cnt,
         CAST(SUM(cnt) OVER (ORDER BY cents) - cnt AS BIGINT) AS cum_before
  FROM vcell
),
gsum AS (
  SELECT c.grp,
         CAST(SUM(c.c) AS BIGINT) AS n_i,
         CAST(SUM(CAST(c.c AS HUGEINT)
                  * (2 * r.cum_before + r.cnt + 1)) AS HUGEINT) AS s2_i
  FROM cells c JOIN ranked r ON r.cents = c.cents
  GROUP BY c.grp
),
tot AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(CAST(s2_i AS HUGEINT) * s2_i // n_i) AS HUGEINT) AS ssum
  FROM gsum
)
SELECT CAST(n AS BIGINT) AS n_total,
       CAST((SELECT count(*) FROM gsum) AS INT) AS k_groups,
       round(3.0 * CAST(ssum AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
             - 3.0 * (CAST(n AS DOUBLE) + 1), 4) AS h_stat
FROM tot
"""


@query("wl_kruskal_wallis", "2.12 composite workloads", _KW_ORACLE)
def wl_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H — the rank-based one-way test (the
    distribution-free sibling of wl_anova_oneway, extending
    wl_mannwhitney_u past two groups): do order priorities differ in
    price level? Ranks ARE integers once doubled (avg tie rank =
    min_rank + (ties−1)/2, so 2·R = 2·cum_before + ties + 1 — the
    agg_spearman_rank device), group rank-sums and Σ(2Rᵢ)²/nᵢ stay
    exact wide integers (the 4 in (2R)² cancels into H's 12/4 = 3),
    and H touches floating point in ONE final shared expression,
    rounded 4dp.

    Scale shape: the value histogram reduces map-side to (cents, grp)
    cells; the global rank pass is one window over the value-grain
    table; group moments fold to k=5 rows."""
    vals = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    cells = vals.groupBy("cents", "grp").agg(F.count(F.lit(1)).alias("c"))
    vcell = cells.groupBy("cents").agg(F.sum("c").alias("cnt"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vcell.select(
        "cents",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_before"),
    )
    gsum = (
        cells.join(ranked, "cents")
        .groupBy("grp")
        .agg(
            F.sum("c").alias("n_i"),
            F.sum(
                F.col("c").cast("decimal(38,0)")
                * (2 * F.col("cum_before") + F.col("cnt") + 1)
            ).alias("s2_i"),
        )
    )
    tot = gsum.agg(
        F.sum("n_i").alias("n"),
        F.count(F.lit(1)).cast("int").alias("k_groups"),
        F.sum(
            F.expr("CAST(s2_i * s2_i DIV n_i AS DECIMAL(38,0))")
        ).alias("ssum"),
    )
    return tot.select(
        F.col("n").alias("n_total"),
        "k_groups",
        F.round(
            F.lit(3.0)
            * F.col("ssum").cast("double")
            / (F.col("n").cast("double") * (F.col("n").cast("double") + 1))
            - F.lit(3.0) * (F.col("n").cast("double") + 1),
            4,
        ).alias("h_stat"),
    )


# ------- 2.6 data quality: format conformance over deterministic dirt

_FORMAT_ORACLE = """
WITH base AS (
  SELECT n_name AS nation, c_custkey,
         printf('%02d-%03d-%03d-%04d',
                n_nationkey + 10,
                c_custkey % 1000,
                (c_custkey // 7) % 1000,
                c_custkey % 10000) AS phone0,
         CAST(n_nationkey + 10 AS VARCHAR) AS want_cc
  FROM customer JOIN nation ON n_nationkey = c_nationkey
),
dirty AS (
  SELECT nation, c_custkey, want_cc,
         CASE WHEN c_custkey % 97 = 0
              THEN substr(phone0, 4) || 'X'
              WHEN c_custkey % 89 = 0
              THEN replace(phone0, '-', ' ')
              WHEN c_custkey % 83 = 0
              THEN '99' || substr(phone0, 3)
              ELSE phone0 END AS phone
  FROM base
),
checked AS (
  SELECT nation,
         CASE WHEN regexp_matches(phone,
              '^[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}$') THEN 1 ELSE 0 END
           AS ok_format,
         CASE WHEN substr(phone, 1, 2) = want_cc THEN 1 ELSE 0 END
           AS ok_prefix
  FROM dirty
)
SELECT nation,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(ok_format) AS BIGINT) AS n_format_ok,
       CAST(SUM(ok_prefix) AS BIGINT) AS n_prefix_ok,
       CAST(SUM(ok_format * ok_prefix) * 10000 // count(*) AS BIGINT)
         AS conform_bps
FROM checked GROUP BY nation ORDER BY nation
"""


@query("dq_format_conformance", "2.6 data quality", _FORMAT_ORACLE)
def dq_format_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-conformance census — the DQ rule class regex validators
    implement (phone/ID/postcode masks plus a semantic prefix rule):
    conformance per nation in exact bps. The fixture INJECTS
    deterministic dirt (two corruption modes keyed on custkey
    residues — truncation+junk and delimiter swap) so the checker has
    real failures to count and both engines must agree on every
    violation, not just on a vacuous all-pass (three modes keyed on
    custkey residues: truncation+junk, delimiter swap, and a
    format-valid/prefix-wrong country-code overwrite — the slim
    testdata customer carries no c_phone, so the clean phone itself is
    printf-derived from the keys identically in both engines).

    Scale shape: corruption + regex are map-side scalar work on the
    customer dim; census folds to 25 nation rows; the regex is anchored
    character-class-only, the subset with identical semantics across
    engines (printf %0Nd padding is likewise shared)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"),
        "c_custkey",
        F.format_string(
            "%02d-%03d-%03d-%04d",
            F.col("n_nationkey") + 10,
            F.col("c_custkey") % 1000,
            F.expr("c_custkey DIV 7 % 1000"),
            F.col("c_custkey") % 10000,
        ).alias("phone0"),
        (F.col("n_nationkey") + 10).cast("string").alias("want_cc"),
    )
    dirty = base.select(
        "nation",
        "want_cc",
        F.when(
            F.col("c_custkey") % 97 == 0,
            F.concat(F.expr("substr(phone0, 4)"), F.lit("X")),
        )
        .when(
            F.col("c_custkey") % 89 == 0,
            F.regexp_replace("phone0", "-", " "),
        )
        .when(
            F.col("c_custkey") % 83 == 0,
            F.concat(F.lit("99"), F.expr("substr(phone0, 3)")),
        )
        .otherwise(F.col("phone0"))
        .alias("phone"),
    )
    checked = dirty.select(
        "nation",
        F.when(
            F.col("phone").rlike("^[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}$"), 1
        )
        .otherwise(0)
        .alias("ok_format"),
        F.when(F.expr("substr(phone, 1, 2)") == F.col("want_cc"), 1)
        .otherwise(0)
        .alias("ok_prefix"),
    )
    return (
        checked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ok_format").alias("n_format_ok"),
            F.sum("ok_prefix").alias("n_prefix_ok"),
            F.expr(
                "SUM(ok_format * ok_prefix) * 10000 DIV count(*)"
            ).alias("conform_bps"),
        )
        .orderBy("nation")
    )
