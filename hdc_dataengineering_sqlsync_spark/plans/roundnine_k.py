"""SURVEY.md §2 round-9 batch K: classifier precision/recall/F1 from the
lang-ID confusion matrix, and the decile lift/gains table for scored
targeting.

  text_langid_prf       per-class P/R/F1 in integer bps over the heuristic
  wl_lift_gains_deciles cumulative-capture and lift per score decile

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ---- 2.9 llm-data: per-class precision/recall/F1 of the lang-ID heuristic

_PRF_ORACLE = r"""
WITH scored AS (
  SELECT lang,
         len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), ['the','and','of'])) AS h_en,
         len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), ['der','die','und'])) AS h_de,
         len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), ['el','los','que'])) AS h_es,
         len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), ['le','les','des'])) AS h_fr
  FROM documents
),
guessed AS (
  SELECT lang,
         CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
              WHEN h_fr = greatest(h_en, h_de, h_es, h_fr) THEN 'fr'
              WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
              WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
              ELSE 'de' END AS lang_guess
  FROM scored
),
classes AS (
  SELECT lang AS cls FROM guessed
  UNION SELECT lang_guess FROM guessed
),
m AS (
  SELECT c.cls,
         CAST(SUM(CASE WHEN g.lang = c.cls AND g.lang_guess = c.cls
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN g.lang <> c.cls AND g.lang_guess = c.cls
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN g.lang = c.cls AND g.lang_guess <> c.cls
                       THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM classes c CROSS JOIN guessed g
  GROUP BY c.cls
)
SELECT cls, tp, fp, fn,
       CAST(CASE WHEN tp + fp > 0 THEN tp * 10000 // (tp + fp) ELSE 0 END
            AS BIGINT) AS precision_bps,
       CAST(CASE WHEN tp + fn > 0 THEN tp * 10000 // (tp + fn) ELSE 0 END
            AS BIGINT) AS recall_bps,
       CAST(CASE WHEN 2 * tp + fp + fn > 0
                 THEN 2 * tp * 10000 // (2 * tp + fp + fn) ELSE 0 END
            AS BIGINT) AS f1_bps
FROM m ORDER BY cls
"""


@query("text_langid_prf", "2.9 llm-data", _PRF_ORACLE)
def text_langid_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the marker-word lang-ID
    heuristic against the stored label — the MODEL-EVALUATION layer on
    top of `text_lang_id`'s raw confusion counts (F1's harmonic mean
    computed directly as 2·tp / (2·tp+fp+fn), one exact integral division
    — never an average of two rounded ratios). Classes = union of true
    and guessed labels, so a never-guessed or never-true class ('und')
    still reports with its zero guard.

    Scale shape: the heuristic is codegen string work per doc; per-class
    counters come from ONE keyed agg over the (lang, guess) census (25
    cells) against the ≤6-row class list — nothing downstream scales
    with corpus size."""
    from hdc_dataengineering_sqlsync_spark.operators.text import lang_id_heuristic

    g = lang_id_heuristic(load(spark, sf_dir, "documents")).select(
        "lang", "lang_guess"
    )
    # the 25-cell census is consumed three times (two class projections +
    # the cross join); localCheckpoint materializes it so the corpus is
    # scanned ONCE (plan-asserted), the graph_pagerank reuse discipline
    census = (
        g.groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    classes = (
        census.select(F.col("lang").alias("cls"))
        .union(census.select("lang_guess"))
        .distinct()
    )
    m = (
        classes.crossJoin(F.broadcast(census))
        .groupBy("cls")
        .agg(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("lang_guess") == F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when(
                    (F.col("lang") != F.col("cls"))
                    & (F.col("lang_guess") == F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("lang_guess") != F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).alias("fn"),
        )
    )
    guard = lambda num, den, name: F.expr(  # noqa: E731
        f"CAST(CASE WHEN {den} > 0 THEN {num} * 10000 DIV ({den}) ELSE 0 END"
        " AS BIGINT)"
    ).alias(name)
    return m.select(
        "cls",
        "tp",
        "fp",
        "fn",
        guard("tp", "tp + fp", "precision_bps"),
        guard("tp", "tp + fn", "recall_bps"),
        guard("2 * tp", "2 * tp + fp + fn", "f1_bps"),
    ).orderBy("cls")


# ------ 2.12 composite: decile lift / gains table for scored targeting

_LIFT_ORACLE = """
WITH pos AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
),
scored AS (
  SELECT c.c_custkey,
         CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS score,
         CASE WHEN p.o_custkey IS NULL THEN 0 ELSE 1 END AS y
  FROM customer c LEFT JOIN pos p ON p.o_custkey = c.c_custkey
),
ranked AS (
  SELECT score, y,
         ntile(10) OVER (ORDER BY score DESC, c_custkey) AS decile
  FROM scored
),
per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM ranked GROUP BY decile
),
tot AS (SELECT SUM(n) AS nn, SUM(pos) AS pp FROM per)
SELECT per.decile, per.n, per.pos,
       CAST(SUM(per.pos) OVER (ORDER BY per.decile) * 10000 // t.pp AS BIGINT)
         AS cum_capture_bps,
       CAST(CAST(per.pos AS HUGEINT) * t.nn * 10000
            // (CAST(per.n AS HUGEINT) * t.pp) AS BIGINT) AS lift_bps
FROM per CROSS JOIN tot t
ORDER BY per.decile
"""


@query("wl_lift_gains_deciles", "2.12 composite workloads", _LIFT_ORACLE)
def wl_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table — THE targeting-model report: customers
    ranked by score (account balance as the propensity proxy), cut into
    10 equal deciles (ntile with a deterministic (score DESC, key)
    tiebreak — both engines cut identically), outcome = ordered in 1995;
    per decile the positive count, the cumulative capture curve in bps
    of all positives, and lift vs the base rate as (pos_d·N·10⁴) div
    (n_d·P) — one exact integral division, never a ratio of two rounded
    rates. Complements `simsearch_ndcg_eval` (ranking) and
    `wl_scorecard_woe` (binning): this is the CAMPAIGN-economics view.

    Scale shape: the positives set reduces to DISTINCT custkeys
    co-partitioned with the customer scan; ntile is the one global-order
    step (score-sorted deciles are inherently a total order — at 100 TB
    the rank comes from a quantile-sketch cut instead, same downstream
    algebra); per-decile rollup and the 10-row window are cell-sized."""
    pos = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
    )
    scored = (
        load(spark, sf_dir, "customer")
        .join(pos, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("score"),
            F.when(F.col("o_custkey").isNull(), 0).otherwise(1).alias("y"),
        )
    )
    ranked = scored.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.col("score").desc(), "c_custkey")),
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    tot = per.agg(
        F.sum("n").alias("nn"), F.sum("pos").alias("pp")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "pos",
            (F.sum("pos").over(wcum) * 10000).alias("cap_num"),
            "nn",
            "pp",
        )
        .select(
            "decile",
            "n",
            "pos",
            F.expr("cap_num DIV pp").alias("cum_capture_bps"),
            # widen both sides: pos·N·10⁴ and n·P each exceed int64 once
            # customers reach ~1e10 (the mix_budget_apportion_lr class)
            F.expr(
                "CAST(CAST(pos AS DECIMAL(38,0)) * nn * 10000"
                " DIV (CAST(n AS DECIMAL(38,0)) * pp) AS BIGINT)"
            ).alias("lift_bps"),
        )
        .orderBy("decile")
    )
