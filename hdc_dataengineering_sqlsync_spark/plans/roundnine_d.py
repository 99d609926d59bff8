"""SURVEY.md §2 round-9 batch D: dedup operating curve, OEE equipment
effectiveness, trading-day calendar adjustment.

  dedup_threshold_curve    dup pairs/docs as a function of the Jaccard cut
  wl_oee_effectiveness     availability x performance x quality, exact bps
  ts_trading_day_adjust    per-trading-day revenue normalization

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ---------- 2.9 llm-data: dedup operating curve (threshold sweep)

# same df-capped token universe as dedup_near_jaccard (llmdata.py) — the
# shared blocking discipline that bounds hot-token pair fan-out
_TC_MAX_DF = 50
_TC_THRESHOLDS = (5000, 6000, 7000, 8000, 9000)  # jaccard basis points

_CURVE_ORACLE = f"""
WITH tok0 AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
),
df AS (SELECT lang, token, count(*) AS df FROM tok0 GROUP BY lang, token),
tok AS (
  SELECT tok0.* FROM tok0 JOIN df USING (lang, token) WHERE df.df <= {_TC_MAX_DF}
),
sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM tok a JOIN tok b
    ON a.lang = b.lang AND a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b,
         CAST(i * 10000 // (sa.sz + sb.sz - i) AS BIGINT) AS jac_bps
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT CAST(t.t AS BIGINT) AS threshold_bps,
       CAST(count(*) FILTER (p.jac_bps >= t.t) AS BIGINT) AS n_dup_pairs,
       CAST(count(DISTINCT CASE WHEN p.jac_bps >= t.t THEN p.id_b END) AS BIGINT)
         AS n_docs_flagged
FROM (SELECT unnest([{", ".join(map(str, _TC_THRESHOLDS))}]) AS t) t
CROSS JOIN pairs p
GROUP BY t.t ORDER BY threshold_bps
"""


@query("dedup_threshold_curve", "2.9 llm-data", _CURVE_ORACLE)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup OPERATING CURVE — how many pairs/documents each Jaccard
    threshold would remove: the tuning artifact a corpus team produces
    before committing to a cut (too low loses data, too high keeps
    near-dups). Pairs are computed ONCE over the df-capped (≤50 per
    lang-token) universe in exact integer basis points, then swept over 5
    thresholds with conditional aggregates; ``n_docs_flagged`` counts the
    LATER doc of each pair (the keep-first convention the dedup family
    uses).

    Scale shape: one blocked pair pass (the dedup_near_jaccard discipline
    — the df cap bounds hot-token fan-out), then the sweep is a 5-row
    broadcast cross join + one agg over the pair table; adding thresholds
    costs nothing but census width."""
    d = load(spark, sf_dir, "documents")
    # tok0 feeds the df census AND the capped token list; tok feeds the
    # pair self-join (both sides) AND the size census; sizes broadcasts
    # twice. Checkpoint each once so the corpus explode runs ONCE — the
    # r10 plan audit caught the explode subtree recomputing (8 fact scans
    # in one plan without this, vs the docstring's 'pairs computed ONCE').
    tok0 = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    df_tbl = tok0.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("df"))
    tok = (
        tok0.join(df_tbl.where(F.col("df") <= _TC_MAX_DF), ["lang", "token"])
        .select("doc_id", "lang", "token")
        .localCheckpoint(eager=True)
    )
    sizes = (
        tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz")).localCheckpoint(eager=True)
    )
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = F.broadcast(sizes).alias("sa")
    sb = F.broadcast(sizes).alias("sb")
    pairs = (
        inter.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            F.expr("i * 10000 DIV (sa.sz + sb.sz - i)").alias("jac_bps"),
        )
    )
    thresholds = spark.createDataFrame([(t,) for t in _TC_THRESHOLDS], "t long")
    return (
        pairs.crossJoin(F.broadcast(thresholds))
        .groupBy(F.col("t").alias("threshold_bps"))
        .agg(
            F.count(F.when(F.col("jac_bps") >= F.col("t"), 1)).alias("n_dup_pairs"),
            F.countDistinct(
                F.when(F.col("jac_bps") >= F.col("t"), F.col("id_b"))
            ).alias("n_docs_flagged"),
        )
        .orderBy("threshold_bps")
    )


# ---------- 2.12 composite: OEE (availability x performance x quality)

_OEE_ORACLE = """
WITH base AS (
  SELECT l_suppkey AS supp,
         count(*) AS n_lines,
         SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS n_finished,
         SUM(CAST(l_quantity AS BIGINT)) AS qty,
         SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS n_good
  FROM lineitem GROUP BY l_suppkey
),
rates AS (
  SELECT supp,
         n_finished * 10000 // n_lines AS a_bps,
         qty * 10000 // (n_lines * 50) AS p_bps,
         n_good * 10000 // n_lines AS q_bps
  FROM base
),
oee AS (
  SELECT supp, a_bps, p_bps, q_bps,
         a_bps * p_bps * q_bps // 100000000 AS oee_bps
  FROM rates
)
SELECT CAST(oee_bps // 1000 AS BIGINT) AS oee_band,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(min(oee_bps) AS BIGINT) AS min_oee_bps,
       CAST(max(oee_bps) AS BIGINT) AS max_oee_bps
FROM oee GROUP BY 1 ORDER BY oee_band
"""


@query("wl_oee_effectiveness", "2.12 composite workloads", _OEE_ORACLE)
def wl_oee_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OEE (Overall Equipment Effectiveness) — the manufacturing KPI
    A×P×Q, computed per supplier as a work-center proxy: availability =
    finished-line share, performance = delivered quantity over line
    capacity (50/line, the fixture max), quality = non-returned share.
    Every factor is exact integer basis points and the product divides
    back by 10^8 with integer floor — identical algebra in both engines
    (a_bps·p_bps·q_bps ≤ 10^12, inside int64 with 6 digits to spare).
    Output is the supplier census per OEE band (0.1 = 1000 bps wide).

    Scale shape: ONE map-side-combinable keyed aggregate over the fact
    scan; the KPI math runs on the #suppliers-row table."""
    li = load(spark, sf_dir, "lineitem")
    base = li.groupBy(F.col("l_suppkey").alias("supp")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias("n_good"),
    )
    rates = base.select(
        F.expr("n_finished * 10000 DIV n_lines").alias("a_bps"),
        F.expr("qty * 10000 DIV (n_lines * 50)").alias("p_bps"),
        F.expr("n_good * 10000 DIV n_lines").alias("q_bps"),
    )
    oee = rates.select(
        F.expr("a_bps * p_bps * q_bps DIV 100000000").alias("oee_bps")
    )
    return (
        oee.groupBy(F.expr("oee_bps DIV 1000").alias("oee_band"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.min("oee_bps").alias("min_oee_bps"),
            F.max("oee_bps").alias("max_oee_bps"),
        )
        .orderBy("oee_band")
    )


# -------- 2.10 time series: trading-day calendar adjustment

_TDA_ORACLE = """
WITH daily AS (
  SELECT date_trunc('month', l_shipdate) AS mon, CAST(l_shipdate AS DATE) AS day,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2
)
SELECT CAST(year(mon) AS INT) AS yr, CAST(month(mon) AS INT) AS mon,
       CAST(SUM(rev) AS BIGINT) AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_trading_days,
       CAST(SUM(rev) // COUNT(*) AS BIGINT) AS rev_per_day_cents
FROM daily GROUP BY 1, 2 ORDER BY yr, mon
"""


@query("ts_trading_day_adjust", "2.10 streaming/time series", _TDA_ORACLE)
def ts_trading_day_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trading-day calendar adjustment — the normalization every monthly
    economic series needs before month-over-month comparison: a 31-day
    month with 23 active days is not 'up' on a 28-day month with 20.
    Observed trading days = distinct days with activity (the series' own
    calendar, not an assumed one); adjusted level = exact integer cents
    per trading day.

    Scale shape: two-level reduction (daily grain map-side, then the
    month rollup where COUNT(*) of the daily rows IS the trading-day
    count) — no second scan, no distinct-count over raw rows."""
    li = load(spark, sf_dir, "lineitem")
    daily = (
        li.where(F.year("l_shipdate").isin(1995, 1996))
        .groupBy(
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mon"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("rev")
        )
    )
    return (
        daily.groupBy("yr", "mon")
        .agg(
            F.sum("rev").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_trading_days"),
        )
        .select(
            "yr",
            "mon",
            "rev_cents",
            "n_trading_days",
            F.expr("rev_cents DIV n_trading_days").alias("rev_per_day_cents"),
        )
        .orderBy("yr", "mon")
    )
