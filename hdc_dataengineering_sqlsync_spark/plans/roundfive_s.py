"""SURVEY.md §2 round-5 additions, batch BB.

Overflow-tolerant aggregation (try_sum) and MAU growth accounting.
Registered after ``roundfive_r`` (plans/__init__.py) so the qids append
to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------- 2.4 aggregations: try_sum overflow semantics

_TRY_SUM_ORACLE = """
SELECT CAST(TRUE AS BOOLEAN) AS overflow_is_null,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS safe_cents_sum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
"""


@query("agg_try_sum_overflow", "2.4 aggregations", _TRY_SUM_ORACLE)
def agg_try_sum_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_sum: overflow yields NULL, not a dead job (and not a wrap).

    The aggregate-level member of the try_* family
    (`fn_try_arithmetic` covers the scalar ops): under ANSI mode a
    SUM that exceeds int64 kills the job (`fn_try_to_timestamp_formats`
    hit exactly this live at sf0.1); with ANSI off it silently WRAPS —
    strictly worse. `try_sum` is the declared third way: the overflowing
    aggregate comes back NULL, the job finishes, and the audit column
    makes the overflow visible. The probe multiplies cents by 10^9 (per-row products stay
    inside int64 — a bigger factor would overflow the MULTIPLY, a
    different error) so the SUM overflows at every fixture scale; the safe column (plain
    cents) proves the same pass still aggregates normally. The real
    remedy at 100 TB is headroom math — DECIMAL(38,0) sums, the
    second-moment discipline — try_sum is the guardrail that tells you
    WHEN you need it.

    Scale shape: ordinary map-combinable aggregation; try_sum's
    overflow check is per-merge, no extra pass."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return o.agg(
        F.isnull(F.try_sum(cents * F.lit(10**9))).alias("overflow_is_null"),
        F.sum(cents).alias("safe_cents_sum"),
        F.count(F.lit(1)).alias("n"),
    )


# ------------- 2.12 workloads: MAU growth accounting

_GROWTH_ORACLE = """
WITH cm AS (
  SELECT DISTINCT o_custkey AS cust,
         year(o_orderdate) * 12 + month(o_orderdate) AS mo
  FROM orders
),
firsts AS (SELECT cust, MIN(mo) AS first_mo FROM cm GROUP BY cust),
prev AS (SELECT cust, mo + 1 AS mo FROM cm),
j AS (
  SELECT COALESCE(cm.mo, prev.mo) AS mo,
         cm.cust AS cur_cust,
         prev.cust AS prev_cust,
         f.first_mo
  FROM cm
  FULL OUTER JOIN prev ON cm.cust = prev.cust AND cm.mo = prev.mo
  LEFT JOIN firsts f ON f.cust = COALESCE(cm.cust, prev.cust)
)
SELECT CAST(mo AS BIGINT) AS mo,
       CAST(COUNT(*) FILTER (WHERE cur_cust IS NOT NULL AND first_mo = mo)
            AS BIGINT) AS n_new,
       CAST(COUNT(*) FILTER (WHERE cur_cust IS NOT NULL
                               AND prev_cust IS NOT NULL) AS BIGINT)
         AS n_retained,
       CAST(COUNT(*) FILTER (WHERE cur_cust IS NOT NULL
                               AND prev_cust IS NULL AND first_mo < mo)
            AS BIGINT) AS n_resurrected,
       CAST(COUNT(*) FILTER (WHERE cur_cust IS NULL) AS BIGINT) AS n_churned,
       (COUNT(*) FILTER (WHERE cur_cust IS NOT NULL AND first_mo = mo)
        + COUNT(*) FILTER (WHERE cur_cust IS NOT NULL
                             AND prev_cust IS NULL AND first_mo < mo))
         * 10000 // NULLIF(COUNT(*) FILTER (WHERE cur_cust IS NULL), 0)
         AS quick_ratio_bps
FROM j GROUP BY mo ORDER BY mo
"""


@query("wl_growth_accounting", "2.12 composite workloads", _GROWTH_ORACLE)
def wl_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: new / retained / resurrected / churned + quick ratio.

    The standard MAU decomposition (Social-Capital style): for month m,
    every active customer is NEW (first-ever month), RETAINED (also
    active in m−1) or RESURRECTED (active before, dark in m−1); every
    m−1 active who went dark is CHURNED into m. Quick ratio =
    (new + resurrected) / churned in integer bps — the single number
    that says whether growth is outrunning leakage. Identity checks
    ride the census for free: new+retained+resurrected = MAU(m),
    retained + churned = MAU(m−1).

    Scale shape: facts collapse FIRST to the distinct (customer, month)
    grain; the month-over-month comparison is ONE full-outer
    self-equi-join on (customer, month+1) over the reduced table plus a
    broadcast-scale firsts lookup (per-customer min) — the NRR shape
    (`wl_net_revenue_retention`) extended to user-state transitions;
    the census is a tiny per-month rollup."""
    cm = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mo"),
        )
        .distinct()
    )
    firsts = cm.groupBy("cust").agg(F.min("mo").alias("first_mo"))
    cur = cm.select(F.col("cust").alias("cur_cust"), "mo")
    prev = cm.select(F.col("cust").alias("prev_cust"), (F.col("mo") + 1).alias("mo"))
    j = (
        cur.join(
            prev,
            (cur.cur_cust == prev.prev_cust) & (cur.mo == prev.mo),
            "full_outer",
        )
        .select(
            F.coalesce(cur.mo, prev.mo).alias("mo"),
            "cur_cust",
            "prev_cust",
            F.coalesce("cur_cust", "prev_cust").alias("cust"),
        )
        .join(firsts, "cust", "left")
    )
    cur_active = F.col("cur_cust").isNotNull()
    is_new = cur_active & (F.col("first_mo") == F.col("mo"))
    is_ret = cur_active & F.col("prev_cust").isNotNull()
    is_res = cur_active & F.col("prev_cust").isNull() & (F.col("first_mo") < F.col("mo"))
    is_churn = ~cur_active
    return (
        j.groupBy(F.col("mo").cast("long").alias("mo"))
        .agg(
            F.sum(is_new.cast("long")).alias("n_new"),
            F.sum(is_ret.cast("long")).alias("n_retained"),
            F.sum(is_res.cast("long")).alias("n_resurrected"),
            F.sum(is_churn.cast("long")).alias("n_churned"),
            F.expr(
                "(sum(cast(cur_cust is not null and first_mo = mo as long))"
                " + sum(cast(cur_cust is not null and prev_cust is null"
                "            and first_mo < mo as long)))"
                " * 10000 div nullif(sum(cast(cur_cust is null as long)), 0)"
            ).alias("quick_ratio_bps"),
        )
        .orderBy("mo")
    )
