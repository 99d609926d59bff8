"""SURVEY.md §2 round-6 batch C: a fully deterministic HLL sketch, BPE-unit
shard packing, and Bollinger bands.

`agg_hll_exact_registers` upgrades the estimate-class HLL family
(agg_approx_distinct / agg_hll_partial_merge are rows-only by driver
contract) to a HASH-MATCHED sketch: every stage — md5 bucket/rho extraction,
register maxes, the harmonic sum — is exact integer arithmetic shared by
both engines, with ONE final IEEE division, so the ESTIMATE ITSELF is
deterministic and oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------- 2.4 aggregations: deterministic HLL (exact registers)

_HLL_M = 64  # 2^6 buckets
# registers hold rho in 1..57 (56 hash bits + 1); scale the harmonic terms
# by 2^57 so 2^(57-M) is an exact integer for every register value, with
# empty buckets (M=0) contributing the full 2^57
_HLL_SCALE_POW = 57
_HLL_ALPHA_EXPR = "CAST(709 AS DOUBLE) / 1000"  # alpha_64 = 0.709 (canonical)

# final estimate: alpha * m^2 * 2^57 / sum_terms — sum_terms is an exact
# integer on both sides, so this ONE shared string is the only IEEE math
_HLL_EST_EXPR = (
    f"{_HLL_ALPHA_EXPR} * {_HLL_M * _HLL_M} * CAST({1 << _HLL_SCALE_POW} AS DOUBLE)"
    " / CAST(sum_terms AS DOUBLE)"
)


def _duck_md5_nibbles(expr: str, lo: int, hi: int) -> str:
    """DuckDB integer value of md5(expr) hex digits lo..hi (1-based,
    inclusive) — the offset generalization of catalog.duck_md5_int."""
    parts = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"
        f" * {16 ** (hi - i)}"
        for i in range(lo, hi + 1)
    ]
    return "(" + " + ".join(parts) + ")"


_HLL_ORACLE = f"""
WITH h AS (
  SELECT {_duck_md5_nibbles("CAST(o_custkey AS VARCHAR)", 1, 2)} % {_HLL_M} AS bucket,
         {_duck_md5_nibbles("CAST(o_custkey AS VARCHAR)", 3, 16)} AS w
  FROM orders
),
reg AS (
  SELECT bucket,
         max(CASE WHEN w = 0 THEN 57 ELSE 57 - length(bin(w)) END) AS m
  FROM h GROUP BY bucket
),
spine AS (
  SELECT s.b AS bucket, coalesce(reg.m, 0) AS m
  FROM (SELECT unnest(range(0, {_HLL_M})) AS b) s
  LEFT JOIN reg ON reg.bucket = s.b
),
agg AS (
  SELECT CAST(sum(CAST(CAST(1 AS BIGINT) << ({_HLL_SCALE_POW} - m) AS HUGEINT))
              AS HUGEINT) AS sum_terms,
         CAST(sum(m) AS BIGINT) AS sum_registers,
         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_buckets
  FROM spine
),
truth AS (
  SELECT count(*) AS n_rows, count(DISTINCT o_custkey) AS true_distinct FROM orders
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST(true_distinct AS BIGINT) AS true_distinct,
       sum_registers, empty_buckets,
       {_HLL_EST_EXPR} AS hll_estimate
FROM truth, agg
"""


@query("agg_hll_exact_registers", "2.4 aggregations", _HLL_ORACLE)
def agg_hll_exact_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with EXACT, engine-portable registers — the sketch the
    rows-only agg_approx_distinct family can't hash-verify, rebuilt from
    first principles so it CAN: bucket = first 8 md5 bits mod 64, rho =
    leading-zero count of the next 56 bits + 1 (bit length via the binary
    string — the degree-histogram idiom, no float log anywhere), register
    = max(rho) per bucket, harmonic sum as exact integers 2^(57−M), and
    the estimate alpha·m²·2^57/Σ as ONE shared IEEE string. The whole
    sketch is deterministic: the same bytes on any engine, any cluster,
    any partitioning — which is what makes sketches MERGEABLE state for
    incremental sync (registers are max-combinable; a 1000-executor
    cluster merges 64-long arrays, never raw keys). Raw-estimate form
    (no small-range correction) — the point is the portable machinery;
    empty_buckets is reported so a consumer can apply linear counting."""
    o = load(spark, sf_dir, "orders")
    h = F.md5(F.col("o_custkey").cast("string"))
    w = F.conv(F.substring(h, 3, 14), 16, 10).cast("long")
    rho = F.when(w == 0, 57).otherwise(57 - F.length(F.bin(w)))
    reg = (
        o.select(
            (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % _HLL_M).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )
    spine = (
        spark.range(_HLL_M)
        .select(F.col("id").cast("long").alias("bucket"))
        .join(reg, "bucket", "left")
        .select("bucket", F.coalesce(F.col("m"), F.lit(0)).alias("m"))
    )
    agg = spine.agg(
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {_HLL_SCALE_POW} - m)").cast("decimal(38,0)")
        ).alias("sum_terms"),
        F.sum("m").alias("sum_registers"),
        F.sum((F.col("m") == 0).cast("long")).alias("empty_buckets"),
    )
    truth = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("true_distinct"),
    )
    return truth.crossJoin(F.broadcast(agg)).select(
        "n_rows",
        "true_distinct",
        F.col("sum_registers").cast("long").alias("sum_registers"),
        "empty_buckets",
        F.expr(_HLL_EST_EXPR).alias("hll_estimate"),
    )


# ------------------------ 2.9 llm-data: shard packing in real token units

_PACK_BPE_BUDGET = 1024

# shares the merges table / unrolled apply with text_token_count_bpe
_PACK_BPE_ORACLE_TEMPLATE = """
WITH dw AS (
  SELECT doc_id, lang, word, count(*) AS cnt
  FROM (SELECT doc_id, lang,
               unnest(string_split_regex(lower(text), '\\s+')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY doc_id, lang, word
),
bpe0 AS (SELECT DISTINCT word, string_split(word, '') AS t FROM dw){steps},
ntok AS (SELECT word, len(t) AS n_tokens FROM bpe_final),
per_doc AS (
  SELECT dw.doc_id, dw.lang,
         CAST(sum(dw.cnt * ntok.n_tokens) AS BIGINT) AS n_tok
  FROM dw JOIN ntok ON dw.word = ntok.word
  GROUP BY dw.doc_id, dw.lang
),
packed AS (
  SELECT lang, n_tok,
         (sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) - n_tok)
           // {budget} AS shard
  FROM per_doc
),
shards AS (
  SELECT lang, shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS shard_tokens
  FROM packed GROUP BY lang, shard
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_shards,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(max(shard_tokens) AS BIGINT) AS max_shard_tokens,
       CAST(sum(shard_tokens) AS BIGINT) AS total_tokens
FROM shards GROUP BY lang ORDER BY lang
"""


def _pack_bpe_oracle() -> str:
    from hdc_dataengineering_sqlsync_spark.plans.roundsix import _bpe_oracle_steps

    return _PACK_BPE_ORACLE_TEMPLATE.format(steps=_bpe_oracle_steps(), budget=_PACK_BPE_BUDGET)


@query("pack_token_budget_bpe", "2.9 llm-data", _pack_bpe_oracle())
def pack_token_budget_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard packing in REAL LLM token units: the pack_token_budget
    algorithm (exclusive running sum → ~1024-token contiguous shards per
    lang) driven by the merges-table BPE counts instead of whitespace
    counts — the unit a training pipeline actually budgets. The corpus
    reduces to (doc, word) counts; the BPE machinery runs only on the
    DISTINCT vocabulary (Heaps' law — text_token_count_bpe's scale
    argument) and joins back by broadcast; shard assignment and every
    reported statistic are exact integers, so placement can't drift
    between engines. All-integer output — no float anywhere."""
    from hdc_dataengineering_sqlsync_spark.plans.roundsix import bpe_tokens_spark

    docs = load(spark, sf_dir, "documents")
    dw = (
        docs.select("doc_id", "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("doc_id", "lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ntok = bpe_tokens_spark(dw.select("word").distinct()).select(
        "word", F.size("bpe_tokens").alias("n_tokens")
    )
    per_doc = (
        dw.join(F.broadcast(ntok), "word")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("n_tokens")).alias("n_tok"))
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = per_doc.select(
        "lang",
        "n_tok",
        F.expr(f"(sum(n_tok) over (partition by lang order by doc_id) - n_tok) div {_PACK_BPE_BUDGET}").alias(
            "shard"
        ),
    )
    shards = packed.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("shard_tokens")
    )
    return (
        shards.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_docs").alias("n_docs"),
            F.max("shard_tokens").alias("max_shard_tokens"),
            F.sum("shard_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )


# --------------------------- 2.10 time series: Bollinger bands (exact)

# band formulas: ONE shared string each over exact integer window moments
# (population sigma over the w-day frame); n*s2 - sc*sc is exact in
# decimal/HUGEINT, cast to double once, and /n stays in double
# nss = n*Σx² and sc2 = (Σx)² are pre-widened PER ENGINE (decimal(38,0) /
# HUGEINT — sc² overflows int64 at sf0.1 daily volumes); the shared strings
# then touch only exact wide ints and doubles
_BB_MEAN_EXPR = "CAST(sc AS DOUBLE) / n / 100"
_BB_WIDTH_EXPR = "2 * sqrt(CAST(nss - sc2 AS DOUBLE)) / n / 100"

_BB_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
),
m AS (
  SELECT day, n, sc,
         n * s2 AS nss,
         CAST(sc AS HUGEINT) * sc AS sc2
  FROM (
    SELECT day,
           count(*) OVER w AS n,
           sum(cents) OVER w AS sc,
           sum(CAST(cents AS HUGEINT) * cents) OVER w AS s2
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
  )
)
SELECT day, CAST(n AS BIGINT) AS n,
       {_BB_MEAN_EXPR} AS mid,
       {_BB_MEAN_EXPR} + {_BB_WIDTH_EXPR} AS upper,
       {_BB_MEAN_EXPR} - {_BB_WIDTH_EXPR} AS lower
FROM m ORDER BY day
"""


@query("ts_bollinger_bands", "2.10 streaming/time series", _BB_ORACLE)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (7-day rolling mean ± 2 population sigma) over the
    1995 daily revenue series — the volatility envelope behind anomaly
    dashboards. The window carries exact integer moments (Σcents int64,
    Σcents² in decimal(38,0)/HUGEINT — engine frame-evaluation order
    cannot matter for integer sums), and mid/width are each ONE shared
    IEEE expression string over those exact ints, output unrounded
    (identical bits by construction; re-rounding identical doubles is
    the repr-tie trap). Scale: the fact table reduces to the daily grain
    map-side first; the window runs over |days|, and at 100 TB the
    series partitions by (series_id) with the same frame semantics."""
    o = load(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(F.sum(cents).alias("cents"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    m = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("sc"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).over(w).alias("s2"),
    ).select(
        "day",
        "n",
        "sc",
        (F.col("n").cast("decimal(38,0)") * F.col("s2")).alias("nss"),
        (F.col("sc").cast("decimal(38,0)") * F.col("sc")).alias("sc2"),
    )
    return m.select(
        "day",
        "n",
        F.expr(_BB_MEAN_EXPR).alias("mid"),
        F.expr(f"{_BB_MEAN_EXPR} + {_BB_WIDTH_EXPR}").alias("upper"),
        F.expr(f"{_BB_MEAN_EXPR} - {_BB_WIDTH_EXPR}").alias("lower"),
    ).orderBy("day")


# ----------------------- 2.10 time series: Mann-Kendall trend test (exact)

# continuity-corrected z over exact ints s (the MK S statistic) and vars18
# (18·Var(S), integer by construction) — one shared string
_MK_Z_EXPR = (
    "CASE WHEN s > 0 THEN (s - 1) / sqrt(vars18 / CAST(18 AS DOUBLE)) "
    "WHEN s < 0 THEN (s + 1) / sqrt(vars18 / CAST(18 AS DOUBLE)) "
    "ELSE CAST(0 AS DOUBLE) END"
)

_MK_ORACLE = f"""
WITH pt AS (
  SELECT l_returnflag AS flag,
         (CAST(year(l_shipdate) AS BIGINT) - 1995) * 12 + month(l_shipdate) AS x,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS y
  FROM lineitem GROUP BY 1, 2
),
s AS (
  SELECT a.flag,
         CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)
              AS BIGINT) AS s,
         count(*) AS n_pairs
  FROM pt a JOIN pt b ON a.flag = b.flag AND b.x > a.x
  GROUP BY a.flag
),
n AS (SELECT flag, count(*) AS n FROM pt GROUP BY flag),
ties AS (
  SELECT flag, CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tsum
  FROM (SELECT flag, y, count(*) AS t FROM pt GROUP BY flag, y)
  GROUP BY flag
)
SELECT s.flag, CAST(n.n AS BIGINT) AS n_months, s.s,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tsum AS BIGINT) AS vars18,
       {_MK_Z_EXPR} AS z
FROM s JOIN n ON s.flag = n.flag JOIN ties ON s.flag = ties.flag
ORDER BY s.flag
"""


@query("ts_mann_kendall_trend", "2.10 streaming/time series", _MK_ORACLE)
def ts_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on monthly revenue per returnflag
    — the hypothesis-test companion of ts_theil_sen_slope (the canonical
    pairing in environmental/SRE trend detection): S = Σ sign(yⱼ−yᵢ) over
    ordered month pairs is a pure INTEGER statistic, the tie-corrected
    variance is kept as the integer 18·Var(S) = n(n−1)(2n+5) − Σt(t−1)(2t+5),
    and the continuity-corrected z is ONE shared expression string — the
    only IEEE math in the query. Scale: same reduce-then-quadratic shape
    as Theil-Sen — the fact table collapses to the (flag, month) grain
    before the bounded ~3.5k-pair sign census; ties come from one keyed
    count over the same grain."""
    li = load(spark, sf_dir, "lineitem")
    x = ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate")).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    pt = li.groupBy(F.col("l_returnflag").alias("flag"), x.alias("x")).agg(
        F.sum(cents).alias("y")
    )
    a = pt.select("flag", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = pt.select(F.col("flag").alias("flag_b"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    sgn = F.when(F.col("yb") > F.col("ya"), 1).when(F.col("yb") < F.col("ya"), -1).otherwise(0)
    s = (
        a.join(b, (F.col("flag") == F.col("flag_b")) & (F.col("xb") > F.col("xa")))
        .groupBy("flag")
        .agg(F.sum(sgn).alias("s"), F.count(F.lit(1)).alias("n_pairs"))
    )
    n = pt.groupBy("flag").agg(F.count(F.lit(1)).alias("n"))
    t = pt.groupBy("flag", "y").agg(F.count(F.lit(1)).alias("t"))
    ties = t.groupBy("flag").agg(
        F.coalesce(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
        ).alias("tsum")
    )
    return (
        s.join(n, "flag")
        .join(ties, "flag")
        .select(
            "flag",
            F.col("n").cast("long").alias("n_months"),
            F.col("s").cast("long").alias("s"),
            (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tsum"))
            .cast("long")
            .alias("vars18"),
            F.expr(_MK_Z_EXPR).alias("z"),
        )
        .orderBy("flag")
    )


# -------------------- 2.2 projection/filter: SQL parameter markers (Spark 4)

_PARAM_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
  AND o_totalprice > 150000
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("sql_parameter_markers", "2.2 projection/filter", _PARAM_ORACLE)
def sql_parameter_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL parameter markers — the injection-safe query surface a
    sync service exposes to callers: the SAME statement text runs with
    NAMED (:year, :floor) markers bound via spark.sql(..., args={...}),
    with values typed server-side (no string splicing, plan cache reuse
    across bindings). Both marker styles are exercised: the named form
    computes the result; a positional (?) probe validates binding order
    on a 1-row check. Parameters are literals by the time the plan is
    optimized, so pushdown/pruning work exactly as with inline constants
    — asserted by the oracle equivalence itself (the oracle inlines the
    values)."""
    from hdc_dataengineering_sqlsync_spark.registry import register_views

    register_views(spark, sf_dir, ("orders",))
    # positional probe: binding order must map 1:1 to marker order
    probe = spark.sql(
        "SELECT ? AS a, ? AS b", args=[1, 2]
    ).collect()[0]
    assert (probe["a"], probe["b"]) == (1, 2)
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate >= make_timestamp(:year, 1, 1, 0, 0, 0)
          AND o_orderdate <  make_timestamp(:year + 1, 1, 1, 0, 0, 0)
          AND o_totalprice > :floor
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"year": 1995, "floor": 150000},
    )
