"""SURVEY.md §2 round-9 batch AK: EMA crossover signals, dictionary
matching, mode-concentration monitor.

  ts_ema_crossover       dual integer EMA recursion + crossing census
  text_dictionary_match  multi-keyword dictionary scan per source
  dq_mode_concentration  'column went constant' production alarm

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.10 time series: fast/slow EMA crossover census

# fast EMA weight 2/10, slow 1/10 — both recursions in exact integer
# cents with truncating division (the ts_holt_linear discipline)
_EMAX_ORACLE = """
WITH RECURSIVE m AS (
  SELECT l_returnflag AS flag, date_trunc('month', l_shipdate) AS mon,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM lineitem WHERE year(l_shipdate) BETWEEN 1994 AND 1997
  GROUP BY 1, 2
),
seq AS (
  SELECT flag, x,
         CAST(row_number() OVER (PARTITION BY flag ORDER BY mon) AS BIGINT)
           AS rn
  FROM m
),
r AS (
  SELECT flag, rn, x AS fast, x AS slow,
         CAST(0 AS BIGINT) AS crossings
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.flag, s.rn,
         CAST((2 * s.x + 8 * r.fast) // 10 AS BIGINT),
         CAST((1 * s.x + 9 * r.slow) // 10 AS BIGINT),
         r.crossings + CASE WHEN
           sign(CAST((2 * s.x + 8 * r.fast) // 10 AS BIGINT)
                - CAST((1 * s.x + 9 * r.slow) // 10 AS BIGINT))
           * sign(r.fast - r.slow) < 0 THEN 1 ELSE 0 END
  FROM r JOIN seq s ON s.flag = r.flag AND s.rn = r.rn + 1
),
last AS (SELECT flag, max(rn) AS n FROM r GROUP BY flag)
SELECT r.flag, CAST(l.n AS BIGINT) AS n_months,
       CAST(r.fast AS BIGINT) AS fast_cents,
       CAST(r.slow AS BIGINT) AS slow_cents,
       CAST(r.crossings AS BIGINT) AS n_crossings,
       CASE WHEN r.fast > r.slow THEN 'golden' WHEN r.fast < r.slow
            THEN 'death' ELSE 'flat' END AS last_signal
FROM r JOIN last l ON l.flag = r.flag AND r.rn = l.n
ORDER BY r.flag
"""

_EMAX_SCHEMA = T.StructType(
    [
        T.StructField("flag", T.StringType()),
        T.StructField("n_months", T.LongType()),
        T.StructField("fast_cents", T.LongType()),
        T.StructField("slow_cents", T.LongType()),
        T.StructField("n_crossings", T.LongType()),
        T.StructField("last_signal", T.StringType()),
    ]
)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def _emax_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("mon")
    xs = [int(v) for v in pdf["x"]]
    fast = slow = xs[0]
    crossings = 0
    for x in xs[1:]:
        nf = _tdiv(2 * x + 8 * fast, 10)
        ns = _tdiv(1 * x + 9 * slow, 10)
        before = (fast > slow) - (fast < slow)
        after = (nf > ns) - (nf < ns)
        if before * after < 0:
            crossings += 1
        fast, slow = nf, ns
    sig = "golden" if fast > slow else ("death" if fast < slow else "flat")
    return pd.DataFrame(
        [
            {
                "flag": pdf["flag"].iloc[0],
                "n_months": len(xs),
                "fast_cents": fast,
                "slow_cents": slow,
                "n_crossings": crossings,
                "last_signal": sig,
            }
        ]
    )


@query("ts_ema_crossover", "2.10 streaming/time series", _EMAX_ORACLE)
def ts_ema_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow EMA crossover — the golden-cross/death-cross signal
    generator, run as TWO simultaneous integer recursions (weights 2/10
    and 1/10 in exact cents, truncating division — the ts_holt_linear
    discipline) with a sign-flip census: a crossing is counted iff the
    fast−slow sign strictly reverses (touch-and-bounce is NOT a cross —
    that boundary is precisely where float EMAs disagree between
    engines and this integer formulation cannot).

    Scale shape: month-grain map-side reduction first; the dual
    recursion runs per-flag via applyInPandas, partition-parallel
    across series, mirrored by a RECURSIVE CTE carrying both EMAs and
    the crossing counter."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").between(1994, 1997)
    )
    m = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.date_trunc("month", "l_shipdate").alias("mon"),
    ).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        ).alias("x")
    )
    return (
        m.groupBy("flag")
        .applyInPandas(_emax_group, schema=_EMAX_SCHEMA)
        .orderBy("flag")
    )


# ------ 2.9 llm-data: dictionary (multi-keyword) match census

_DICT_WORDS = ["spark", "join", "scan", "window", "stream", "hash"]

_DICT_ORACLE = f"""
WITH kw(word) AS (VALUES {", ".join(f"('{w}')" for w in _DICT_WORDS)}),
tok AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
hits AS (
  SELECT t.source, k.word, t.doc_id
  FROM tok t JOIN kw k ON t.w = k.word
)
SELECT source, word,
       CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM hits GROUP BY source, word
ORDER BY source, word
"""


@query("text_dictionary_match", "2.9 llm-data", _DICT_ORACLE)
def text_dictionary_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary matching — the multi-keyword scan under brand-mention
    tracking, PII term flagging, and blocklist filtering: a broadcast
    keyword relation joined against the tokenized corpus (the
    relational form of Aho–Corasick's output — at a 6-word dictionary
    the join IS the automaton), with mention and document-frequency
    counts per (source, keyword).

    Scale shape: tokenize map-side; the keyword join broadcasts the
    dictionary (any real blocklist still broadcasts); the census folds
    on (source, word) and the doc-distinct shares that shuffle."""
    kw = spark.createDataFrame(
        [(w,) for w in _DICT_WORDS], "word string"
    )
    tok = load(spark, sf_dir, "documents").select(
        "source", "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    hits = tok.join(F.broadcast(kw), tok.w == kw.word)
    return (
        hits.groupBy("source", "word")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("source", "word")
    )


# ------ 2.6 data quality: mode concentration ('went constant') monitor

_MODE_ORACLE = """
WITH cols AS (
  SELECT 'o_orderpriority' AS col, o_orderpriority AS v FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL
  SELECT 'order_month', CAST(month(o_orderdate) AS VARCHAR) FROM orders
),
counts AS (
  SELECT col, v, CAST(count(*) AS BIGINT) AS c FROM cols GROUP BY col, v
),
ranked AS (
  SELECT col, v, c,
         max(c) OVER (PARTITION BY col) AS mx,
         CAST(SUM(c) OVER (PARTITION BY col) AS BIGINT) AS n
  FROM counts
)
SELECT col,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(max(n) AS BIGINT) AS n_rows,
       min(CASE WHEN c = mx THEN v END) AS top_value,
       CAST(max(mx) * 10000 // max(n) AS BIGINT) AS top_share_bps,
       CAST(CASE WHEN max(mx) * 10 > 9 * max(n) THEN 1 ELSE 0 END AS INT)
         AS near_constant
FROM ranked GROUP BY col ORDER BY col
"""


@query("dq_mode_concentration", "2.6 data quality", _MODE_ORACLE)
def dq_mode_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode concentration — the 'column went constant' alarm (an
    upstream default silently filling a field is the most common data
    outage): per monitored column, the top value's share in exact bps
    (deterministic min-value tie-break) and a cross-multiplied
    near-constant flag (top·10 > 9·n — no float threshold). The
    long-format column stack is how one census covers N columns in one
    pass.

    Scale shape: the stack is map-side (one scan, three projections
    unioned — at width, a single pass with a posexploded struct); value
    censuses are map-combinable; per-column rollups run on value-grain
    cells."""
    o = load(spark, sf_dir, "orders")
    cols = (
        o.select(
            F.lit("o_orderpriority").alias("col"),
            F.col("o_orderpriority").alias("v"),
        )
        .unionAll(
            o.select(
                F.lit("o_orderstatus").alias("col"),
                F.col("o_orderstatus").alias("v"),
            )
        )
        .unionAll(
            o.select(
                F.lit("order_month").alias("col"),
                F.month("o_orderdate").cast("string").alias("v"),
            )
        )
    )
    counts = cols.groupBy("col", "v").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    wp = Window.partitionBy("col")
    ranked = counts.select(
        "col",
        "v",
        "c",
        F.max("c").over(wp).alias("mx"),
        F.sum("c").over(wp).alias("n"),
    )
    return (
        ranked.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("n").alias("n_rows"),
            F.min(F.when(F.col("c") == F.col("mx"), F.col("v"))).alias(
                "top_value"
            ),
            F.expr("max(mx) * 10000 DIV max(n)").alias("top_share_bps"),
            F.expr(
                "CAST(CASE WHEN max(mx) * 10 > 9 * max(n) THEN 1 ELSE 0 END"
                " AS INT)"
            ).alias("near_constant"),
        )
        .orderBy("col")
    )
