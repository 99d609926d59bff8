"""SURVEY.md §2 round-9 batch H: audio zero-crossing rate on the real WAV
path, adjacency→nested-set hierarchy conversion, additive seasonal
decomposition with MA detrending.

  multimodal_audio_zcr    sign-change census per decoded clip (voicing proxy)
  hier_nested_set         lft/rgt interval labels from path order, no DFS walk
  ts_decompose_additive   centered-MA detrend → seasonal means → residuals

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.registry import load

# ---------- 2.9 llm-data: zero-crossing rate over the decoded WAV clip

_ZCR_SUBSET = "doc_id % 5 = 4"

_ZCR_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_crossings", T.LongType()),
        T.StructField("peak_amp", T.LongType()),
        T.StructField("zcr_bps", T.LongType()),
    ]
)

_ZCR_ORACLE = f"""
WITH m AS (SELECT doc_id, 96 + (doc_id % 5) * 32 AS n
           FROM documents WHERE {_ZCR_SUBSET}),
s AS (
  SELECT m.doc_id, m.n, i.i,
         (m.doc_id * 13 + i.i * 7) % 2001 - 1000 AS v
  FROM m JOIN (SELECT unnest(range(0, 256)) AS i) i ON i.i < m.n
),
lagged AS (
  SELECT doc_id, n, v,
         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM s
)
SELECT doc_id AS media_id, CAST(n AS INT) AS n_samples,
       CAST(SUM(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_crossings,
       CAST(MAX(abs(v)) AS BIGINT) AS peak_amp,
       CAST(SUM(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END) * 10000
            // (n - 1) AS BIGINT) AS zcr_bps
FROM lagged GROUP BY doc_id, n ORDER BY media_id
"""


@query("multimodal_audio_zcr", "2.9 llm-data", _ZCR_ORACLE)
def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate — the classic voiced/unvoiced/noisiness proxy
    an audio-corpus pipeline computes per clip before any model sees it:
    closed-form int16 samples → real RIFF bytes (encode_wav) →
    decode_wav → count of strict sign changes (s_i·s_{i−1} < 0, so a
    zero sample never counts — the same integer test both engines run),
    peak amplitude, and ZCR in basis points of the n−1 sample pairs. An
    off-by-one in the PCM frame walk or a byte-order bug shifts the
    sample sequence and breaks the crossing census against the oracle's
    closed form.

    Scale shape: encode+decode+census in ONE mapInPandas pass over
    repartitioned ids; payloads never shuffle — 4 scalar stats per clip
    leave the stage (the multimodal_audio_stereo_balance discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            decode_wav,
            encode_wav,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                n = 96 + (m % 5) * 32
                i = np.arange(n, dtype=np.int64)
                samples = ((m * 13 + i * 7) % 2001 - 1000).astype(np.int16)
                blob = encode_wav(samples)
                _, dec = decode_wav(blob)
                d = dec.astype(np.int64)
                zcr = int(((d[1:] * d[:-1]) < 0).sum())
                peak = int(np.abs(d).max())
                rows.append((m, n, zcr, peak, zcr * 10000 // (n - 1)))
            yield pd.DataFrame(rows, columns=[f.name for f in _ZCR_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_ZCR_SUBSET)
    ids = docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    return sort_reduction(ids.mapInPandas(run, schema=_ZCR_SCHEMA), "media_id")


# ------- 2.3 joins/hierarchy: adjacency → nested-set (lft/rgt) labels

# Nested-set labels WITHOUT a sequential DFS walk: with preorder rank
# pre(v) (1-based, any consistent sibling order — here path-string order),
# depth(v) (root = 0) and subtree size(v),
#   lft(v) = 2·pre(v) − 1 − depth(v)        rgt(v) = lft(v) + 2·size(v) − 1
# (each earlier preorder node contributes its entry tick, and its exit
# tick iff it closed before v opened — all pre(v)−1 of them except v's
# depth(v) still-open ancestors). Derivation pinned by a unit test that
# replays an actual DFS counter on a small tree.

_NESTED_SET_ORACLE = """
WITH RECURSIVE walk(k, path) AS (
  SELECT c_custkey, CAST(c_custkey AS VARCHAR) FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, concat(w.path, '/', CAST(c.c_custkey AS VARCHAR))
  FROM customer c JOIN walk w ON c.c_custkey // 10 = w.k
  WHERE c.c_custkey >= 10
),
nodes AS (
  SELECT k, path,
         CAST(length(path) - length(replace(path, '/', '')) AS BIGINT) AS depth,
         CAST(row_number() OVER (ORDER BY path) AS BIGINT) AS pre
  FROM walk
),
prefixes AS (
  -- len-driven range (not a fixed cap): keys of ANY digit count enumerate
  -- every ancestor prefix, exactly like the Spark side's transform-over-
  -- full-split (review-r9: a fixed cap silently undercounted depth>8)
  SELECT list_aggr(parts[1:i], 'string_agg', '/') AS anc
  FROM (
    SELECT string_split(path, '/') AS parts,
           unnest(range(1, len(string_split(path, '/')) + 1)) AS i
    FROM nodes
  )
),
sizes AS (
  SELECT anc AS path, CAST(count(*) AS BIGINT) AS sz FROM prefixes GROUP BY anc
)
SELECT n.k, n.depth,
       CAST(2 * n.pre - 1 - n.depth AS BIGINT) AS lft,
       CAST(2 * n.pre - 2 - n.depth + 2 * s.sz AS BIGINT) AS rgt,
       s.sz AS subtree_size
FROM nodes n JOIN sizes s ON s.path = n.path
WHERE n.k < 100
ORDER BY n.k
"""


@query("hier_nested_set", "2.3 joins", _NESTED_SET_ORACLE)
def hier_nested_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency → NESTED-SET conversion (Celko lft/rgt interval labels)
    of the synthetic key hierarchy (parent(k) = k DIV 10, as
    hier_recursive_cte) — the materialization that turns every subtree
    query into `lft BETWEEN p.lft AND p.rgt` range pruning. The labels
    come from a CLOSED FORM over (preorder rank, depth, subtree size) —
    lft = 2·pre−1−depth, rgt = lft+2·size−1 — so no sequential DFS
    counter ever runs: subtree sizes fall out of ONE ancestor-prefix
    explode (factor = depth ≤ 8) + keyed count, not a quadratic
    prefix-LIKE self-join.

    Scale shape: recursion depth is log10 of the key space; the explode
    and count shuffle on the prefix key; the preorder row_number is the
    one global-order step — hierarchy tables are dimension-sized, and at
    multi-forest scale it partitions by root. Output clipped to k < 100
    (driver-stable 90 rows); the full labeling is what the invariant
    unit test checks."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    nodes = spark.sql(
        """
        WITH RECURSIVE walk(k, path) AS (
          SELECT c_custkey, cast(c_custkey AS STRING) FROM customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, concat(w.path, '/', cast(c.c_custkey AS STRING))
          FROM customer c JOIN walk w ON c.c_custkey DIV 10 = w.k
          WHERE c.c_custkey >= 10
        )
        SELECT k, path,
               CAST(length(path) - length(replace(path, '/', '')) AS BIGINT)
                 AS depth
        FROM walk
        """
    )
    pre = nodes.withColumn(
        "pre", F.row_number().over(Window.orderBy("path")).cast("long")
    )
    parts = F.split("path", "/")
    prefixes = nodes.select(
        F.explode(
            F.transform(
                parts, lambda _, i: F.array_join(F.slice(parts, 1, i + 1), "/")
            )
        ).alias("anc")
    )
    sizes = prefixes.groupBy(F.col("anc").alias("path")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        pre.join(sizes, "path")
        .where(F.col("k") < 100)
        .select(
            "k",
            "depth",
            (2 * F.col("pre") - 1 - F.col("depth")).alias("lft"),
            (2 * F.col("pre") - 2 - F.col("depth") + 2 * F.col("sz")).alias("rgt"),
            F.col("sz").alias("subtree_size"),
        )
        .orderBy("k")
    )


# ------ 2.10 time series: additive decomposition (MA detrend + seasonal)

_DECOMP_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', l_shipdate) AS mon,
         CAST(month(l_shipdate) AS INT) AS cm,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS x
  FROM lineitem WHERE year(l_shipdate) BETWEEN 1993 AND 1996
  GROUP BY 1, 2
),
seq AS (
  SELECT mon, cm, CAST(x AS BIGINT) AS x,
         row_number() OVER (ORDER BY mon) AS rn,
         count(*) OVER () AS nmon
  FROM monthly
),
trend AS (
  SELECT mon, cm, x, rn,
         CASE WHEN rn >= 6 AND rn <= nmon - 6 THEN
           CAST(SUM(x) OVER (ORDER BY rn ROWS BETWEEN 5 PRECEDING
                             AND 6 FOLLOWING) // 12 AS BIGINT)
         END AS tr
  FROM seq
),
det AS (
  SELECT cm, x - tr AS d FROM trend WHERE tr IS NOT NULL
),
seasonal AS (
  SELECT cm, CAST(count(*) AS BIGINT) AS n_obs,
         CAST(SUM(d) // count(*) AS BIGINT) AS s
  FROM det GROUP BY cm
)
SELECT d.cm AS month, s.n_obs, s.s AS seasonal_cents,
       CAST(SUM(abs(d.d - s.s)) AS BIGINT) AS sum_abs_resid_cents
FROM det d JOIN seasonal s ON s.cm = d.cm
GROUP BY d.cm, s.n_obs, s.s
ORDER BY month
"""


@query("ts_decompose_additive", "2.10 streaming/time series", _DECOMP_ORACLE)
def ts_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition x = trend + seasonal + residual —
    the method behind every 'seasonally adjusted' series: a 12-month
    moving-average detrend (rows −5..+6, integral DIV 12, defined only
    where the full window exists), per-calendar-month means of the
    detrended values as the seasonal component (DIV trunc — detrended
    values go NEGATIVE), and the absolute residual mass left over. All
    exact int64 cents; distinct from `ts_seasonal_index_monthly`, whose
    ratio-to-overall-mean index never removes trend.

    Scale shape: fact rows reduce map-side to 48 month cells; every
    window runs on the cell series (ORDER BY month over one tiny
    partition here; partitionBy(series) at 100 TB), and the seasonal
    rollup + residual join stay on ≤48/12 rows."""
    li = load(spark, sf_dir, "lineitem")
    monthly = (
        li.where(F.year("l_shipdate").between(1993, 1996))
        .groupBy(
            F.date_trunc("month", "l_shipdate").alias("mon"),
            F.month("l_shipdate").alias("cm"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias(
                "x"
            )
        )
    )
    worder = Window.orderBy("mon")
    seq = monthly.select(
        "mon",
        "cm",
        "x",
        F.row_number().over(worder).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("nmon"),
    )
    trend = seq.withColumn(
        "tr",
        F.when(
            (F.col("rn") >= 6) & (F.col("rn") <= F.col("nmon") - 6),
            F.expr("sum(x) OVER (ORDER BY rn ROWS BETWEEN 5 PRECEDING"
                   " AND 6 FOLLOWING) DIV 12"),
        ),
    )
    det = trend.where(F.col("tr").isNotNull()).select(
        "cm", (F.col("x") - F.col("tr")).alias("d")
    )
    seasonal = det.groupBy("cm").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.expr("sum(d) DIV count(*)").alias("s"),
    )
    return (
        det.join(F.broadcast(seasonal), "cm")
        .groupBy(F.col("cm").alias("month"), "n_obs", "s")
        .agg(F.sum(F.abs(F.col("d") - F.col("s"))).alias("sum_abs_resid_cents"))
        .select(
            "month",
            "n_obs",
            F.col("s").alias("seasonal_cents"),
            "sum_abs_resid_cents",
        )
        .orderBy("month")
    )
