"""SURVEY.md §2 round-9 batch AE: zip null-padding contract, feature
leakage audit, concat-and-chunk packing.

  fn_array_zip_padding     zip_with/arrays_zip pad-to-longest, pinned
  dq_feature_leakage_audit point-in-time discipline vs naive latest-join
  mix_concat_chunk_packing pretraining chunk boundaries, exact offsets

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.7 scalar functions: zip pads to the LONGER side with nulls

_ZIP_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         CASE o_orderkey % 3 WHEN 0 THEN [o_orderkey % 7]
              WHEN 1 THEN [o_orderkey % 7, o_orderkey % 5]
              ELSE [o_orderkey % 7, o_orderkey % 5, o_orderkey % 3] END AS a,
         CASE o_orderkey % 2 WHEN 0 THEN [o_orderkey % 11, o_orderkey % 2]
              ELSE [o_orderkey % 11, o_orderkey % 2, o_orderkey % 13] END
           AS b
  FROM orders WHERE o_orderkey <= 400
),
z AS (
  SELECT k, len(list_zip(a, b)) AS zlen,
         len(list_filter(list_zip(a, b), x -> x[1] IS NULL)) AS a_pads,
         len(list_filter(list_zip(a, b), x -> x[2] IS NULL)) AS b_pads,
         list_sum(list_transform(list_zip(a, b),
                  x -> coalesce(x[1], 0) * 100 + coalesce(x[2], 0)))
           AS wsum
  FROM src
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(zlen) AS BIGINT) AS zipped_len_sum,
       CAST(SUM(a_pads) AS BIGINT) AS a_pad_slots,
       CAST(SUM(b_pads) AS BIGINT) AS b_pad_slots,
       CAST(SUM(wsum) AS BIGINT) AS weighted_sum
FROM z
"""


@query("fn_array_zip_padding", "2.7 scalar functions", _ZIP_ORACLE)
def fn_array_zip_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zip padding contract, pinned: Spark's zip_with/arrays_zip and
    DuckDB's list_zip all pad the SHORTER array with nulls to the longer
    length (not truncate-to-shorter, which Python's zip() does — the
    silent-data-loss direction every port must check). The census counts
    padded slots on each side and a coalesce-weighted sum that proves
    null slots flow through arithmetic as the chosen default, not as
    dropped rows.

    Scale shape: generation + zip are map-side scalar work; one census
    row."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 400)
        .select(
            F.col("o_orderkey").alias("k"),
            F.expr(
                "CASE o_orderkey % 3 WHEN 0 THEN array(o_orderkey % 7)"
                " WHEN 1 THEN array(o_orderkey % 7, o_orderkey % 5)"
                " ELSE array(o_orderkey % 7, o_orderkey % 5, o_orderkey % 3)"
                " END"
            ).alias("a"),
            F.expr(
                "CASE o_orderkey % 2"
                " WHEN 0 THEN array(o_orderkey % 11, o_orderkey % 2)"
                " ELSE array(o_orderkey % 11, o_orderkey % 2,"
                "            o_orderkey % 13) END"
            ).alias("b"),
        )
    )
    z = src.select(
        F.size(F.arrays_zip("a", "b")).alias("zlen"),
        F.size(
            F.filter(F.arrays_zip("a", "b"), lambda x: x["a"].isNull())
        ).alias("a_pads"),
        F.size(
            F.filter(F.arrays_zip("a", "b"), lambda x: x["b"].isNull())
        ).alias("b_pads"),
        F.expr(
            "aggregate(zip_with(a, b,"
            " (x, y) -> coalesce(x, 0L) * 100 + coalesce(y, 0L)),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("wsum"),
    )
    return z.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("zlen").cast("long").alias("zipped_len_sum"),
        F.sum("a_pads").cast("long").alias("a_pad_slots"),
        F.sum("b_pads").cast("long").alias("b_pad_slots"),
        F.sum("wsum").alias("weighted_sum"),
    )


# ---- 2.6 data quality: point-in-time feature leakage audit

_LEAK_ORACLE = """
WITH hist AS (
  SELECT o.o_custkey AS ck, c.c_mktsegment AS segment,
         o.o_orderdate AS d, o.o_orderkey AS k
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
keyed AS (
  -- lexicographic (date, orderkey) packed into ONE integer so the
  -- partition max is a plain MAX in both engines (DuckDB max_by takes
  -- no struct key); keys < 1e10 by testdata construction
  SELECT segment, ck, d, k,
         CAST(date_diff('day', DATE '1990-01-01', d) AS BIGINT)
           * 10000000000 + k AS ok
  FROM hist
),
aug AS (
  SELECT segment, d, k, ok,
         max(ok) OVER (PARTITION BY ck) AS last_ok,
         count(*) OVER (PARTITION BY ck ORDER BY ok
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS n_prior
  FROM keyed
),
obs AS (
  SELECT segment,
         CASE WHEN last_ok <> ok THEN 1 ELSE 0 END AS leaky,
         CASE WHEN n_prior = 0 THEN 1 ELSE 0 END AS cold_start
  FROM aug WHERE year(d) = 1996
)
SELECT segment,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(SUM(leaky) AS BIGINT) AS n_leaky,
       CAST(SUM(cold_start) AS BIGINT) AS n_cold_start,
       CAST(SUM(leaky) * 10000 // count(*) AS BIGINT) AS leak_bps
FROM obs GROUP BY segment ORDER BY segment
"""


@query("dq_feature_leakage_audit", "2.6 data quality", _LEAK_ORACLE)
def dq_feature_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-leakage audit — the ML feature-store check that catches
    the most expensive training bug there is: for each 1996 observation
    (an order, observed at its order date), would the NAIVE
    latest-value join (grab the customer's most recent record, no time
    bound) pull data from the observation's FUTURE? Leaky iff the
    customer's final order (lexicographic (date, key) packed into one
    integer, so the test is a plain MAX — no float) is not the
    observation itself; cold-start counts
    observations with no prior history (where an as-of join returns
    null and the naive join silently fabricates a feature). Rates in
    exact bps per segment — the audit you run BEFORE join_pit_multi_asof
    replaces the naive join.

    Scale shape: two window passes partitioned by customer
    (partition-parallel); the census folds map-side to 5 rows."""
    hist = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("k"),
        )
    )
    keyed = hist.select(
        "segment",
        "ck",
        "d",
        (
            F.datediff("d", F.lit("1990-01-01").cast("date")).cast("long")
            * 10000000000
            + F.col("k")
        ).alias("ok"),
    )
    wp = Window.partitionBy("ck")
    w_prior = wp.orderBy("ok").rowsBetween(Window.unboundedPreceding, -1)
    aug = keyed.select(
        "segment",
        "d",
        "ok",
        F.max("ok").over(wp).alias("last_ok"),
        F.count(F.lit(1)).over(w_prior).alias("n_prior"),
    )
    obs = aug.where(F.year("d") == 1996).select(
        "segment",
        F.when(F.col("last_ok") != F.col("ok"), 1).otherwise(0).alias(
            "leaky"
        ),
        F.when(F.col("n_prior") == 0, 1).otherwise(0).alias("cold_start"),
    )
    return (
        obs.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("leaky").alias("n_leaky"),
            F.sum("cold_start").alias("n_cold_start"),
            F.expr("SUM(leaky) * 10000 DIV count(*)").alias("leak_bps"),
        )
        .orderBy("segment")
    )


# ---- 2.9 llm-data: concat-and-chunk packing (context-window boundaries)

_CHUNK = 2048

_PACK_ORACLE = f"""
WITH doc_tok AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
              AS BIGINT) AS ntok
  FROM documents
),
offs AS (
  SELECT doc_id, ntok,
         CAST(SUM(ntok) OVER (ORDER BY doc_id) AS BIGINT) AS off_end
  FROM doc_tok WHERE ntok > 0
),
marked AS (
  SELECT ntok, off_end,
         (off_end - ntok) // {_CHUNK} AS c0,
         (off_end - 1) // {_CHUNK} AS c1
  FROM offs
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(off_end) AS BIGINT) AS total_tokens,
       CAST((max(off_end) + {_CHUNK - 1}) // {_CHUNK} AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN c1 > c0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddlers,
       CAST(SUM(CASE WHEN c1 > c0 THEN 1 ELSE 0 END) * 10000 // count(*)
            AS BIGINT) AS straddle_bps,
       CAST((max(off_end) - 1) % {_CHUNK} + 1 AS BIGINT) AS tail_fill_tokens
FROM marked
"""


@query("mix_concat_chunk_packing", "2.9 llm-data", _PACK_ORACLE)
def mix_concat_chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing — the pretraining batch-prep op: all
    documents concatenate in a deterministic order and the token stream
    cuts into fixed context windows; a document STRADDLES a boundary
    when its first and last token land in different chunks (straddlers
    are the docs whose beginning a model sees without their end — the
    packing-quality number attention-masking debates cite), and the
    tail fill measures waste in the final chunk. All offsets are exact
    integer prefix sums; boundary math is integral division.

    Scale shape: token counts reduce map-side to doc grain; the global
    prefix sum runs over doc-grain rows (two-phase per-partition
    offsets at 100 TB — the standard distributed scan); census folds to
    one row."""
    doc_tok = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda w: w != ""))
            .cast("long")
            .alias("ntok"),
        )
        .where(F.col("ntok") > 0)
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    offs = doc_tok.select(
        "ntok", F.sum("ntok").over(w).alias("off_end")
    )
    marked = offs.select(
        "off_end",
        F.expr(f"(off_end - ntok) DIV {_CHUNK}").alias("c0"),
        F.expr(f"(off_end - 1) DIV {_CHUNK}").alias("c1"),
    )
    return marked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("off_end").alias("total_tokens"),
        F.expr(f"(max(off_end) + {_CHUNK - 1}) DIV {_CHUNK}").alias(
            "n_chunks"
        ),
        F.sum(F.when(F.col("c1") > F.col("c0"), 1).otherwise(0)).alias(
            "n_straddlers"
        ),
        F.expr(
            f"SUM(CASE WHEN c1 > c0 THEN 1 ELSE 0 END) * 10000 DIV count(*)"
        ).alias("straddle_bps"),
        F.expr(f"(max(off_end) - 1) % {_CHUNK} + 1").alias(
            "tail_fill_tokens"
        ),
    )
