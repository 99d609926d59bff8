"""SURVEY.md §2 round-9 batch X: Hamming-packed binary similarity,
last_value frame-trap contract, nested-struct projection pruning.

  simsearch_hamming_topk   sign-bit packed vectors, exact Hamming top-k
  win_last_value_frame     the default-frame last_value pitfall, pinned
  scan_nested_struct_prune nested parquet written + leaf-only re-read

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ----- 2.9 llm-data: binary (sign-bit) embeddings + exact Hamming top-k

_HAMMING_ORACLE = """
WITH bits AS (
  SELECT vec_id, label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings
),
packed AS (
  SELECT vec_id, label,
         CAST(SUM(CASE WHEN v > 0 AND i < 32
                       THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT)
           AS w1,
         CAST(SUM(CASE WHEN v > 0 AND i >= 32
                       THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END)
              AS BIGINT) AS w2
  FROM bits GROUP BY vec_id, label
),
q AS (SELECT w1, w2 FROM packed ORDER BY vec_id LIMIT 1),
scored AS (
  SELECT p.vec_id, p.label,
         CAST(bit_count(xor(p.w1, q.w1)) + bit_count(xor(p.w2, q.w2))
              AS INT) AS hamming
  FROM packed p CROSS JOIN q
  WHERE p.vec_id <> (SELECT min(vec_id) FROM packed)
)
SELECT vec_id, label, hamming FROM scored
ORDER BY hamming, vec_id LIMIT 10
"""


@query("simsearch_hamming_topk", "2.9 llm-data", _HAMMING_ORACLE)
def simsearch_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized similarity — the 32×-compression retrieval trick
    (sign-bit / binary embeddings): each 64-dim float vector packs into
    two 32-bit words (arithmetic sums of 1<<i, so no sign-bit overflow
    games), and distance becomes popcount(xor) — exact integers, no
    float at all, which is why binary rerank pipelines are perfectly
    reproducible where cosine top-k needs rounding discipline. Top-10
    nearest to the lowest-id query vector with (hamming, vec_id) total
    order.

    Scale shape: packing is one map-side explode + keyed sum (at scale,
    stored once as a packed column — 16 bytes/vector instead of 256);
    scoring is a 1-row broadcast against the packed table, and top-k is
    TakeOrdered, never a global sort."""
    bits = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "v")
    )
    packed = bits.groupBy("vec_id", "label").agg(
        F.sum(
            F.expr(
                "CASE WHEN v > 0 AND i < 32"
                " THEN shiftleft(CAST(1 AS BIGINT), i) ELSE 0 END"
            )
        ).alias("w1"),
        F.sum(
            F.expr(
                "CASE WHEN v > 0 AND i >= 32"
                " THEN shiftleft(CAST(1 AS BIGINT), i - 32) ELSE 0 END"
            )
        ).alias("w2"),
    )
    q = packed.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("qid"),
        F.col("w1").alias("qw1"),
        F.col("w2").alias("qw2"),
    )
    scored = (
        packed.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "vec_id",
            "label",
            (
                F.bit_count(F.expr("w1 ^ qw1"))
                + F.bit_count(F.expr("w2 ^ qw2"))
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    return scored.orderBy("hamming", "vec_id").limit(10)


# ------ 2.5 windows: the last_value default-frame trap, pinned

_LV_FRAME_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS prio, o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey <= 2000
),
w AS (
  SELECT prio, k, cents,
         last_value(cents) OVER (PARTITION BY prio ORDER BY k)
           AS lv_default,
         last_value(cents) OVER (PARTITION BY prio ORDER BY k
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING) AS lv_full,
         max_by(cents, k) OVER (PARTITION BY prio) AS true_last
  FROM src
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN lv_default = cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_default_eq_self,
       CAST(SUM(CASE WHEN lv_full = true_last THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_eq_last,
       CAST(max(lv_full) AS BIGINT) AS lv_full_cents
FROM w GROUP BY prio ORDER BY prio
"""


@query("win_last_value_frame", "2.5 window functions", _LV_FRAME_ORACLE)
def win_last_value_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE window pitfall: with an ORDER BY and no explicit frame, the
    SQL-standard default frame is RANGE UNBOUNDED PRECEDING..CURRENT
    ROW — so last_value returns the CURRENT row, not the partition's
    last (the bug behind a thousand wrong 'latest status' columns).
    The census proves both behaviors at once: the default-frame
    last_value equals the row's own value on EVERY row, while the
    explicit full frame equals the true partition-last (max_by) on
    every row. Unique order key keeps RANGE and ROWS identical.

    Scale shape: one window pass partitioned by priority; the census
    folds to 5 rows."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderkey").alias("k"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    wd = Window.partitionBy("prio").orderBy("k")
    wf = wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("prio")
    w = src.select(
        "prio",
        "cents",
        F.last("cents").over(wd).alias("lv_default"),
        F.last("cents").over(wf).alias("lv_full"),
        F.max_by("cents", "k").over(wp).alias("true_last"),
    )
    return (
        w.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("lv_default") == F.col("cents"), 1).otherwise(0)
            ).alias("n_default_eq_self"),
            F.sum(
                F.when(F.col("lv_full") == F.col("true_last"), 1).otherwise(0)
            ).alias("n_full_eq_last"),
            F.max("lv_full").alias("lv_full_cents"),
        )
        .orderBy("prio")
    )


# ---- 2.1 scans: nested-struct write + leaf-only projection pruning

_NESTED_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders WHERE o_orderkey <= 2000
GROUP BY 1 ORDER BY yr
"""


@query("scan_nested_struct_prune", "2.1 scans", _NESTED_ORACLE)
def scan_nested_struct_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct schema pruning — the 100 TB concern for wide
    event/log schemas: write a parquet whose payload hides two leaves
    inside a two-level struct, read it back touching ONLY those leaves,
    and verify the values (the companion plan test asserts ReadSchema
    carries just the projected leaves — a scan that rehydrates the
    whole struct reads 10× the bytes). The census must equal the flat
    oracle computed from the original source rows.

    Scale shape: nested-column pruning means the scan's ReadSchema is
    struct<dates:struct<yr:int>, fin:struct<cents:bigint>> only; the
    aggregate is map-side combinable."""
    import tempfile
    import uuid

    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.struct(
                F.struct(
                    F.year("o_orderdate").cast("int").alias("yr"),
                    F.col("o_orderdate").alias("ordered"),
                ).alias("dates"),
                F.struct(
                    F.floor(F.col("o_totalprice") * 100 + 0.5)
                    .cast("long")
                    .alias("cents"),
                    F.col("o_orderpriority").alias("prio"),
                ).alias("fin"),
            ).alias("payload"),
        )
    )
    path = tempfile.mkdtemp(prefix=f"nested_prune_{uuid.uuid4().hex[:8]}_")
    o.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("payload.dates.yr").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("payload.fin.cents").alias("cents"),
        )
        .orderBy("yr")
    )
