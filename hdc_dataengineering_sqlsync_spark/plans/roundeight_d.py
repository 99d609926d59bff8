"""SURVEY.md §2 round-8 batch D: line-grain corpus dedup and three-way
sync merge.

  text_dedup_segment_lines  CCNet-style non-overlapping segment dedup
  sync_three_way_merge      base/local/remote merge with conflict census

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ---------------- 2.9 llm-data: non-overlapping segment ("line") dedup

_SEG_W = 8  # tokens per segment

_SEGDUP_ORACLE = f"""
WITH segs AS (
  SELECT d.doc_id, d.source,
         md5(array_to_string(
               list_slice(string_split(d.text, ' '),
                          t.i * {_SEG_W} + 1, t.i * {_SEG_W} + {_SEG_W}), ' ')) AS seg
  FROM documents d,
       unnest(range(0, CAST(len(string_split(d.text, ' ')) // {_SEG_W} AS BIGINT))) t(i)
),
census AS (SELECT seg, count(*) AS n FROM segs GROUP BY seg),
perdoc AS (
  SELECT s.doc_id, s.source,
         count(*) AS n_segs,
         sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM segs s JOIN census c ON c.seg = s.seg
  GROUP BY s.doc_id, s.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_segs) AS BIGINT) AS n_segments,
       CAST(sum(n_dup) AS BIGINT) AS n_dup_segments,
       CAST((sum(n_dup) * 20000 + sum(n_segs)) // (2 * sum(n_segs)) AS BIGINT)
         AS dup_bps
FROM perdoc GROUP BY source ORDER BY source
"""


@query("text_dedup_segment_lines", "2.9 llm-data", _SEGDUP_ORACLE)
def text_dedup_segment_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-grain exact dedup, CCNet-style: the corpus is cut into
    NON-OVERLAPPING 8-token segments (the "lines" of this
    newline-free fixture; real corpora split on newline first) and every
    segment is checked against the global segment census — the document
    keeps its text but reports how much of it is corpus-duplicated
    boilerplate. Distinct from `dedup_substring_coverage`, whose windows
    OVERLAP (every position) and price duplication mass; the segment
    grain is what production line-dedup actually removes. Per-source
    rollup in half-up integer basis points.

    Scale shape: only 16-byte digests shuffle (segments hash before the
    census join, text never leaves the scan); the census join is
    hash-keyed on the digest; the per-doc and per-source reductions are
    map-combinable. The same shape at 100 TB — line dedup is a digest
    census plus one keyed join, never a pair comparison."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = F.split(F.col("text"), " ")
    nseg = (F.size(toks) / _SEG_W).cast("long")
    seg_arr = F.when(
        nseg > 0,
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.md5(F.array_join(F.slice(toks, i * _SEG_W + 1, _SEG_W), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    segs = docs.select("doc_id", "source", F.explode(seg_arr).alias("seg"))
    census = segs.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    perdoc = (
        segs.join(census, "seg")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_segs").alias("n_segments"),
            F.sum("n_dup").alias("n_dup_segments"),
            # integral DIV, not float '/'+floor: double division can round UP
            # across an integer boundary at large counts, diverging from the
            # oracle's exact '//' (repo integer-anchor discipline)
            F.expr(
                "(sum(n_dup) * 20000 + sum(n_segs)) DIV (2 * sum(n_segs))"
            ).alias("dup_bps"),
        )
        .orderBy("source")
    )


# --------------------------- 2.8 sync core: three-way merge with conflicts

_3WAY_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
classified AS (
  SELECT k, cents,
         (k % 6 = 1) AS lch,
         (k % 10 = 1) AS rch,
         cents + CASE WHEN k % 6 = 1 THEN 100 ELSE 0 END AS lcents,
         cents + CASE WHEN k % 10 = 1 THEN 200 ELSE 0 END AS rcents
  FROM base
)
SELECT CAST(sum(CASE WHEN NOT lch AND NOT rch THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unchanged,
       CAST(sum(CASE WHEN lch AND NOT rch THEN 1 ELSE 0 END) AS BIGINT)
         AS n_local_only,
       CAST(sum(CASE WHEN rch AND NOT lch THEN 1 ELSE 0 END) AS BIGINT)
         AS n_remote_only,
       CAST(sum(CASE WHEN lch AND rch THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conflict,
       CAST(sum(CASE WHEN lch THEN lcents ELSE rcents END) AS BIGINT)
         AS merged_cents
FROM classified
"""


@query("sync_three_way_merge", "2.8 sync core", _3WAY_ORACLE)
def sync_three_way_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way merge (base, local, remote) — the operation a
    disconnected-edit sync runs when both replicas diverged from a common
    ancestor: rows changed on one side apply cleanly, rows changed on
    BOTH sides are conflicts (resolved here local-wins, the policy being
    a parameter in the library form). Local and remote replicas are
    synthesized from orders with deterministic cent edits (local touches
    k%6==1, remote k%10==1, so k≡1 (mod 30) conflicts exist); the merge
    itself is a REAL 3-way outer join + per-row CASE classification — the
    oracle recomputes the census closed-form and never joins.

    Scale shape: one 3-way equi-join on the primary key (the two edited
    replicas co-partition with base on k) + a single global census
    aggregate; no windows, no skew. At 100 TB this is the standard
    reconcile shape: co-located PK joins, map-side classification."""
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    local = base.select(
        "k",
        (F.col("cents") + F.when(F.col("k") % 6 == 1, 100).otherwise(0)).alias("lcents"),
    )
    remote = base.select(
        "k",
        (F.col("cents") + F.when(F.col("k") % 10 == 1, 200).otherwise(0)).alias("rcents"),
    )
    merged = (
        base.join(local, "k", "full_outer")
        .join(remote, "k", "full_outer")
        .select(
            "k",
            (F.col("lcents") != F.col("cents")).alias("lch"),
            (F.col("rcents") != F.col("cents")).alias("rch"),
            "lcents",
            "rcents",
        )
    )
    return merged.agg(
        F.sum(F.when(~F.col("lch") & ~F.col("rch"), 1).otherwise(0)).alias("n_unchanged"),
        F.sum(F.when(F.col("lch") & ~F.col("rch"), 1).otherwise(0)).alias("n_local_only"),
        F.sum(F.when(F.col("rch") & ~F.col("lch"), 1).otherwise(0)).alias("n_remote_only"),
        F.sum(F.when(F.col("lch") & F.col("rch"), 1).otherwise(0)).alias("n_conflict"),
        F.sum(F.when(F.col("lch"), F.col("lcents")).otherwise(F.col("rcents"))).alias(
            "merged_cents"
        ),
    )
