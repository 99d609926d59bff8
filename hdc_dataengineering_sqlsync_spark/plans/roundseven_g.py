"""SURVEY.md §2 round-7 batch G: per-document token entropy and filtered
vector search.

  text_entropy_unigram   per-doc token-distribution entropy quality signal
  simsearch_filtered_ann metadata-predicate vector search (pre-filter)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------- 2.9 llm-data: per-document unigram entropy

_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
cnt AS (SELECT doc_id, lang, w, count(*) AS c FROM tok GROUP BY 1, 2, 3),
tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
h AS (
  SELECT cnt.lang, cnt.doc_id,
         -sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS ent
  FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
  GROUP BY cnt.lang, cnt.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ent), 4) AS avg_entropy,
       round(min(ent), 4) AS min_entropy,
       CAST(count(CASE WHEN ent < 2.0 THEN 1 END) AS BIGINT) AS n_low_entropy
FROM h GROUP BY lang ORDER BY lang
"""


@query("text_entropy_unigram", "2.9 llm-data", _ENTROPY_ORACLE)
def text_entropy_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy — the lexical
    DIVERSITY quality signal (low entropy = keyword stuffing, template
    spam, or repetition the ratio filter can miss when the few distinct
    tokens are balanced); per-lang census with a <2-nat low-entropy count.
    Counts are exact integers; the p·ln p terms are identical expression
    strings per (doc, token) and each doc sums its own Zipf-small term set
    before the 4dp rounding (the text_unigram_logprob convention).

    Scale shape: token explode → ONE map-side-combinable (doc, token)
    count → per-doc entropy sum (vocabulary-grain per doc) → per-lang
    census; no join against anything corpus-sized, no window."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("w"))
    cnt = tok.groupBy("doc_id", "lang", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    h = (
        cnt.join(tot, "doc_id")
        .groupBy("lang", "doc_id")
        .agg((-F.sum(p * F.log(p))).alias("ent"))
    )
    return (
        h.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ent"), 4).alias("avg_entropy"),
            F.round(F.min("ent"), 4).alias("min_entropy"),
            F.count(F.when(F.col("ent") < 2.0, 1)).alias("n_low_entropy"),
        )
        .orderBy("lang")
    )


# --------------------- 2.9 llm-data: filtered vector search (pre-filter)

_FILTERED_ANN_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
comp AS (
  SELECT e.vec_id, e.label,
         round(
           sum(CAST(e.embedding[i.range] AS DOUBLE) * CAST(q.qe[i.range] AS DOUBLE))
           / (sqrt(sum(CAST(e.embedding[i.range] AS DOUBLE) * CAST(e.embedding[i.range] AS DOUBLE)))
              * sqrt(sum(CAST(q.qe[i.range] AS DOUBLE) * CAST(q.qe[i.range] AS DOUBLE)))),
           4) AS cos
  FROM embeddings e CROSS JOIN q CROSS JOIN range(1, 65) i
  WHERE e.vec_id <> 0 AND e.label IN (2, 3)
  GROUP BY e.vec_id, e.label
)
SELECT vec_id, CAST(label AS INT) AS label, cos
FROM comp ORDER BY cos DESC, vec_id LIMIT 5
"""


@query("simsearch_filtered_ann", "2.9 llm-data", _FILTERED_ANN_ORACLE)
def simsearch_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search: top-5 cosine neighbors of vec_id 0 among
    vectors satisfying a metadata predicate (label ∈ {2,3}) — the shape
    every retrieval system with tenancy/ACL/freshness filters runs. This
    is the PRE-filter strategy: the predicate prunes BEFORE scoring, so
    top-k is exact over the eligible set (post-filtering an unfiltered
    top-k under-returns whenever eligible density < k/corpus — the classic
    filtered-ANN failure). Cosine rounds 4dp with vec_id tiebreak.

    Scale shape: the predicate reaches the parquet scan (PushedFilters on
    the label column — at 100 TB this is partition/row-group pruning when
    the index is label-partitioned, the simsearch_ivf_persisted layout);
    scoring is a broadcast-query map-side pass over eligible rows only +
    TakeOrderedAndProject. With an IVF index the same pre-filter applies
    per cell before the probe."""
    from hdc_dataengineering_sqlsync_spark.functions.vectors import cosine_similarity

    e = load(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda v: v.cast("double"))
    q = (
        e.where(F.col("vec_id") == 0)
        .select(xd.alias("qx"))
    )
    return (
        e.where((F.col("vec_id") != 0) & (F.col("label").isin(2, 3)))
        .select("vec_id", F.col("label").cast("int").alias("label"), xd.alias("x"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.round(cosine_similarity("x", "qx"), 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(5)
    )
