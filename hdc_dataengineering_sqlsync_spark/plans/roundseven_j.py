"""SURVEY.md §2 round-7 batch J: MMR diversity re-ranking.

  simsearch_mmr_rerank  Maximal-Marginal-Relevance top-3 from a top-10 pool
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Relevance and inter-candidate similarity both live on the mutual-kNN
# unit-normalized 1e-4 integer grid (roundseven_b._MKNN_QN), so MMR with
# λ = 1/2 stays in EXACT integers: score = 2·rel − max_sim (the λ=0.5
# MMR objective scaled by 2). Greedy selection unrolls to three CTE
# steps — argmax with a vec_id tiebreak at each step.
_MMR_POOL = 10

_MMR_ORACLE = f"""
WITH qv AS (
SELECT vec_id, label, qn FROM (
  SELECT vec_id, label,
         list_transform(q, v -> CAST(floor(v * 10000 / sqrt(nn2) + 0.5) AS BIGINT)) AS qn
  FROM (
    SELECT vec_id, label,
           list_transform(range(1, 65), i -> CAST(round(embedding[i] * 1000) AS BIGINT)) AS q,
           list_sum(list_transform(range(1, 65), i ->
             CAST(round(embedding[i] * 1000) AS BIGINT)
             * CAST(round(embedding[i] * 1000) AS BIGINT))) AS nn2
    FROM embeddings
  ) WHERE nn2 > 0
)
),
qq AS (SELECT qn AS qx FROM qv WHERE vec_id = 0),
rel AS (
  SELECT v.vec_id,
         CAST(list_sum(list_transform(range(1, 65), i -> v.qn[i] * qq.qx[i])) AS BIGINT) AS rel
  FROM qv v, qq WHERE v.vec_id <> 0
),
pool AS (
  SELECT r.vec_id, r.rel, qv.qn
  FROM rel r JOIN qv ON qv.vec_id = r.vec_id
  ORDER BY r.rel DESC, r.vec_id LIMIT {_MMR_POOL}
),
sim AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(list_sum(list_transform(range(1, 65), i -> a.qn[i] * b.qn[i])) AS BIGINT) AS s
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
p1 AS (SELECT vec_id, rel FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
p2 AS (
  SELECT p.vec_id, p.rel, 2 * p.rel - sim.s AS score
  FROM pool p JOIN sim ON sim.ia = p.vec_id AND sim.ib = (SELECT vec_id FROM p1)
  WHERE p.vec_id <> (SELECT vec_id FROM p1)
  ORDER BY score DESC, p.vec_id LIMIT 1
),
p3 AS (
  SELECT p.vec_id, p.rel, 2 * p.rel - max(sim.s) AS score
  FROM pool p JOIN sim ON sim.ia = p.vec_id
  WHERE sim.ib IN ((SELECT vec_id FROM p1), (SELECT vec_id FROM p2))
    AND p.vec_id NOT IN ((SELECT vec_id FROM p1), (SELECT vec_id FROM p2))
  GROUP BY p.vec_id, p.rel
  ORDER BY score DESC, p.vec_id LIMIT 1
)
SELECT 1 AS rank, CAST(vec_id AS BIGINT) AS vec_id, rel,
       CAST(NULL AS BIGINT) AS mmr_score FROM p1
UNION ALL
SELECT 2, vec_id, rel, score FROM p2
UNION ALL
SELECT 3, vec_id, rel, score FROM p3
ORDER BY rank
"""


@query("simsearch_mmr_rerank", "2.9 llm-data", _MMR_ORACLE)
def simsearch_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversity re-ranking: from the top-10
    relevance pool for query vec 0, greedily pick 3 results maximizing
    2·rel − max-sim-to-already-picked (the λ=½ MMR objective scaled to
    stay in EXACT integers on the unit-normalized 1e-4 quantized grid) —
    the de-duplicating re-rank step between retrieval and the context
    window, where plain top-k returns near-copies. Greedy selection is
    inherently sequential, so it UNROLLS: k−1 bounded steps, each an
    argmax with a vec_id tiebreak over the 10-row pool; the oracle unrolls
    the identical three steps in SQL.

    Scale shape: the corpus-sized work is only the relevance scan
    (broadcast query, map-side integer dots, TakeOrderedAndProject to the
    pool); everything after runs on a k²-cell pool — MMR's cost is
    pool-sized by construction, which is exactly why production rerankers
    run it after a cheap first stage."""
    e = load(spark, sf_dir, "embeddings")
    q = F.transform("embedding", lambda x: F.round(x.cast("double") * 1000, 0).cast("long"))
    nn2 = F.aggregate("q", F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    qn_expr = F.transform(
        "q",
        lambda v: F.floor(
            v * F.lit(10000.0) / F.sqrt(F.col("nn2").cast("double")) + F.lit(0.5)
        ).cast("long"),
    )
    qv = (
        e.select("vec_id", q.alias("q"))
        .withColumn("nn2", nn2)
        .where(F.col("nn2") > 0)
        .select("vec_id", qn_expr.alias("qn"))
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    qx = qv.where(F.col("vec_id") == 0).select(F.col("qn").alias("qx"))
    pool = (
        qv.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qx))
        .select("vec_id", "qn", dot(F.col("qn"), F.col("qx")).alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .localCheckpoint()
    )
    a = pool.select(F.col("vec_id").alias("ia"), F.col("qn").alias("qa"), F.col("rel").alias("rel_a"))
    b = pool.select(F.col("vec_id").alias("ib"), F.col("qn").alias("qb"))
    sim = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select("ia", "ib", "rel_a", dot(F.col("qa"), F.col("qb")).alias("s"))
        .localCheckpoint()
    )
    p1 = pool.orderBy(F.desc("rel"), F.asc("vec_id")).limit(1).select(
        F.col("vec_id").alias("v1"), F.col("rel").alias("rel1")
    )
    p2 = (
        sim.crossJoin(F.broadcast(p1))
        .where(F.col("ib") == F.col("v1"))
        .select("ia", "rel_a", (2 * F.col("rel_a") - F.col("s")).alias("score"), "v1", "rel1")
        .orderBy(F.desc("score"), F.asc("ia"))
        .limit(1)
        .select("v1", "rel1", F.col("ia").alias("v2"), F.col("rel_a").alias("rel2"), F.col("score").alias("score2"))
    )
    p3 = (
        sim.crossJoin(F.broadcast(p2))
        .where(
            ((F.col("ib") == F.col("v1")) | (F.col("ib") == F.col("v2")))
            & (F.col("ia") != F.col("v1"))
            & (F.col("ia") != F.col("v2"))
        )
        .groupBy("ia", "rel_a", "v1", "rel1", "v2", "rel2", "score2")
        .agg((2 * F.col("rel_a").cast("long") - F.max("s")).alias("score"))
        .orderBy(F.desc("score"), F.asc("ia"))
        .limit(1)
    )
    return p3.selectExpr(
        "stack(3, 1, v1, rel1, cast(null as bigint),"
        " 2, v2, rel2, score2,"
        " 3, ia, rel_a, score) as (rank, vec_id, rel, mmr_score)"
    ).orderBy("rank")
