"""SURVEY.md §2 round-7 batch A: LLM-data pipeline depth + a sync quorum op.

Five qids:
  dedup_substring_coverage  ExactSubstr-style repeated-window coverage census
  text_oov_rate             out-of-vocabulary rate vs a corpus-derived vocab
  mix_dedup_soft_weights    inverse-cluster-size soft-dedup sampling weights
  sync_quorum_read_repair   3-replica majority-vote read-repair census
  simsearch_ndcg_eval       NDCG@10 of the int8-quantized ranking vs exact

All derived ratios are exact-integer (half-up basis points / ppm via the
``(x*2S + T) div (2T)`` idiom) so no cross-engine float rounding can flap a
value; every top-k carries a total order ending in the unique id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import duck_md5_int, query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------------------- 2.9 llm-data: substring-level dedup coverage

_SUBSTR_K = 8  # window length in tokens (ExactSubstr uses ~50 BPE tokens;
#                8 words keeps the fixture's 31-token vocab non-degenerate)

_SUBSTR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
win AS (
  SELECT doc_id, CAST(i.i AS BIGINT) AS s,
         array_to_string(t[CAST(i.i AS INT):CAST(i.i + {_SUBSTR_K - 1} AS INT)], ' ') AS w
  FROM toks, unnest(range(1, len(t) - {_SUBSTR_K - 2})) AS i(i)
),
dup AS (SELECT w FROM win GROUP BY w HAVING count(*) >= 2),
cov AS (
  SELECT DISTINCT doc_id, s + o.o AS pos
  FROM win JOIN dup USING (w), unnest(range(0, {_SUBSTR_K})) AS o(o)
),
percov AS (SELECT doc_id, count(*) AS c FROM cov GROUP BY doc_id),
perdoc AS (
  SELECT d.lang, len(string_split(d.text, ' ')) AS n, coalesce(p.c, 0) AS c
  FROM documents d LEFT JOIN percov p ON d.doc_id = p.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(c) AS BIGINT) AS covered_tokens,
       CAST((sum(c) * 20000 + sum(n)) // (2 * sum(n)) AS BIGINT) AS coverage_bps,
       CAST(count(CASE WHEN 2 * c > n THEN 1 END) AS BIGINT) AS n_docs_majority_dup
FROM perdoc GROUP BY lang ORDER BY lang
"""


def _substr_toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    return d.select("doc_id", "lang", t.alias("t"), F.size(t).alias("n"))


def _substr_win(toks: DataFrame) -> DataFrame:
    """Sliding 8-token window explode: one (doc_id, start, window-string)
    row per position. This subtree is the expensive part (split + slice +
    array_join string work over corpus mass), so the query shape must
    construct it exactly once."""
    return toks.where(F.col("n") >= _SUBSTR_K).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - (_SUBSTR_K - 1)),
                lambda s: F.struct(
                    s.cast("long").alias("s"),
                    F.array_join(F.slice(F.col("t"), s, _SUBSTR_K), " ").alias("w"),
                ),
            )
        ).alias("sw"),
    ).select("doc_id", F.col("sw.s").alias("s"), F.col("sw.w").alias("w"))


def _substr_rollup(toks: DataFrame, cov: DataFrame) -> DataFrame:
    perdoc = toks.join(cov, "doc_id", "left").select(
        "lang", "n", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.sum("c").alias("covered_tokens"),
            F.expr("(sum(c) * 20000 + sum(n)) div (2 * sum(n))").alias("coverage_bps"),
            F.sum(F.when(2 * F.col("c") > F.col("n"), 1).otherwise(0)).alias(
                "n_docs_majority_dup"
            ),
        )
        .orderBy("lang")
    )


@query("dedup_substring_coverage", "2.9 llm-data", _SUBSTR_ORACLE, bench=True)
def dedup_substring_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span coverage (Lee et al. 2022's
    substring dedup, the step AFTER document-level dedup): every sliding
    8-token window is hashed; a window occurring >= 2 times anywhere in the
    corpus marks ALL its token positions as duplicated; per-lang census of
    covered-token share (half-up integer bps) and docs that are
    majority-duplicated (2*covered > total — no float threshold).

    Scale shape (r13): the window table is built ONCE and shuffled ONCE by
    window key; a window count-over-partition marks duplicated occurrences
    in place, and per-doc covered tokens come from a sorted-start interval
    merge (first window covers K, each next covers min(K, gap)) — no x8
    position re-explode, no distinct shuffle. The retired census+join form
    (`_substring_coverage_censusjoin`, pinned output-identical by test)
    built the corpus-mass window subtree TWICE (census + join probe) and
    its map-side partial agg collapsed nothing on mostly-unique windows; at
    100 TB its dup table also outgrows a broadcast, degrading the probe to
    a second corpus-mass shuffle. Known trade, documented: a pathologically
    hot window key lands its occurrences in one spillable window buffer
    here, where the census form partially aggregated it map-side — the
    interval-merge shuffle by doc_id carries dup mass only either way. At
    100 TB the window string is replaced by its 8-byte hash
    (collision-safe census) and the shuffle shards by hash exactly like
    exact dedup; no driver state, no all-pairs step anywhere."""
    toks = _substr_toks(spark, sf_dir)
    win = _substr_win(toks)
    occ = (
        win.withColumn("_nw", F.count(F.lit(1)).over(Window.partitionBy("w")))
        .where(F.col("_nw") >= 2)
        .select("doc_id", "s")
    )
    ws = Window.partitionBy("doc_id").orderBy("s")
    cov = (
        occ.withColumn("_p", F.lag("s").over(ws))
        .select(
            "doc_id",
            F.when(F.col("_p").isNull(), F.lit(_SUBSTR_K))
            .otherwise(F.least(F.lit(_SUBSTR_K), F.col("s") - F.col("_p")))
            .alias("_cv"),
        )
        .groupBy("doc_id")
        .agg(F.sum("_cv").alias("c"))
    )
    return _substr_rollup(toks, cov)


def _substring_coverage_censusjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r13 form, kept as the equivalence pin for the r13 rewrite: dup
    census (groupBy window string) + join-back + x8 position explode +
    distinct. Builds the window subtree twice per action."""
    toks = _substr_toks(spark, sf_dir)
    win = _substr_win(toks)
    dup = win.groupBy("w").agg(F.count(F.lit(1)).alias("_c")).where(F.col("_c") >= 2).select("w")
    cov = (
        win.join(dup, "w")
        .select("doc_id", F.explode(F.sequence(F.col("s"), F.col("s") + (_SUBSTR_K - 1))).alias("pos"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _substr_rollup(toks, cov)


# ------------------------------------ 2.9 llm-data: out-of-vocabulary rate

_OOV_VOCAB_K = 10

_OOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
vocab AS (
  SELECT w FROM tok GROUP BY w ORDER BY count(*) DESC, w LIMIT {_OOV_VOCAB_K}
),
perdoc AS (
  SELECT doc_id, lang, count(*) AS n,
         count(CASE WHEN w NOT IN (SELECT w FROM vocab) THEN 1 END) AS oov
  FROM tok GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       CAST((sum(oov) * 20000 + sum(n)) // (2 * sum(n)) AS BIGINT) AS oov_bps,
       CAST(count(CASE WHEN 4 * oov > n THEN 1 END) AS BIGINT) AS n_docs_high_oov
FROM perdoc GROUP BY lang ORDER BY lang
"""


@query("text_oov_rate", "2.9 llm-data", _OOV_ORACLE)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a corpus-derived top-10
    vocabulary (count DESC, token ASC — fully deterministic cut): the
    coverage check run before freezing a tokenizer vocab, and a spam/noise
    signal (high-OOV docs = 4*oov > n, integer compare). OOV share in
    half-up integer bps.

    Scale shape: token explode + ONE map-side-combinable vocab count (the
    pass any tokenizer-training job already makes); the vocab is Zipf-small
    and broadcasts to the per-doc flag join — no second corpus-sized
    shuffle beyond the (doc,lang) reduce. At 100 TB the vocab cut runs on
    the reduced count table (|vocab| rows, not corpus rows)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("w"))
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.desc("_c"), F.asc("w"))
        .limit(_OOV_VOCAB_K)
        .select("w", F.lit(1).alias("_in"))
    )
    perdoc = (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("_in").isNull(), 1)).alias("oov"),
        )
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_tokens"),
            F.sum("oov").alias("n_oov"),
            F.expr("(sum(oov) * 20000 + sum(n)) div (2 * sum(n))").alias("oov_bps"),
            F.count(F.when(4 * F.col("oov") > F.col("n"), 1)).alias("n_docs_high_oov"),
        )
        .orderBy("lang")
    )


# ------------------------- 2.9 llm-data: soft-dedup sampling weights

_SOFTW_ORACLE = """
WITH c AS (
  SELECT doc_id, lang,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k
  FROM documents
),
sz AS (SELECT k, count(*) AS size FROM c GROUP BY k),
w AS (
  SELECT c.lang, c.k, CAST(1000000 // sz.size AS BIGINT) AS w_ppm, sz.size
  FROM c JOIN sz ON c.k = sz.k
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT k) AS BIGINT) AS n_clusters,
       CAST(sum(w_ppm) AS BIGINT) AS sum_w_ppm,
       CAST(max(size) AS BIGINT) AS max_cluster_size
FROM w GROUP BY lang ORDER BY lang
"""


@query("mix_dedup_soft_weights", "2.9 llm-data", _SOFTW_ORACLE)
def mix_dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-dedup sampling weights (the MassiveText/Gopher alternative to
    hard removal): each document's weight is 1/cluster_size in floor-ppm
    integer units, cluster = md5 of the sorted distinct-token SET (the
    bag-normalized near-dup key — word order and repetition don't split a
    cluster). Per-lang census: docs, clusters touched, total retained
    sampling mass (sum_w_ppm -> n_clusters*1e6 when clusters are
    lang-pure), largest cluster.

    Scale shape: the cluster key derives map-side (split/distinct/sort/md5
    HOFs, no shuffle), cluster sizes are ONE keyed count, the weight join
    shuffles on the same key — exactly the exact-dedup plan plus one
    integer division. At 100 TB this replaces a destructive distinct with
    a weight column the sampler consumes downstream."""
    d = load(spark, sf_dir, "documents")
    k = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " "))
    c = d.select("doc_id", "lang", k.alias("k"))
    sz = c.groupBy("k").agg(F.count(F.lit(1)).alias("size"))
    w = c.join(sz, "k").select(
        "lang", "k", F.expr("1000000 div size").alias("w_ppm"), "size"
    )
    return (
        w.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("k").alias("n_clusters"),
            F.sum("w_ppm").alias("sum_w_ppm"),
            F.max("size").alias("max_cluster_size"),
        )
        .orderBy("lang")
    )


# ----------------------- 2.8 sync core: quorum read-repair classification

_QUORUM_ORACLE = f"""
WITH a AS (SELECT o_orderkey AS k, CAST(o_custkey AS BIGINT) AS v FROM orders),
b AS (
  SELECT o_orderkey AS k,
         CAST(o_custkey + CASE WHEN {duck_md5_int("CAST(o_orderkey AS VARCHAR)", 6)} % 19 = 0
                                THEN 1000000 ELSE 0 END AS BIGINT) AS v
  FROM orders
),
c AS (
  SELECT o_orderkey AS k,
         CAST(o_custkey + CASE WHEN {duck_md5_int("CAST(o_orderkey AS VARCHAR) || 'c'", 6)} % 31 = 0
                                THEN 2000000 ELSE 0 END AS BIGINT) AS v
  FROM orders WHERE o_orderkey % 23 <> 0
),
u AS (
  SELECT k, v FROM a UNION ALL SELECT k, v FROM b UNION ALL SELECT k, v FROM c
),
cls AS (
  SELECT k, count(*) AS p, count(DISTINCT v) AS nv FROM u GROUP BY k
)
SELECT CASE WHEN p = 3 AND nv = 1 THEN 'consistent'
            WHEN p = 3 AND nv = 2 THEN 'repair_value'
            WHEN p = 2 AND nv = 1 THEN 'repair_missing'
            ELSE 'conflict' END AS state,
       CAST(count(*) AS BIGINT) AS n_keys
FROM cls GROUP BY 1 ORDER BY state
"""


@query("sync_quorum_read_repair", "2.8 sync core", _QUORUM_ORACLE)
def sync_quorum_read_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quorum read-repair classification over 3 derived replicas of the
    orders keyspace (replica B corrupts values on an md5-hash stripe,
    replica C drops every 23rd key and corrupts a different stripe):
    per-key presence/agreement counts classify into consistent (3/3 agree),
    repair_value (2-of-3 majority outvotes one divergent copy),
    repair_missing (2 present and agree — write back to the absent
    replica), conflict (no majority). The census a Dynamo-style
    anti-entropy pass emits before issuing repairs — the detector
    complementing sync_conflict_lww's resolver and sync_anti_entropy_merkle's
    digest tree.

    Scale shape: union of three scans + ONE keyed count/count-distinct
    aggregate (map-side combinable) + a 4-row census — no join at all; at
    100 TB each replica leg is an independent partitioned scan and the
    group-by shards on the key like any exact dedup."""
    o = load(spark, sf_dir, "orders")
    key_hash = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 6), 16, 10).cast(
        "long"
    )
    key_hash_c = F.conv(
        F.substring(F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("c"))), 1, 6), 16, 10
    ).cast("long")
    a = o.select(F.col("o_orderkey").alias("k"), F.col("o_custkey").cast("long").alias("v"))
    b = o.select(
        F.col("o_orderkey").alias("k"),
        (
            F.col("o_custkey")
            + F.when(key_hash % 19 == 0, F.lit(1000000)).otherwise(F.lit(0))
        ).cast("long").alias("v"),
    )
    cc = o.where(F.col("o_orderkey") % 23 != 0).select(
        F.col("o_orderkey").alias("k"),
        (
            F.col("o_custkey")
            + F.when(key_hash_c % 31 == 0, F.lit(2000000)).otherwise(F.lit(0))
        ).cast("long").alias("v"),
    )
    u = a.unionAll(b).unionAll(cc)
    cls = u.groupBy("k").agg(
        F.count(F.lit(1)).alias("p"), F.countDistinct("v").alias("nv")
    )
    state = (
        F.when((F.col("p") == 3) & (F.col("nv") == 1), F.lit("consistent"))
        .when((F.col("p") == 3) & (F.col("nv") == 2), F.lit("repair_value"))
        .when((F.col("p") == 2) & (F.col("nv") == 1), F.lit("repair_missing"))
        .otherwise(F.lit("conflict"))
    )
    return (
        cls.select(state.alias("state"))
        .groupBy("state")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("state")
    )


# ------------------------- 2.9 llm-data: NDCG@10 of the quantized ranking

_NDCG_K = 10
_NDCG_QUERIES = 5
# floor(1e6 / log2(r+1)) — integer micro-unit discount table shared verbatim
# by both engines, so the rank-weighted gain sums are exact int64.
_NDCG_DISC = [int(1_000_000 / math.log2(r + 1)) for r in range(1, _NDCG_K + 1)]
_NDCG_IDCG = sum(_NDCG_DISC)

_NDCG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {_NDCG_QUERIES}
),
comp AS (
  SELECT q.qid, e.vec_id,
         CAST(e.embedding[i.range] AS DOUBLE) AS x,
         CAST(q.qe[i.range] AS DOUBLE) AS y,
         i.range AS pos
  FROM embeddings e CROSS JOIN q CROSS JOIN range(1, 65) i
  WHERE e.vec_id <> q.qid
),
ex AS (
  SELECT qid, vec_id,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) AS c
  FROM comp GROUP BY qid, vec_id
),
rel AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS r
    FROM ex
  ) WHERE r <= {_NDCG_K}
),
mx AS (
  SELECT vec_id, max(abs(CAST(embedding[i.range] AS DOUBLE))) AS m
  FROM embeddings CROSS JOIN range(1, 65) i GROUP BY vec_id
),
dot AS (
  SELECT c.qid, c.vec_id,
         sum(CAST(floor(c.x * (127.0 / md.m) + 0.5) AS BIGINT)
             * CAST(floor(c.y * (127.0 / mq.m) + 0.5) AS BIGINT)) AS d
  FROM comp c
  JOIN mx md ON md.vec_id = c.vec_id
  JOIN mx mq ON mq.vec_id = c.qid
  WHERE md.m > 0 AND mq.m > 0
  GROUP BY c.qid, c.vec_id
),
cand AS (
  SELECT qid, vec_id, r FROM (
    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY d DESC, vec_id) AS r
    FROM dot
  ) WHERE r <= {_NDCG_K}
),
disc(r, dd) AS (VALUES {", ".join(f"({r + 1}, {d})" for r, d in enumerate(_NDCG_DISC))}),
scored AS (
  SELECT c.qid,
         count(rel.vec_id) AS n_hits,
         coalesce(sum(CASE WHEN rel.vec_id IS NOT NULL THEN disc.dd END), 0) AS num
  FROM cand c
  JOIN disc ON disc.r = c.r
  LEFT JOIN rel ON rel.qid = c.qid AND rel.vec_id = c.vec_id
  GROUP BY c.qid
)
SELECT CAST(qid AS BIGINT) AS query_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(num * 1000000 // {_NDCG_IDCG} AS BIGINT) AS ndcg_ppm
FROM scored ORDER BY query_id
"""


@query("simsearch_ndcg_eval", "2.9 llm-data", _NDCG_ORACLE)
def simsearch_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the int8-quantized ranking against the exact-double top-10
    (binary relevance), per query — the rank-POSITION-weighted quality gate
    that recall@k can't express (losing rank 1 costs more than losing rank
    10). Quantization is simsearch_quantize_int8's exact scheme (per-vector
    symmetric scale, floor(x*(127/m)+0.5)); the integer dot product ranks
    with a vec_id tiebreak, discounts are a shared floor(1e6/log2(r+1))
    integer table, so NDCG lands in exact ppm on both engines.

    Scale shape: the eval harness runs on a FIXED query panel (5 queries
    here; a sample at 100 TB) — both legs are broadcast-query brute scans,
    linear in the corpus, reduced to two k-row rank lists per query before
    the tiny evaluation join; the production first stage being evaluated
    (IVF/LSH) already prunes its scan, the eval's exact leg is the cost of
    honesty and is bounded by panel size."""
    from hdc_dataengineering_sqlsync_spark.functions.vectors import (
        cosine_similarity,
    )

    e = load(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda v: v.cast("double"))
    base = e.select("vec_id", xd.alias("x")).withColumn(
        "m", F.array_max(F.transform("x", F.abs))
    )
    qs = base.where(F.col("vec_id") < _NDCG_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("x").alias("qx"), F.col("m").alias("qm")
    )
    pairs = base.crossJoin(F.broadcast(qs)).where(F.col("vec_id") != F.col("qid"))

    wq = Window.partitionBy("qid")
    rel = (
        pairs.select(
            "qid", "vec_id", F.round(cosine_similarity("x", "qx"), 4).alias("c")
        )
        .withColumn("r", F.row_number().over(wq.orderBy(F.desc("c"), F.asc("vec_id"))))
        .where(F.col("r") <= _NDCG_K)
        .select("qid", "vec_id", F.lit(1).alias("_hit"))
    )

    def _qint(arr, mcol):
        return F.transform(
            arr, lambda v: F.floor(v * (F.lit(127.0) / F.col(mcol)) + F.lit(0.5)).cast("long")
        )

    dot_int = F.aggregate(
        F.zip_with(_qint(F.col("x"), "m"), _qint(F.col("qx"), "qm"), lambda p, r: p * r),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = (
        pairs.where((F.col("m") > 0) & (F.col("qm") > 0))
        .select("qid", "vec_id", dot_int.alias("d"))
        .withColumn("r", F.row_number().over(wq.orderBy(F.desc("d"), F.asc("vec_id"))))
        .where(F.col("r") <= _NDCG_K)
        .select("qid", "vec_id", "r")
    )
    disc = F.element_at(F.array(*[F.lit(d) for d in _NDCG_DISC]), F.col("r"))
    return (
        cand.join(rel, ["qid", "vec_id"], "left")
        .select("qid", "r", F.col("_hit").isNotNull().alias("hit"), disc.alias("dd"))
        .groupBy("qid")
        .agg(
            F.count(F.when(F.col("hit"), 1)).alias("n_hits"),
            F.coalesce(F.sum(F.when(F.col("hit"), F.col("dd"))), F.lit(0)).alias("_num"),
        )
        .select(
            F.col("qid").cast("long").alias("query_id"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr(f"cast(_num * 1000000 div {_NDCG_IDCG} as bigint)").alias("ndcg_ppm"),
        )
        .orderBy("query_id")
    )
