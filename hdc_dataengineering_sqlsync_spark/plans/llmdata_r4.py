"""SURVEY.md §2.9 LLM-data round-4 additions (split out of the round-4
modules, r5).

Passage dedup, URL canonicalization, temperature mixture weights, PQ-ADC
and two-stage rerank ANN, cell-blocked semantic dedup, RAG chunking,
boilerplate pruning, and the real-codec multimodal extensions (scene cut,
image tiles, audio segments, binaryFile scan).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.registry import load



# ------------------------------------------------------------ 2.9 llm-data

_PASSAGE_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS toks
  FROM documents
),
chunks AS (
  SELECT doc_id, lang,
         md5(array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ')) AS phash
  FROM tok, unnest(range(0, CAST(floor(len(toks) / 20) AS BIGINT))) AS t(i)
),
per_hash AS (
  SELECT lang, phash, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
  FROM chunks GROUP BY lang, phash
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS n_passages,
       count(*) AS n_distinct,
       CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       round(CAST(sum(CASE WHEN n_docs > 1 THEN cnt ELSE 0 END) AS DOUBLE)
             / sum(cnt), 4) AS shared_frac
FROM per_hash GROUP BY lang ORDER BY lang
"""


@query("dedup_passage_exact", "2.9 llm-data", _PASSAGE_ORACLE)
def dedup_passage_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (the RefinedWeb/CCNet line-dedup shape):
    each doc splits into consecutive non-overlapping 20-token passages
    (tail fragments dropped), passages key by md5 of their joined text, and
    a passage is 'shared' when it appears in more than one document of the
    same lang — boilerplate detection finer than whole-doc dedup_exact and
    cheaper than shingle Jaccard. All map-side builtin array ops (split →
    slice per chunk index → md5) until one keyed count; at 100 TB only
    16-byte hashes shuffle, never passage text, and the per-lang rollup is
    a second tiny agg."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    n_chunks = F.floor(F.size(toks) / 20).cast("int")
    # guard: sequence(0, -1) would count DOWN ([0, -1]) for sub-20-token
    # docs — emit an empty chunk list instead (explode then drops the row,
    # matching the oracle's empty range())
    idx = F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(idx, lambda i: F.md5(F.array_join(F.slice(toks, i * 20 + 1, 20), " ")))
        ).alias("phash"),
    )
    per_hash = chunks.groupBy("lang", "phash").agg(
        F.count(F.lit(1)).alias("cnt"), F.countDistinct("doc_id").alias("n_docs")
    )
    shared = F.col("n_docs") > 1
    return (
        per_hash.groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_passages"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(shared.cast("long")).alias("n_shared"),
            F.round(
                F.sum(F.when(shared, F.col("cnt")).otherwise(F.lit(0))).cast("double")
                / F.sum("cnt"),
                4,
            ).alias("shared_frac"),
        )
        .orderBy("lang")
    )


# Deterministic URL fixture (the text_pii_redact technique: synthesize from
# customer inside the query so DuckDB reproduces it without extra files).
# Noise: uppercase scheme/host, explicit :443, utm_* tracking params,
# trailing slash, #fragment — all things canonicalization must strip.
_URL_EXPR_SQL = """
  'HTTPS://WWW.Shop' || CAST(c_custkey % 50 AS VARCHAR) || '.COM'
  || CASE WHEN c_custkey % 3 = 0 THEN ':443' ELSE '' END
  || '/item/' || CAST(c_custkey % 200 AS VARCHAR)
  || CASE WHEN c_custkey % 2 = 0 THEN '/' ELSE '' END
  || CASE WHEN c_custkey % 4 = 0
          THEN '?utm_source=news' || CAST(c_custkey % 7 AS VARCHAR) ELSE '' END
  || CASE WHEN c_custkey % 5 = 0 THEN '#sec' || CAST(c_custkey % 3 AS VARCHAR)
          ELSE '' END
"""

_URL_ORACLE = f"""
WITH raw AS (SELECT c_custkey, {_URL_EXPR_SQL} AS url FROM customer),
canon AS (
  SELECT c_custkey, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(regexp_replace(lower(url), '#.*$', ''),
                              ':443/', '/'),
               '[?&]utm_[a-z]+=[a-z0-9]*', ''),
             '/$', ''),
           '/([?])', '?') AS curl
  FROM raw
)
SELECT count(*) AS n_urls,
       count(DISTINCT url) AS n_raw_distinct,
       count(DISTINCT curl) AS n_canon_distinct,
       count(DISTINCT regexp_extract(curl, '^https://([^/:?#]+)', 1)) AS n_hosts
FROM canon
"""


@query("text_url_canonicalize", "2.9 llm-data", _URL_ORACLE)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the first step of any web-scale crawl
    pipeline: scheme/host lowercasing, default-port (:443) stripping,
    utm_* tracking-param removal, trailing-slash and #fragment stripping
    collapse cosmetically distinct URLs onto one canonical form (raw
    distinct count >> canonical distinct count). Fixture URLs synthesize
    deterministically from customer keys; every transform is a sequential
    RE2∩Java-safe regexp_replace (JVM codegen, the text_pii_redact
    pattern), so the whole op is map-side until four final counters in ONE
    aggregate. ':443' strips via ':443/' -> '/' (the path slash anchors
    the port end — RE2 has no lookahead)."""
    c = load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    url = F.concat(
        F.lit("HTTPS://WWW.Shop"),
        (key % 50).cast("string"),
        F.lit(".COM"),
        F.when(key % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/item/"),
        (key % 200).cast("string"),
        F.when(key % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(key % 4 == 0, F.concat(F.lit("?utm_source=news"), (key % 7).cast("string"))).otherwise(
            F.lit("")
        ),
        F.when(key % 5 == 0, F.concat(F.lit("#sec"), (key % 3).cast("string"))).otherwise(
            F.lit("")
        ),
    )
    curl = F.lower(url)
    curl = F.regexp_replace(curl, r"#.*$", "")
    curl = F.regexp_replace(curl, r":443/", "/")
    curl = F.regexp_replace(curl, r"[?&]utm_[a-z]+=[a-z0-9]*", "")
    curl = F.regexp_replace(curl, r"/$", "")
    curl = F.regexp_replace(curl, r"/([?])", "?")
    host = F.regexp_extract(curl, r"^https://([^/:?#]+)", 1)
    return c.select(url.alias("url"), curl.alias("curl"), host.alias("host")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url").alias("n_raw_distinct"),
        F.countDistinct("curl").alias("n_canon_distinct"),
        F.countDistinct("host").alias("n_hosts"),
    )


_TEMPERATURE_ORACLE = """
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(lower(text), '\\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM per_lang)
SELECT lang, n_docs, n_tokens,
       round(n_tokens / total, 4) AS p_raw,
       round(sqrt(n_tokens / total)
             / sum(sqrt(n_tokens / total)) OVER (), 4) AS w_temp
FROM per_lang CROSS JOIN tot
ORDER BY lang
"""


@query("mix_temperature_weights", "2.9 llm-data", _TEMPERATURE_ORACLE)
def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (the mT5/UniMax multilingual
    rebalance): raw token shares p_i flatten to w_i ∝ p_i^(1/T) with
    1/T = 0.5, boosting low-resource langs without equalizing. α = 0.5
    deliberately: p^0.5 is IEEE sqrt — correctly rounded and identical in
    both engines, unlike a general pow. One agg to #langs rows; the
    normalizer is a window/broadcast over that tiny table, so at 100 TB
    this costs one map-side-combinable token count. Companion to
    mix_sampling_weights (budget-capped allocation) and sample_hash_*
    (the draw itself)."""
    d = load(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), r"\s+"))).alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    p = F.col("n_tokens") / F.sum("n_tokens").over(w_all).cast("double")
    w = F.sqrt(p) / F.sum(F.sqrt(p)).over(w_all)
    return per_lang.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(p, 4).alias("p_raw"),
        F.round(w, 4).alias("w_temp"),
    ).orderBy("lang")


# Product quantization: 8 subspaces x 8 dims, 4 codes each. Codebook entries
# are CLOSED-FORM integers — cent(s, c)[j] = ((s*8+j)*(c+1)*7) % 41 - 20 —
# so both engines derive identical literals and, with embeddings quantized
# to integer 1e-3 units (the simsearch_centroid_assign technique), every
# dot product is exact int64: associative, order-free, bit-identical.
_PQ_SUBS, _PQ_DIMS, _PQ_CODES = 8, 8, 4


def _pq_cent(s: int, c: int) -> list[int]:
    return [((s * _PQ_DIMS + j) * (c + 1) * 7) % 41 - 20 for j in range(_PQ_DIMS)]


def _pq_oracle() -> str:
    # exact-int subspace dots: d_{s}_{c} = sum_j q[s*8+j+1] * cent[j]
    def dot(s: int, c: int) -> str:
        cent = _pq_cent(s, c)
        terms = " + ".join(
            f"CAST(round(embedding[{s * _PQ_DIMS + j + 1}] * 1000) AS BIGINT) * ({cent[j]})"
            for j in range(_PQ_DIMS)
        )
        return f"CAST({terms} AS BIGINT)"

    dots = ",\n         ".join(
        f"{dot(s, c)} AS d{s}_{c}" for s in range(_PQ_SUBS) for c in range(_PQ_CODES)
    )
    # per-subspace code: argmax dot, ties toward the greatest code id —
    # test codes in DESCENDING order, first one >= all others wins
    codes = ",\n         ".join(
        "CASE "
        + " ".join(
            f"WHEN "
            + " AND ".join(f"d{s}_{c} >= d{s}_{o}" for o in range(_PQ_CODES) if o != c)
            + f" THEN {c}"
            for c in range(_PQ_CODES - 1, -1, -1)
        )
        + f" END AS code{s}"
        for s in range(_PQ_SUBS)
    )
    adc = " + ".join(
        "CASE v.code{s} ".format(s=s)
        + " ".join(f"WHEN {c} THEN q.d{s}_{c}" for c in range(_PQ_CODES))
        + " END"
        for s in range(_PQ_SUBS)
    )
    return f"""
WITH dots AS (
  SELECT vec_id,
         {dots}
  FROM embeddings
),
coded AS (
  SELECT vec_id,
         {codes}
  FROM dots
),
q AS (SELECT * FROM dots WHERE vec_id = 0)
SELECT v.vec_id, round(CAST(({adc}) AS DOUBLE) / 1e6, 4) AS adc_sim
FROM coded v CROSS JOIN q
WHERE v.vec_id <> 0
ORDER BY adc_sim DESC, v.vec_id
LIMIT 5
"""


@query("simsearch_pq_adc", "2.9 llm-data", _pq_oracle())
def simsearch_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation (ADC)
    — the memory-side of IVF-PQ indexes: each 64-dim embedding encodes to
    8 codes of 2 bits (argmax inner product against 4 closed-form integer
    centroids per 8-dim subspace, ties toward the greatest code), and the
    UNQUANTIZED query scores candidates via an 8×4 lookup table of exact
    query-centroid dots — candidates are never decoded. Index memory per
    vector drops 64×4 bytes → 2 bytes; at 100 TB the codebook and the
    query's lookup table broadcast (here: a 1-row broadcast cross join)
    while candidates stay map-side until the global top-5, which plans as
    TakeOrderedAndProject (per-partition k, no global sort). Exact int64
    everywhere (1e-3-quantized embeddings × integer centroids), so scores
    are bit-identical across engines and partitionings."""
    e = load(spark, sf_dir, "embeddings")

    def dot(s: int, c: int):
        cent = _pq_cent(s, c)
        sub = F.slice("embedding", s * _PQ_DIMS + 1, _PQ_DIMS)
        return F.aggregate(
            F.zip_with(
                sub,
                F.array(*[F.lit(v) for v in cent]),
                lambda x, y: F.round(x.cast("double") * 1000, 0).cast("long") * y.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    dcols = e.select(
        "vec_id", *[dot(s, c).alias(f"d{s}_{c}") for s in range(_PQ_SUBS) for c in range(_PQ_CODES)]
    )
    code = [
        F.greatest(
            *[
                F.struct(F.col(f"d{s}_{c}").alias("d"), F.lit(c).alias("c"))
                for c in range(_PQ_CODES)
            ]
        )["c"].alias(f"code{s}")
        for s in range(_PQ_SUBS)
    ]
    coded = dcols.select("vec_id", *code).where(F.col("vec_id") != 0)
    qlut = dcols.where(F.col("vec_id") == 0).select(
        *[F.col(f"d{s}_{c}").alias(f"q{s}_{c}") for s in range(_PQ_SUBS) for c in range(_PQ_CODES)]
    )
    adc = sum(
        F.element_at(
            F.array(*[F.col(f"q{s}_{c}") for c in range(_PQ_CODES)]), F.col(f"code{s}") + 1
        )
        for s in range(_PQ_SUBS)
    )
    return (
        coded.crossJoin(F.broadcast(qlut))
        .select("vec_id", F.round(adc.cast("double") / 1e6, 4).alias("adc_sim"))
        .orderBy(F.desc("adc_sim"), "vec_id")
        .limit(5)
    )


# Coarse codebook for cell-blocked semantic dedup: K closed-form integer
# centroids — cent(c)[j] = ((j + 1) * (2*c + 3) * 11) % 41 - 20 — so both
# engines derive identical literals at ANY K. K is THE scale dial: cells
# shard the quadratic pair scan, so K grows with corpus size
# (K ~ n / target_cell_size). K=16 here; the r4 10x stress probe measured
# the cliff at K=4 (6.9s -> 95s for 10x vectors) and the fix is more
# cells, not a different algorithm.
# Data-driven codebook size (r6): K = ceil(n / _SEM_TARGET_CELL), so the
# expected cell population stays ~constant and the intra-cell pair scan
# stays LINEAR in n (n·target/2 candidate pairs) instead of quadratic at a
# fixed K. 128 reproduces the former K=16 exactly at the sf0.1 bench table
# (2000 vectors) while the 10x stress probe (20k vectors) gets 157 cells.
_SEM_TARGET_CELL = 128


def _sem_k(n: int) -> int:
    return max(1, (n + _SEM_TARGET_CELL - 1) // _SEM_TARGET_CELL)


def _sem_b(k: int) -> int:
    """Two-level codebook branch factor: ceil(sqrt(K)).

    With K data-driven (K ~ n/128) a FLAT argmax assignment is O(n·K) =
    O(n²/128) — the r7 factor-30 trend probe measured the per-row cost
    RISING (0.26x at 10x -> 0.71x at 30x data). The IMI/two-level fix:
    assign to ceil(K/B) parents first (parent p's centroid = its first
    child's, closed-form), then argmax only over that parent's ≤B
    children — O(n·2√K) total, sublinear growth per row in n. Matches
    IEEE ceil(sqrt) in SQL: sqrt is correctly rounded, exact on perfect
    squares."""
    b = math.isqrt(k)
    return b if b * b == k else b + 1


def _sem_cent(c: int) -> list[int]:
    return [((j + 1) * (2 * c + 3) * 11) % 41 - 20 for j in range(64)]


def _semantic_dedup_oracle() -> str:
    # K is computed FROM THE DATA inside the SQL (same ceil(n/target) as the
    # Spark side); the codebook entry is the same closed form as _sem_cent,
    # with DuckDB's 1-based range(1,65) index i standing in for j+1. The
    # argmax-with-ties-toward-the-GREATEST-cell is len - indexof(reversed,
    # max): list_indexof returns the FIRST (1-based) hit in the reversed
    # list, i.e. the LAST maximal cell in the original order.
    return f"""
WITH kk AS (
  SELECT CAST(greatest(1, (count(*) + {_SEM_TARGET_CELL - 1}) // {_SEM_TARGET_CELL}) AS BIGINT)
           AS k,
         CAST(ceil(sqrt(greatest(1, (count(*) + {_SEM_TARGET_CELL - 1}) // {_SEM_TARGET_CELL})))
           AS BIGINT) AS b
  FROM embeddings
),
qv AS (
  SELECT vec_id, embedding, kk.k, kk.b,
         list_transform(range(1, 65), i -> cast(round(embedding[i] * 1000) AS BIGINT)) AS q
  FROM embeddings, kk
),
pdots AS (
  SELECT vec_id, embedding, k, b, q,
         list_transform(range(0, (k + b - 1) // b), p ->
           cast(list_sum(list_transform(range(1, 65), i ->
             q[i] * ((i * (2 * (p * b) + 3) * 11) % 41 - 20))) AS BIGINT)) AS pds
  FROM qv
),
par AS (
  SELECT vec_id, embedding, k, b, q,
         CAST(len(pds) - list_indexof(list_reverse(pds), list_max(pds)) AS BIGINT) AS parent
  FROM pdots
),
cdots AS (
  SELECT vec_id, embedding, b, parent,
         list_transform(range(parent * b, least(parent * b + b, k)), c ->
           cast(list_sum(list_transform(range(1, 65), i ->
             q[i] * ((i * (2 * c + 3) * 11) % 41 - 20))) AS BIGINT)) AS cds
  FROM par
),
cells AS (
  SELECT vec_id, embedding,
         CAST(parent * b + len(cds) - list_indexof(list_reverse(cds), list_max(cds)) AS INT)
           AS cell
  FROM cdots
),
pairs AS (
  SELECT a.cell,
         cast(list_sum(list_transform(range(1, 65), i ->
             cast(round(a.embedding[i] * 1000) AS BIGINT)
             * cast(round(b.embedding[i] * 1000) AS BIGINT))) AS BIGINT) AS pdot
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT c.cell, count(DISTINCT c.vec_id) AS n_members,
       coalesce(CAST(p.n_near AS BIGINT), 0) AS n_near_pairs
FROM cells c
LEFT JOIN (SELECT cell, count(*) AS n_near FROM pairs WHERE pdot >= 150000
           GROUP BY cell) p
  ON c.cell = p.cell
GROUP BY c.cell, p.n_near ORDER BY c.cell
"""


@query("dedup_semantic_centroid", "2.9 llm-data", _semantic_dedup_oracle(), bench=True)
def dedup_semantic_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-blocked embedding near-dup — the IVF-style SCALE PATH for
    semantic dedup: embeddings first assign to K coarse centroids (exact
    int64 argmax over the closed-form codebook, ties toward the greatest
    cell), and the quadratic pair scan runs ONLY inside each cell —
    candidate pairs drop from O(n^2) to sum(|cell|^2), and cells shard
    across the cluster. K is DATA-DRIVEN since r6: K = ceil(n / 128), so
    the expected cell stays ~128 vectors and the candidate-pair count is
    LINEAR in n (n·64 pairs) at any scale — the r4 10x stress probe
    measured 95s at a fixed K=4 vs seconds with cells held at target size;
    n comes from parquet footer metadata on the driver (no Spark job). Near pair =
    exact int64 dot >= 150000 (~cos 0.15 at 1e-3 quantization). Compare
    dedup_embedding_cosine (label-blocked exact baseline): same pair
    math, blocking key learned from the data instead of a given label.
    Output: per non-empty cell (n_members, n_near_pairs)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType

    from hdc_dataengineering_sqlsync_spark.registry import rowcount

    e = load(spark, sf_dir, "embeddings")
    k = _sem_k(rowcount(sf_dir, "embeddings"))
    q = F.transform("embedding", lambda x: F.round(x.cast("double") * 1000, 0).cast("long"))
    from hdc_dataengineering_sqlsync_spark.operators.dedup import _spread

    # single linear pipeline since r6 (quantize → assign → per-cell census),
    # so no checkpoint: the quantized vector has exactly one consumer (the
    # Arrow batch feeding _assign) and is computed once per row either way;
    # _spread un-pins the scan from a single landing file.
    quantized = _spread(e).select("vec_id", q.alias("q"))
    # Assignment is TWO-LEVEL since r7 (the IMI/hierarchical coarse
    # quantizer): a flat argmax over the data-driven K is O(n·K) =
    # O(n²/128) — the factor-30 trend probe measured per-row cost RISING
    # (0.26x at 10x -> 0.71x at 30x data). Rows assign to ceil(K/B)
    # parents first (parent p's centroid = its first child's, closed-form
    # like every cell), then argmax only over that parent's ≤B=ceil(√K)
    # children — O(n·2√K) int64 matmul work, executed as numpy batch
    # matmuls inside an Arrow pandas UDF (int64 end-to-end, no floats).
    # Ties go to the GREATEST parent/cell (the oracle's >= convention):
    # argmax over the column-REVERSED dot matrix returns the last maximal
    # index of the original order.
    b = _sem_b(k)
    p_count = (k + b - 1) // b
    codebook_np = np.array([_sem_cent(c) for c in range(k)], dtype=np.int64)
    parents_np = np.array([_sem_cent(p * b) for p in range(p_count)], dtype=np.int64)

    def _assign_batch(qs):
        qm = np.array(qs.tolist(), dtype=np.int64)
        pdots = qm @ parents_np.T
        par = (pdots.shape[1] - 1) - np.argmax(pdots[:, ::-1], axis=1)
        out = np.empty(len(qm), dtype=np.int64)
        for p in np.unique(par):
            rows = par == p
            lo, hi = p * b, min(p * b + b, k)
            cdots = qm[rows] @ codebook_np[lo:hi].T
            idx = (cdots.shape[1] - 1) - np.argmax(cdots[:, ::-1], axis=1)
            out[rows] = lo + idx
        return pd.Series(out.astype("int32"))

    # no type hints: the module-wide `from __future__ import annotations`
    # turns them into strings pyspark can't resolve against fn-local imports
    _assign = F.pandas_udf(_assign_batch, IntegerType())

    # Intra-cell pair census via applyInPandas: the pair ROWS never
    # materialize (the r5 self-join shipped |cell|²/2 pairs × two 64-long
    # arrays each through the shuffle and an interpreted HOF dot per pair);
    # each cell group arrives once as one Arrow batch and the pair scan is
    # int64 matmul work in numpy; only (cell, 2 counters) leaves Python.
    # r12 (the factor-100 probe's giant-cell wall): the census first
    # COLLAPSES exact-duplicate vectors (multiplicity-weighted counting —
    # a duplicate clique of m copies contributes C(m,2) self-pairs and
    # multiplies cross-pair counts, all exact), so quadratic work scales
    # with the cell's DISTINCT vectors, not raw members — at real corpus
    # scale exact-dup embeddings are guaranteed (duplicate docs), and the
    # pre-fix single n×n matmul on a 28.9k-member duplicate-heavy cell ran
    # unbounded (probe killed at 25+ min; post-fix the same cell is a 289²
    # matmul). The distinct-pair matmul is additionally TILED so the dots
    # allocation stays bounded regardless of cell width. Residual trade,
    # documented: cost is still quadratic in a cell's distinct members —
    # the closed-form (untrained) codebook is what DuckDB can replay, and
    # it leaves hot cells at data-density peaks; the 100 TB path swaps in
    # a TRAINED coarse quantizer (simsearch_kmeans_train's machinery) whose
    # cells track density, at the cost of a non-SQL-expressible oracle.
    def _cell_stats(pdf):
        qm = np.array(pdf["q"].tolist(), dtype=np.int64)
        uniq, mult = np.unique(qm, axis=0, return_counts=True)
        thr = 150000
        # duplicate-group self-pairs: C(m,2) pairs, each at dot = |v|²
        self_dot = (uniq * uniq).sum(axis=1)
        near = int((mult * (mult - 1) // 2)[self_dot >= thr].sum())
        # cross-group pairs, multiplicity-weighted, tile-bounded
        tile = 4096
        g = len(uniq)
        for i0 in range(0, g, tile):
            a, ma = uniq[i0 : i0 + tile], mult[i0 : i0 + tile]
            for j0 in range(i0, g, tile):
                hit = (a @ uniq[j0 : j0 + tile].T) >= thr
                if j0 == i0:
                    hit = np.triu(hit, k=1)
                near += int((np.outer(ma, mult[j0 : j0 + tile]) * hit).sum())
        return pd.DataFrame(
            {
                "cell": [int(pdf["cell"].iloc[0])],
                "n_members": [int(pdf["vec_id"].nunique())],
                "n_near_pairs": [near],
            }
        )

    return (
        quantized.select("vec_id", "q", _assign("q").alias("cell"))
        # explicit hash partitioning on the group key: AQE would coalesce
        # the tiny cell shuffle to ~3 tasks and serialize the per-cell
        # pandas censuses; an explicit width keeps all cores on the Arrow
        # groups and already satisfies applyInPandas' required
        # distribution, so no second shuffle is inserted. Width = session
        # parallelism (== 32 on local[32]), scaling with the cluster
        # instead of pinning the census at 32 tasks at any size (r11),
        # floored at 8 so a local[1]/local[2] session doesn't funnel the
        # pandas census into 1-2 tasks (r12 ADVICE).
        .repartition(max(8, spark.sparkContext.defaultParallelism), "cell")
        .groupBy("cell")
        .applyInPandas(_cell_stats, "cell int, n_members long, n_near_pairs long")
        .orderBy("cell")
    )


_SCENECUT_ORACLE = """
WITH m AS (SELECT doc_id, 1 + doc_id % 6 AS cut FROM documents WHERE doc_id % 5 = 0),
px AS (
  SELECT m.doc_id, m.cut,
         abs(((13 * m.doc_id + 40 + 3 * xs.x + 5 * ys.y) % 256)
             - ((13 * m.doc_id + 3 * xs.x + 5 * ys.y) % 256)) AS d
  FROM m,
       (SELECT unnest(range(0, 8)) AS x) xs,
       (SELECT unnest(range(0, 8)) AS y) ys
)
SELECT doc_id AS media_id, CAST(8 AS INT) AS n_frames, CAST(1 AS INT) AS n_cuts,
       CAST(cut AS INT) AS first_cut,
       round(sum(d) / 64.0, 4) AS cut_diff
FROM px GROUP BY doc_id, cut ORDER BY media_id
"""


@query("multimodal_video_scenecut", "2.9 llm-data", _SCENECUT_ORACLE)
def multimodal_video_scenecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video columns, end-to-end: each media row synthesizes a REAL binary
    video container (header `VID0|n|w|h` + 8 concatenated 8×8 raw
    grayscale frames; pixels closed-form in doc_id with a scene change at
    frame `1 + doc_id % 6`), and a second Arrow-batched mapInPandas stage
    PARSES THE BYTES back — header, frame stride, reshape — and runs
    vectorized scene-cut detection (mean absolute inter-frame difference
    > 20). The oracle recomputes `(n_frames, n_cuts, first_cut, cut_diff)`
    from the closed form and never sees the bytes, so a container-layout,
    stride, or diff bug mismatches. Same 100 TB shape as the image/audio
    codecs: blobs are born, parsed, and reduced to slim feature rows
    inside one partition — frames never shuffle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    d = load(spark, sf_dir, "documents").where("doc_id % 5 = 0").select("doc_id")
    n_frames, w, h, thresh = 8, 8, 8, 20.0

    def synth(batches):
        for pdf in batches:
            payloads = []
            for m in pdf["doc_id"]:
                m = int(m)
                cut = 1 + m % 6
                y, x = np.mgrid[0:h, 0:w]
                frames = [
                    ((13 * m + 40 * (1 if f >= cut else 0) + 3 * x + 5 * y) % 256).astype(
                        np.uint8
                    )
                    for f in range(n_frames)
                ]
                blob = b"VID0" + bytes([n_frames, w, h]) + b"".join(f.tobytes() for f in frames)
                payloads.append(blob)
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = d.mapInPandas(
        synth,
        schema=T.StructType(
            [T.StructField("media_id", T.LongType()), T.StructField("payload", T.BinaryType())]
        ),
    )

    def detect(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(blob)
                assert blob[:4] == b"VID0", "bad container magic"
                nf, fw, fh = blob[4], blob[5], blob[6]
                frames = np.frombuffer(blob, dtype=np.uint8, offset=7).reshape(nf, fh, fw)
                diffs = np.abs(np.diff(frames.astype(np.int16), axis=0)).mean(axis=(1, 2))
                cuts = np.nonzero(diffs > thresh)[0] + 1  # cut index = first frame of new scene
                rows.append(
                    (
                        int(mid),
                        int(nf),
                        int(len(cuts)),
                        int(cuts[0]) if len(cuts) else None,
                        float(round(float(diffs[cuts[0] - 1]), 4)) if len(cuts) else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "n_cuts", "first_cut", "cut_diff"]
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_cuts", T.IntegerType()),
            T.StructField("first_cut", T.IntegerType()),
            T.StructField("cut_diff", T.DoubleType()),
        ]
    )
    return sort_reduction(media.mapInPandas(detect, schema=out_schema), "media_id")


# --------------------------------------------------------- 2.9 llm-data

_CHUNK_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
),
n AS (
  SELECT doc_id, toks,
         1 + (greatest(len(toks) - 32, 0) + 23) // 24 AS n_chunks
  FROM tok
)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       CAST(len(list_slice(toks, i * 24 + 1, i * 24 + 32)) AS INT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ')) AS chunk_hash
FROM n, unnest(range(0, CAST(n_chunks AS BIGINT))) AS t(i)
ORDER BY doc_id, chunk_id
"""


@query("text_chunk_overlap", "2.9 llm-data", _CHUNK_ORACLE)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 32, stride 24 — 8-token
    overlap): the RAG/embedding prep step that turns documents into
    retrieval passages. Chunk count is pure integer arithmetic
    (``1 + (max(n−32,0)+23) div 24``), each chunk is a map-side array
    slice, and only (doc_id, chunk_id, 16-byte hash) leave the scan — the
    chunk text itself re-derives from the doc row wherever it's needed
    next (the embedding UDF), so nothing wide ever shuffles. Tail chunks
    keep their partial window (every token belongs to ≥1 chunk)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    n_chunks = F.expr("1 + (greatest(size(split(lower(text), '\\\\s+')) - 32, 0) + 23) div 24")
    chunked = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_id"),
    )
    piece = F.slice("toks", F.col("chunk_id") * 24 + 1, 32)
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.size(piece).alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


_PRUNE_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
),
chunks AS (
  SELECT doc_id, i,
         array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ') AS ctext
  FROM tok, unnest(range(0, (len(toks) + 19) // 20)) AS t(i)
),
h AS (SELECT doc_id, i, ctext, md5(ctext) AS phash FROM chunks),
shared AS (SELECT phash FROM h GROUP BY phash HAVING count(DISTINCT doc_id) > 1),
kept AS (SELECT h.doc_id, h.i, h.ctext FROM h LEFT JOIN shared s USING (phash)
         WHERE s.phash IS NULL),
re AS (SELECT doc_id, count(*) AS n_kept,
              md5(string_agg(ctext, ' ' ORDER BY i)) AS clean_hash,
              sum(len(string_split_regex(ctext, '\s+'))) AS n_tokens_kept
       FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, CAST((len(toks) + 19) // 20 AS INT) AS n_chunks FROM tok)
SELECT t.doc_id, t.n_chunks,
       CAST(t.n_chunks - coalesce(re.n_kept, 0) AS INT) AS n_pruned,
       CAST(coalesce(re.n_tokens_kept, 0) AS INT) AS n_tokens_kept,
       coalesce(re.clean_hash, md5('')) AS clean_hash
FROM tot t LEFT JOIN re ON re.doc_id = t.doc_id
ORDER BY t.doc_id
"""


@query("text_boilerplate_prune", "2.9 llm-data", _PRUNE_ORACLE)
def text_boilerplate_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate REMOVAL with reassembly (the C4/RefinedWeb repeated-
    passage prune, completing dedup_passage_exact's detect step): 20-token
    passages appearing in >1 document are cut, survivors rejoin in order
    (tail fragments keep their place), and each doc emits its cleaned-text
    fingerprint + kept-token census. The scale discipline: passage TEXT
    never shuffles — the keyed agg sees only (doc_id, idx, 16-byte hash),
    the per-doc prune list (a few ints) joins back to the doc row, and the
    cleaned text re-derives MAP-SIDE from the original column via
    filter/transform/flatten higher-order functions."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    n_chunks = F.expr("cast((size(split(lower(text), '\\\\s+')) + 19) div 20 as int)")
    hashes = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(F.array_join(F.slice(toks, i * 20 + 1, 20), " ")),
    )
    c = d.select("doc_id", F.posexplode(hashes).alias("i", "phash"))
    shared = (
        c.groupBy("phash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("phash")
    )
    pruned = (
        c.join(shared, "phash")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("i")).alias("pruned_idx"))
    )
    out = d.join(pruned, "doc_id", "left").select(
        "doc_id",
        n_chunks.alias("n_chunks"),
        toks.alias("toks"),
        F.coalesce("pruned_idx", F.array().cast("array<int>")).alias("pruned_idx"),
    )
    kept_idx = F.filter(
        F.sequence(F.lit(0), F.col("n_chunks") - 1),
        lambda i: ~F.array_contains("pruned_idx", i),
    )
    kept_toks = F.flatten(
        F.transform(kept_idx, lambda i: F.slice("toks", i * 20 + 1, 20))
    )
    return out.select(
        "doc_id",
        "n_chunks",
        F.size("pruned_idx").alias("n_pruned"),
        F.size(kept_toks).alias("n_tokens_kept"),
        F.md5(F.array_join(kept_toks, " ")).alias("clean_hash"),
    ).orderBy("doc_id")


# ------------------------------------------- 2.9 two-stage ANN rerank

_RERANK_ORACLE = """
WITH quant AS (
  SELECT vec_id, embedding,
         CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS s
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        FROM embeddings)
),
qset AS (SELECT vec_id AS q_id, embedding AS qe, s AS qs FROM quant WHERE vec_id IN (0, 1, 2)),
s1 AS (
  SELECT q.q_id, e.vec_id, e.embedding, q.qe,
         sum(CAST(floor(CAST(e.embedding[i.range] AS DOUBLE) * e.s + 0.5) AS BIGINT)
             * CAST(floor(CAST(q.qe[i.range] AS DOUBLE) * q.qs + 0.5) AS BIGINT)) AS score1
  FROM quant e CROSS JOIN qset q CROSS JOIN range(1, 65) i
  WHERE e.vec_id <> q.q_id
  GROUP BY q.q_id, e.vec_id, e.embedding, q.qe
),
c50 AS (
  SELECT q_id, vec_id, embedding, qe
  FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score1 DESC, vec_id) AS rn
        FROM s1)
  WHERE rn <= 50
),
exact AS (
  SELECT q_id, vec_id,
         round(sum(CAST(embedding[i.range] AS DOUBLE) * CAST(qe[i.range] AS DOUBLE))
               / (sqrt(sum(CAST(embedding[i.range] AS DOUBLE) * CAST(embedding[i.range] AS DOUBLE)))
                  * sqrt(sum(CAST(qe[i.range] AS DOUBLE) * CAST(qe[i.range] AS DOUBLE)))), 4) AS cos
  FROM c50 CROSS JOIN range(1, 65) i
  GROUP BY q_id, vec_id
)
SELECT q_id, vec_id, cos
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
      FROM exact)
WHERE rn <= 10
ORDER BY q_id, cos DESC, vec_id
"""


@query("simsearch_rerank_two_stage", "2.9 llm-data", _RERANK_ORACLE)
def simsearch_rerank_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval funnel — THE production ANN serving shape:
    stage 1 ranks every candidate by a CHEAP int8×int8 integer dot product
    (per-vector symmetric quantization, 4× smaller and exact int64 — no
    float drift) keeping top-50 per query; stage 2 re-scores only those 50
    with the exact DOUBLE cosine and emits top-10. At 100 TB stage 1's
    scan reads 64 bytes/vector (the int8 codes) and its shuffle carries
    only (q_id, vec_id, score1); stage 2 broadcast-probes the 50·|Q|
    winner ids against the vector column (no shuffle of vectors — in
    production this rejoin is a point lookup into the vector store); both
    top-ks are ranked windows per query, so WindowGroupLimit keeps k rows
    per partition pre-shuffle."""
    from pyspark.sql import Window

    from hdc_dataengineering_sqlsync_spark.functions.vectors import (
        as_double_array,
        cosine_similarity,
    )

    e = load(spark, sf_dir, "embeddings")
    xd = as_double_array("embedding")
    m = F.array_max(F.transform(xd, lambda v: F.abs(v)))
    s = F.when(m > 0, F.lit(127.0) / m).otherwise(F.lit(0.0))
    qv = F.transform(xd, lambda v: F.floor(v * F.col("s") + F.lit(0.5)).cast("long"))
    quant = e.select("vec_id", "embedding", s.alias("s")).select(
        "vec_id", "embedding", qv.alias("qv")
    )
    qset = quant.where(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"), F.col("qv").alias("qq")
    )
    score1 = F.aggregate(
        F.zip_with("qv", "qq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w1 = Window.partitionBy("q_id").orderBy(F.col("score1").desc(), "vec_id")
    # stage-1 shuffles ONLY (q_id, vec_id, score1) — 24 bytes/candidate;
    # the vectors rejoin AFTER the top-50 cut (50 rows/query), so the
    # docstring's 64-bytes-per-vector full-scan claim holds end-to-end
    c50 = (
        quant.crossJoin(F.broadcast(qset.select("q_id", "qq")))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", score1.alias("score1"))
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= 50)
        .select("q_id", "vec_id")
    )
    rejoined = e.select("vec_id", "embedding").join(F.broadcast(c50), "vec_id").join(
        F.broadcast(qset.select("q_id", "qe")), "q_id"
    )
    cos = F.round(cosine_similarity("embedding", "qe"), 4)
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        rejoined.select("q_id", "vec_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= 10)
        .select("q_id", "vec_id", "cos")
        .orderBy("q_id", F.col("cos").desc(), "vec_id")
    )


# ------------------------------------------- 2.9 image patchify (ViT prep)

_TILES_ORACLE = """
WITH m AS (SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h
           FROM documents WHERE doc_id % 5 = 0),
px AS (
  SELECT m.doc_id, m.w, m.h, xs.x // 2 AS px_, ys.y // 2 AS py,
         ((7 * m.doc_id + 3 * xs.x + 5 * ys.y) % 256
          + (11 * m.doc_id + xs.x + 2 * ys.y) % 256
          + (13 * m.doc_id + 2 * xs.x + ys.y) % 256) // 3 AS gray
  FROM m
  JOIN (SELECT unnest(range(0, 24)) AS x) xs ON xs.x < m.w
  JOIN (SELECT unnest(range(0, 14)) AS y) ys ON ys.y < m.h
),
patch AS (
  SELECT doc_id, w, h, px_, py, max(gray) - min(gray) AS contrast
  FROM px GROUP BY doc_id, w, h, px_, py
)
SELECT doc_id AS media_id,
       CAST((w // 2) * (h // 2) AS INT) AS n_patches,
       CAST(sum(contrast) AS BIGINT) AS sum_contrast,
       CAST(sum(CASE WHEN contrast < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat
FROM patch GROUP BY doc_id, w, h ORDER BY media_id
"""


@query("multimodal_image_tiles", "2.9 llm-data", _TILES_ORACLE)
def multimodal_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patchify on the REAL BMP decode path: each synthesized
    image round-trips through actual bytes (encode_bmp → decode_image),
    splits into 2×2 pixel patches, and reports the per-image patch census
    (count, summed patch contrast = max−min of integer gray, flat-patch
    count) — the patch-extraction plumbing a vision-model pipeline runs
    before embedding, with the patch grid computed inside ONE mapInPandas
    stage (blobs never shuffle; only 4 scalars per image leave the
    partition). All-integer statistics, so the closed-form oracle is
    exact — any stride/flip/channel bug in the patch math mismatches."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from hdc_dataengineering_sqlsync_spark.plans.mediacodec import _synth_images

    docs = load(spark, sf_dir, "documents").where("doc_id % 5 = 0")
    media = _synth_images(docs)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_patches", T.IntegerType()),
            T.StructField("sum_contrast", T.LongType()),
            T.StructField("n_flat", T.LongType()),
        ]
    )

    def patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.multimodal import decode_image

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(payload).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                gray = px.sum(axis=2) // 3
                h2, w2 = h // 2, w // 2
                blocks = (
                    gray[: h2 * 2, : w2 * 2]
                    .reshape(h2, 2, w2, 2)
                    .transpose(0, 2, 1, 3)
                    .reshape(h2 * w2, 4)
                )
                contrast = blocks.max(axis=1) - blocks.min(axis=1)
                rows.append(
                    (int(mid), int(h2 * w2), int(contrast.sum()), int((contrast < 8).sum()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return sort_reduction(media.mapInPandas(patchify, schema=schema), "media_id")


# --------------------------------------- 2.9 audio energy segmentation

_AUDIO_SEG_ORACLE = """
WITH m AS (SELECT doc_id, 64 + (doc_id % 7) * 16 AS n FROM documents WHERE doc_id % 5 = 0),
s AS (
  SELECT m.doc_id, i.i // 32 AS frame,
         ((31 * m.doc_id + 17 * i.i) % 65536) - 32768 AS v
  FROM m JOIN (SELECT unnest(range(0, 160)) AS i) i ON i.i < m.n
),
fr AS (
  SELECT doc_id, frame, sum(v * v) AS energy
  FROM s GROUP BY doc_id, frame
),
flag AS (
  SELECT doc_id, frame, CASE WHEN energy > 11000000000 THEN 1 ELSE 0 END AS active
  FROM fr
),
isl AS (
  SELECT doc_id, active,
         frame - row_number() OVER (PARTITION BY doc_id, active ORDER BY frame) AS grp
  FROM flag
),
seg AS (
  SELECT doc_id, count(*) AS seg_len
  FROM isl WHERE active = 1 GROUP BY doc_id, grp
)
SELECT f.doc_id AS media_id,
       CAST(count(*) AS INT) AS n_frames,
       CAST(sum(f.active) AS INT) AS n_active,
       CAST(coalesce((SELECT count(*) FROM seg WHERE seg.doc_id = f.doc_id), 0) AS INT)
         AS n_segments,
       CAST(coalesce((SELECT max(seg_len) FROM seg WHERE seg.doc_id = f.doc_id), 0) AS INT)
         AS longest_segment
FROM flag f GROUP BY f.doc_id ORDER BY media_id
"""


@query("multimodal_audio_segments", "2.9 llm-data", _AUDIO_SEG_ORACLE)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based audio activity segmentation (the VAD shape) on the
    REAL WAV decode path: payloads round-trip through actual RIFF bytes,
    split into 32-sample frames (tail kept), frame energy = Σs² (exact
    int64), frames over the threshold form segments via blob-local
    gaps-and-islands — all inside ONE mapInPandas stage per audio, so the
    1000-executor version never shuffles a sample, only the 4-scalar
    per-media census. The closed-form oracle recomputes frame energies
    and islands relationally without touching the bytes — any PCM width,
    endianness, or framing bug mismatches."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from hdc_dataengineering_sqlsync_spark.plans.mediacodec import _synth_audio

    docs = load(spark, sf_dir, "documents").where("doc_id % 5 = 0")
    media = _synth_audio(docs)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_active", T.IntegerType()),
            T.StructField("n_segments", T.IntegerType()),
            T.StructField("longest_segment", T.IntegerType()),
        ]
    )

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import decode_wav

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, samples = decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                n_frames = (len(s) + 31) // 32
                energies = np.array(
                    [int((s[j * 32 : (j + 1) * 32] ** 2).sum()) for j in range(n_frames)]
                )
                active = energies > 11_000_000_000
                n_active = int(active.sum())
                # blob-local islands: runs of consecutive True
                runs, cur = [], 0
                for a in active:
                    if a:
                        cur += 1
                    elif cur:
                        runs.append(cur)
                        cur = 0
                if cur:
                    runs.append(cur)
                rows.append(
                    (int(mid), n_frames, n_active, len(runs), max(runs) if runs else 0)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return sort_reduction(media.mapInPandas(segment, schema=schema), "media_id")
