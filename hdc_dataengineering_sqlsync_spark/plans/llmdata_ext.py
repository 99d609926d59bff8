"""SURVEY.md §2.9 extensions — the training-data-pipeline operators beyond
the first-wave set: SimHash + shingle-Jaccard + embedding-cosine near-dup,
LSH-bucketed similarity search, text quality / language-ID / token-count /
fingerprint analysis, and the multimodal binary-column pipeline.

Every oracle restates the identical algebra in DuckDB SQL; cross-engine
determinism comes from md5-derived hashing (probed byte-identical), DOUBLE
similarity math, and the §2 rounding conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.operators.dedup import (
    shingle_jaccard_pairs,
    simhash_topk_pairs,
)
from hdc_dataengineering_sqlsync_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from hdc_dataengineering_sqlsync_spark.operators.simsearch import (
    cosine_pairs_topk,
    ivf_search_topk,
    lsh_search_topk,
)
from hdc_dataengineering_sqlsync_spark.operators.text import (
    fingerprint,
    lang_id_heuristic,
    quality_features,
    token_count_bpe_ish,
)
from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ---------------------------------------------------------------- text

_STOPWORD_SQL = "['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','this','that','be','are','was']"

_QUALITY_ORACLE = rf"""
WITH per_doc AS (
  SELECT lang,
         len(string_split_regex(lower(text), '\s+')) AS n_tokens,
         round(length(text) / greatest(len(string_split_regex(lower(text), '\s+')), 1), 4) AS avg_token_len,
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / greatest(length(text), 1), 4) AS punct_ratio,
         round(len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), {_STOPWORD_SQL}))
               / greatest(len(list_distinct(string_split_regex(lower(text), '\s+'))), 1), 4) AS stop_ratio
  FROM documents
)
SELECT lang, count(*) AS n,
       round(avg(n_tokens), 2) AS avg_tokens,
       round(avg(avg_token_len), 4) AS avg_tok_len,
       round(avg(punct_ratio), 4) AS avg_punct,
       round(avg(stop_ratio), 4) AS avg_stop
FROM per_doc GROUP BY lang ORDER BY lang
"""


@query("text_quality_score", "2.9 llm-data", _QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus quality profile from per-doc map-side signals
    (operators/text.py::quality_features) — the filter stage of a training-
    data pipeline. No shuffle until the final per-lang rollup."""
    d = quality_features(load(spark, sf_dir, "documents"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.round(F.avg("avg_token_len"), 4).alias("avg_tok_len"),
            F.round(F.avg("punct_ratio"), 4).alias("avg_punct"),
            F.round(F.avg("stopword_distinct_ratio"), 4).alias("avg_stop"),
        )
        .orderBy("lang")
    )


_LANGID_ORACLE = r"""
WITH scored AS (
  SELECT lang,
         len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), ['the','and','of'])) AS h_en,
         len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), ['der','die','und'])) AS h_de,
         len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), ['el','los','que'])) AS h_es,
         len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), ['le','les','des'])) AS h_fr
  FROM documents
),
guessed AS (
  SELECT lang,
         CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
              WHEN h_fr = greatest(h_en, h_de, h_es, h_fr) THEN 'fr'
              WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
              WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
              ELSE 'de' END AS lang_guess
  FROM scored
)
SELECT lang, lang_guess, count(*) AS n
FROM guessed GROUP BY lang, lang_guess ORDER BY lang, lang_guess
"""


@query("text_lang_id", "2.9 llm-data", _LANGID_ORACLE)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion counts: true lang x marker-word heuristic guess
    (operators/text.py::lang_id_heuristic; ties resolved toward the
    lexicographically greatest language on both sides)."""
    d = lang_id_heuristic(load(spark, sf_dir, "documents"))
    return (
        d.groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_guess")
    )


_TOKCOUNT_ORACLE = r"""
SELECT lang,
       CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_ws,
       CAST(sum(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1))) AS BIGINT) AS total_bpe,
       round(avg(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1))), 2) AS avg_bpe
FROM documents GROUP BY lang ORDER BY lang
"""


@query("text_token_count", "2.9 llm-data", _TOKCOUNT_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish (pretokenizer regex) token counts per language
    (operators/text.py::token_count_bpe_ish) — the cost-estimation stage for
    token budgeting at corpus scale."""
    d = token_count_bpe_ish(load(spark, sf_dir, "documents"))
    return (
        d.groupBy("lang")
        .agg(
            F.sum("n_tokens_ws").alias("total_ws"),
            F.sum("n_tokens_bpe").alias("total_bpe"),
            F.round(F.avg("n_tokens_bpe"), 2).alias("avg_bpe"),
        )
        .orderBy("lang")
    )


_FINGERPRINT_ORACLE = r"""
SELECT lang, count(*) AS n,
       count(DISTINCT md5(array_to_string(string_split_regex(lower(text), '\s+'), ' '))) AS n_fp
FROM documents GROUP BY lang ORDER BY lang
"""


@query("text_fingerprint", "2.9 llm-data", _FINGERPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-token-stream document fingerprints, distinct-counted per
    language (operators/text.py::fingerprint, md5 form; the xxhash64 form is
    the faster JVM-only scale path)."""
    d = fingerprint(load(spark, sf_dir, "documents"), algo="md5")
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("fingerprint").alias("n_fp"))
        .orderBy("lang")
    )


_CLEAN_ORACLE = r"""
WITH c AS (
  SELECT lang,
         length(text) AS raw_len,
         length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                    '\s+', ' ', 'g'))) AS clean_len
  FROM documents
)
SELECT lang, count(*) AS n,
       CAST(sum(raw_len) AS BIGINT) AS raw_chars,
       CAST(sum(clean_len) AS BIGINT) AS clean_chars,
       round(avg(raw_len - clean_len), 2) AS avg_removed
FROM c GROUP BY lang ORDER BY lang
"""


@query("text_clean_normalize", "2.9 llm-data", _CLEAN_ORACLE)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization pass of a training-data pipeline: lowercase, strip
    non-alphanumerics, collapse whitespace — per-lang before/after char
    accounting. Pure map-side builtin regexps until the final rollup."""
    t = F.lower(F.col("text"))
    clean = F.trim(F.regexp_replace(F.regexp_replace(t, r"[^a-z0-9\s]", ""), r"\s+", " "))
    d = load(spark, sf_dir, "documents").select(
        "lang", F.length("text").alias("raw_len"), F.length(clean).alias("clean_len")
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("raw_len").alias("raw_chars"),
            F.sum("clean_len").alias("clean_chars"),
            F.round(F.avg(F.col("raw_len") - F.col("clean_len")), 2).alias("avg_removed"),
        )
        .orderBy("lang")
    )


_NGRAM_ORACLE = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT array_to_string(t[CAST(i.i AS INT):CAST(i.i + 1 AS INT)], ' ') AS bigram
  FROM toks, unnest(range(1, len(t))) AS i(i)
)
SELECT bigram, count(*) AS cnt
FROM bg GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20
"""


@query("text_ngram_stats", "2.9 llm-data", _NGRAM_ORACLE)
def text_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies, top-20 — n-gram LM data prep
    (operators/dedup.py::word_shingles with k=2, counted with multiplicity).
    Same explode -> groupBy shape as wordcount; shuffles on the bigram key."""
    from hdc_dataengineering_sqlsync_spark.operators.dedup import word_shingles

    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(word_shingles(F.col("text"), k=2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


# ---------------------------------------------------------------- dedup

_SIMHASH_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
),
votes AS (
  SELECT doc_id, lang, b.range AS bitpos,
         (CAST(floor((strpos('0123456789abcdef', substr(md5(token), CAST(b.range // 4 AS INT) + 1, 1)) - 1)
                     / power(2, b.range % 4)) AS INT) % 2) * 2 - 1 AS vote
  FROM tok CROSS JOIN range(0, 16) b
),
per_bit AS (
  SELECT doc_id, lang, bitpos, sum(vote) AS v FROM votes GROUP BY doc_id, lang, bitpos
),
sig AS (
  SELECT doc_id, lang,
         CAST(sum(CASE WHEN v >= 0 THEN CAST(power(2, bitpos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM per_bit GROUP BY doc_id, lang
)
SELECT a.doc_id AS doc_id, b.doc_id AS doc_id2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.lang = b.lang AND a.doc_id < b.doc_id
ORDER BY hamming, doc_id, doc_id2 LIMIT 20
"""


@query("dedup_simhash", "2.9 llm-data", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup scan: 16-bit md5-nibble signatures, top-20 closest
    pairs by Hamming distance inside lang blocks
    (operators/dedup.py::simhash16 / simhash_topk_pairs)."""
    return simhash_topk_pairs(load(spark, sf_dir, "documents"), k=20)


_SHINGLE_ORACLE = """
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, lang,
         array_to_string(t[CAST(i.i AS INT):CAST(i.i + 2 AS INT)], ' ') AS shingle
  FROM toks, unnest(range(1, len(t) - 1)) AS i(i)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a AS doc_id, id_b AS doc_id2,
       round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) >= 0.1
"""


@query("dedup_shingle_jaccard", "2.9 llm-data", _SHINGLE_ORACLE)
def dedup_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-word-shingle (n-gram) Jaccard near-dup pairs >= 0.1, blocked by lang
    (operators/dedup.py::shingle_jaccard_pairs) — word-order-sensitive
    near-dup, the exact-verify stage behind MinHash-LSH."""
    return shingle_jaccard_pairs(load(spark, sf_dir, "documents"), k_shingle=3, threshold=0.1)


_EMB_COSINE_ORACLE = """
WITH comp AS (
  SELECT label, vec_id, i.range AS pos, CAST(embedding[i.range] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, 65) i
),
norms AS (SELECT label, vec_id, sum(x * x) AS n2 FROM comp GROUP BY label, vec_id),
dots AS (
  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
  FROM comp a JOIN comp b ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY a.label, a.vec_id, b.vec_id
)
SELECT d.label AS label, id_a AS vec_id, id_b AS vec_id2,
       round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS cos
FROM dots d
JOIN norms na ON na.label = d.label AND na.vec_id = id_a
JOIN norms nb ON nb.label = d.label AND nb.vec_id = id_b
ORDER BY cos DESC, vec_id, vec_id2 LIMIT 10
"""


@query("dedup_embedding_cosine", "2.9 llm-data", _EMB_COSINE_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup: top-10 most-similar vector pairs by cosine,
    blocked by label (operators/simsearch.py::cosine_pairs_topk). Pairwise
    work stays inside coarse cells — cost tracks cell size, not corpus^2."""
    return cosine_pairs_topk(load(spark, sf_dir, "embeddings"), k=10)


_CMS_ORACLE = r"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token FROM documents
),
h AS (
  SELECT token, r.range AS r,
         substr(md5(CAST(r.range AS VARCHAR) || ':' || token), 1, 4) AS hx
  FROM tok CROSS JOIN range(0, 4) r
),
b AS (
  SELECT token, r,
         ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 64 AS bucket
  FROM h
),
sketch AS (SELECT r, bucket, count(*) AS cnt FROM b GROUP BY r, bucket),
true_top AS (
  SELECT token, count(*) AS cnt FROM tok GROUP BY token ORDER BY cnt DESC, token LIMIT 20
),
qb AS (SELECT DISTINCT token, r, bucket FROM b WHERE token IN (SELECT token FROM true_top)),
est AS (
  SELECT qb.token, min(s.cnt) AS est
  FROM qb JOIN sketch s ON s.r = qb.r AND s.bucket = qb.bucket
  GROUP BY qb.token
)
SELECT t.token AS token, CAST(t.cnt AS BIGINT) AS true_cnt, CAST(e.est AS BIGINT) AS est_cnt
FROM true_top t JOIN est e ON t.token = e.token
ORDER BY true_cnt DESC, t.token
"""


@query("sketch_cms_wordfreq", "2.9 llm-data", _CMS_ORACLE)
def sketch_cms_wordfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the top-20 corpus tokens,
    next to true counts (operators/sketches.py). The 4x64 counter table is
    corpus-size-independent and broadcastable; estimates only overcount
    (CMS guarantee, unit-tested). md5-derived buckets reproduce exactly in
    the oracle."""
    from hdc_dataengineering_sqlsync_spark.operators.sketches import cms_build, cms_estimate
    from hdc_dataengineering_sqlsync_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    sketch = cms_build(tok, "token", d=4, w=64)
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "token")
        .limit(20)
    )
    est = cms_estimate(sketch, top.select("token"), "token", d=4, w=64)
    return (
        top.join(est, "token")
        .select("token", "true_cnt", F.col("est").alias("est_cnt"))
        .orderBy(F.col("true_cnt").desc(), "token")
    )


# ---------------------------------------------------------------- simsearch

_LSH_ORACLE = """
WITH planes AS (
  SELECT p.range AS plane, i.range AS pos,
         CASE WHEN (strpos('0123456789abcdef',
                    substr(md5('p:' || CAST(p.range AS VARCHAR) || ':' || CAST(i.range AS VARCHAR)), 1, 1)) - 1) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS w
  FROM range(0, 4) p CROSS JOIN range(0, 64) i
),
proj AS (
  SELECT e.vec_id, pl.plane, sum(CAST(e.embedding[pl.pos + 1] AS DOUBLE) * pl.w) AS s
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.plane
),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN s >= 0 THEN CAST(power(2, plane) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
),
qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT b.vec_id FROM buckets b JOIN qb ON b.bucket = qb.bucket WHERE b.vec_id <> 0
),
comp AS (
  SELECT e.vec_id,
         sum(CAST(e.embedding[i.range] AS DOUBLE) * CAST(q.qe[i.range] AS DOUBLE)) AS dot,
         sum(CAST(e.embedding[i.range] AS DOUBLE) * CAST(e.embedding[i.range] AS DOUBLE)) AS na2,
         sum(CAST(q.qe[i.range] AS DOUBLE) * CAST(q.qe[i.range] AS DOUBLE)) AS nb2
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q CROSS JOIN range(1, 65) i
  GROUP BY e.vec_id
)
SELECT vec_id, round(dot / (sqrt(na2) * sqrt(nb2)), 4) AS cos
FROM comp ORDER BY cos DESC, vec_id LIMIT 5
"""


@query("simsearch_lsh_bucketed", "2.9 llm-data", _LSH_ORACLE)
def simsearch_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 cosine search for vec_id 0: md5-derived
    random-hyperplane buckets prune candidates before exact re-scoring
    (operators/simsearch.py::lsh_search_topk). At scale the scan cost drops
    ~2^n_planes vs brute force while the re-score stays exact."""
    return lsh_search_topk(load(spark, sf_dir, "embeddings"), query_vec_id=0, k=5, n_planes=4)


@query("simsearch_ivf", "2.9 llm-data", None)  # rows-only: centroid set engine-specific
def simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 cosine search for vec_id 0: seeded KMeans coarse
    cells, probe the 2 nearest cells, exact re-score the slice
    (operators/simsearch.py::ivf_search_topk). Recall vs brute force is
    unit-tested; rows-only in t2 like MinHash-LSH."""
    return ivf_search_topk(load(spark, sf_dir, "embeddings"), query_vec_id=0, k=5)


# Probes = corpus vocabulary plus its reversed forms: reversed words are
# mostly non-members, so the query exercises both the no-false-negative
# guarantee (positives >= members) and real false positives (m=128 is sized
# small enough that some reversed tokens collide into all-set bits).
_BLOOM_ORACLE = """
WITH en AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents WHERE lang = 'en'),
allv AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents),
probes AS (SELECT token FROM allv UNION SELECT reverse(token) FROM allv),
bits AS (
  SELECT DISTINCT CAST('0x' || substr(md5(CAST(j.range AS VARCHAR) || ':' || token), 1, 4) AS BIGINT) % 128 AS bit
  FROM en CROSS JOIN range(0, 4) j
),
pb AS (
  SELECT token, CAST('0x' || substr(md5(CAST(j.range AS VARCHAR) || ':' || token), 1, 4) AS BIGINT) % 128 AS bit
  FROM probes CROSS JOIN range(0, 4) j
),
pos AS (SELECT token FROM pb JOIN bits USING (bit) GROUP BY token HAVING count(*) = 4)
SELECT (SELECT count(*) FROM probes) AS n_probed,
       (SELECT count(*) FROM probes WHERE token IN (SELECT token FROM en)) AS n_member,
       (SELECT count(*) FROM pos) AS n_bloom_positive
"""


@query("sketch_bloom_membership", "2.9 llm-data", _BLOOM_ORACLE)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch (operators/sketches.py::bloom_build/
    bloom_probe): filter built over the distinct 'en' vocabulary (k=4 hashes,
    m=128 bits — at most 128 rows, broadcastable), probed with the corpus
    vocabulary plus its reversed forms (mostly non-members). Output: probes,
    true members, Bloom positives — positives >= members always (no false
    negatives, unit-tested); the surplus is the false positives."""
    from hdc_dataengineering_sqlsync_spark.operators.sketches import bloom_build, bloom_probe

    d = load(spark, sf_dir, "documents")
    # vocab feeds both probe branches and en feeds the filter build AND the
    # membership mark; both are vocabulary-grain (Zipf-small) — checkpoint
    # so the corpus explode runs once per set (r10 plan audit: 6 fact scans
    # in one plan without this).
    vocab = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    en = (
        d.where(F.col("lang") == "en")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    probes = vocab.union(vocab.select(F.reverse("token").alias("token"))).distinct()
    probed = bloom_probe(bloom_build(en, "token", k=4, m=128), probes, "token", k=4, m=128)
    marked = probed.join(en.withColumn("_m", F.lit(1)), "token", "left")
    return marked.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.when(F.col("_m").isNotNull(), 1).otherwise(0)).cast("long").alias("n_member"),
        F.sum(F.when(F.col("bloom_positive"), 1).otherwise(0)).cast("long").alias("n_bloom_positive"),
    )


# ---------------------------------------------------------------- sampling

_SAMPLE_RATES = {"en": 0.5, "de": 0.25, "es": 0.1, "fr": 0.1, "zh": 0.1}

_STRAT_SAMPLE_ORACLE = f"""
WITH u AS (
  SELECT lang,
         CAST('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) / 268435456.0 AS u,
         CASE lang {" ".join(f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in sorted(_SAMPLE_RATES.items()))} ELSE CAST(0.0 AS DOUBLE) END AS rate
  FROM documents
)
SELECT lang, count(*) AS n_total,
       CAST(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       round(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS frac
FROM u GROUP BY lang ORDER BY lang
"""


@query("sample_hash_stratified", "2.9 llm-data", _STRAT_SAMPLE_ORACLE)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable stratified corpus sampling (operators/sampling.py): keep rate
    per language from a literal CASE chain over an md5-derived uniform —
    deterministic under re-partitioning/retries, unlike df.sample. Output:
    per-lang total vs sampled counts and achieved fraction."""
    from hdc_dataengineering_sqlsync_spark.operators.sampling import stratified_hash_sample

    d = load(spark, sf_dir, "documents")
    sampled = (
        stratified_hash_sample(d, "doc_id", "lang", _SAMPLE_RATES)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        totals.join(sampled, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.round(
                F.coalesce("n_sampled", F.lit(0)) / F.col("n_total").cast("double"), 4
            ).alias("frac"),
        )
        .orderBy("lang")
    )


_BOTTOMK_ORACLE = """
SELECT doc_id, lang FROM documents
ORDER BY md5('s:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 50
"""


@query("sample_hash_bottomk", "2.9 llm-data", _BOTTOMK_ORACLE)
def sample_hash_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size consistent sample: the 50 docs with the smallest salted
    md5 hashes (operators/sampling.py::bottom_k_sample). A bottom-k sketch —
    the sample evolves minimally as the corpus grows, and plans as
    TakeOrderedAndProject (per-partition top-k, no global sort)."""
    from hdc_dataengineering_sqlsync_spark.operators.sampling import bottom_k_sample

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return bottom_k_sample(d, "doc_id", k=50)


# ---------------------------------------------------------------- multimodal

_MM_EXTRACT_ORACLE = """
SELECT doc_id AS media_id, CAST(strlen(text) AS INT) AS n_bytes
FROM documents ORDER BY media_id LIMIT 100
"""


@query("multimodal_extract", "2.9 llm-data", _MM_EXTRACT_ORACLE)
def multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas
    (operators/multimodal.py): documents -> fake encoded payloads -> per-blob
    byte stats. Declares the payload-size column (oracle = UTF-8 byte length);
    checksum/feature vectors are unit-tested (not SQL-expressible)."""
    media = synthesize_media(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes").orderBy("media_id").limit(100)


_MM_FRAMES_ORACLE = """
SELECT CAST(count(*) * 10 AS BIGINT) AS n_frames, count(*) AS n_media
FROM documents WHERE doc_id % 3 = 2
"""


@query("multimodal_frame_sample", "2.9 llm-data", _MM_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan fan-out (operators/multimodal.py::
    frame_sample_plan): every video-kind media row (doc_id % 3 = 2 in the
    synthesized table) emits its frame-index schedule for a downstream
    decoder; validates the typed-metadata filter + 1->N plumbing counts."""
    media = synthesize_media(load(spark, sf_dir, "documents"))
    frames = frame_sample_plan(media, every_n=10, video_only=True)
    return frames.agg(
        F.count(F.lit(1)).alias("n_frames"), F.countDistinct("media_id").alias("n_media")
    )


_CONTAM_ORACLE = """
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, lang,
              array_to_string(t[CAST(i.i AS INT):CAST(i.i + 4 AS INT)], ' ') AS shingle
       FROM toks, unnest(range(1, len(t) - 3)) AS i(i)),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
hits AS (
  SELECT s.doc_id, s.lang, count(*) AS n_overlap
  FROM sh s JOIN ev ON s.shingle = ev.shingle
  WHERE s.doc_id % 10 <> 0
  GROUP BY s.doc_id, s.lang
),
contam AS (SELECT doc_id, lang FROM hits WHERE n_overlap >= 3)
SELECT d.lang, count(*) AS n_train,
       CAST(count(c.doc_id) AS BIGINT) AS n_contaminated,
       round(count(c.doc_id) / CAST(count(*) AS DOUBLE), 4) AS frac
FROM documents d LEFT JOIN contam c ON d.doc_id = c.doc_id
WHERE d.doc_id % 10 <> 0
GROUP BY d.lang ORDER BY d.lang
"""


@query("dedup_contamination", "2.9 llm-data", _CONTAM_ORACLE)
def dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check — the decontamination step of a
    training-data pipeline: docs with doc_id % 10 = 0 act as the eval set;
    a train doc is contaminated when it shares >= 3 distinct 5-gram shingles
    with the eval pool. The eval shingle pool is small and broadcastable; the
    train side is one explode + one semi-shaped join, so cost scales with
    the train corpus, not train x eval. Per-lang counts + contamination
    fraction."""
    from hdc_dataengineering_sqlsync_spark.operators.dedup import word_shingles

    d = load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(word_shingles(F.col("text"), k=5))).alias("shingle"),
    )
    ev = sh.where(F.col("doc_id") % 10 == 0).select("shingle").distinct()
    hits = (
        sh.where(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= 3)
    )
    train = d.where(F.col("doc_id") % 10 != 0)
    return (
        train.join(hits.select("doc_id", F.lit(1).alias("_c")), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("_c").alias("n_contaminated"),
            F.round(F.count("_c") / F.count(F.lit(1)).cast("double"), 4).alias("frac"),
        )
        .orderBy("lang")
    )


# Quantization rounding is floor(x + 0.5) — "half toward +inf" — rather than
# round(): both engines floor identically, while round() half-even/half-away
# conventions could differ at exact .5 boundaries.
_QUANT_ORACLE = """
WITH comp AS (
  SELECT label, vec_id, i.range AS pos, CAST(embedding[i.range] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, 65) i
),
mx AS (SELECT vec_id, max(abs(x)) AS m FROM comp GROUP BY vec_id),
err AS (
  SELECT c.label, c.vec_id,
         abs(c.x - floor(c.x * (127.0 / mx.m) + 0.5) * mx.m / 127.0) AS e
  FROM comp c JOIN mx ON c.vec_id = mx.vec_id
  WHERE mx.m > 0
)
SELECT label, count(*) AS n_components,
       round(avg(e), 6) AS avg_abs_err, round(max(e), 6) AS max_abs_err
FROM err GROUP BY label ORDER BY label
"""


@query("simsearch_quantize_int8", "2.9 llm-data", _QUANT_ORACLE)
def simsearch_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (per-vector scale = 127/max|x|)
    with dequantization-error profile per label — the compression step an
    ANN index applies before storing 100 TB of vectors (4x smaller, dot
    products in int arithmetic). All math map-side via higher-order array
    functions; rounding is floor(x+0.5) so both engines agree at exact .5
    boundaries."""
    e = load(spark, sf_dir, "embeddings")
    x = F.transform("embedding", lambda v: v.cast("double"))
    mx = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = F.lit(127.0) / F.col("_m")
    err = F.transform(
        "_x", lambda v: F.abs(v - F.floor(v * scale + F.lit(0.5)) * F.col("_m") / F.lit(127.0))
    )
    per_vec = (
        e.select("label", "vec_id", x.alias("_x"), mx.alias("_m"))
        .where(F.col("_m") > 0)
        .select("label", "vec_id", F.explode(err).alias("e"))
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.round(F.avg("e"), 6).alias("avg_abs_err"),
            F.round(F.max("e"), 6).alias("max_abs_err"),
        )
        .orderBy("label")
    )


_REPETITION_ORACLE = r"""
WITH r AS (
  SELECT lang,
         1.0 - len(list_distinct(string_split_regex(lower(text), '\s+')))
             / len(string_split_regex(lower(text), '\s+')) AS rep
  FROM documents
)
SELECT lang,
       round(avg(rep), 4) AS avg_rep,
       round(max(rep), 4) AS max_rep,
       CAST(count(CASE WHEN rep > 0.5 THEN 1 END) AS BIGINT) AS n_repetitive
FROM r GROUP BY lang ORDER BY lang
"""


@query("text_repetition_ratio", "2.9 llm-data", _REPETITION_ORACLE)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-repetition quality signal: 1 - |distinct tokens| / |tokens| per
    document (the dominant cheap filter for boilerplate/spam in pretraining
    corpora), aggregated per language with a >0.5 repetitive-doc count. The
    per-row ratio is an exact int/int IEEE division, identical across
    engines, so the 0.5 threshold cannot flap; narrow projection (lang,
    text) reaches the scan. Scale path: pure JVM string/array ops, no
    shuffle besides the final per-lang aggregate."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), r"\s+")
    rep = 1.0 - F.size(F.array_distinct(words)) / F.size(words)
    return (
        d.select("lang", rep.alias("rep"))
        .groupBy("lang")
        .agg(
            F.round(F.avg("rep"), 4).alias("avg_rep"),
            F.round(F.max("rep"), 4).alias("max_rep"),
            F.count(F.when(F.col("rep") > 0.5, 1)).alias("n_repetitive"),
        )
        .orderBy("lang")
    )


_CENTROIDS = [[-20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15, 2, 19, -5, 12, -12, 5, -19, -2, 15, -9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15], [11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15, 2, 19, -5, 12, -12, 5, -19, -2, 15, -9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16], [1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15, 2, 19, -5, 12, -12, 5, -19, -2, 15, -9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6], [-9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15, 2, 19, -5, 12, -12, 5, -19, -2, 15, -9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4]]

_CENTROID_ASSIGN_ORACLE = """
WITH dots AS (
  SELECT vec_id,
         cast(list_sum(list_transform(range(1, 65), i -> cast(round(embedding[i] * 1000) AS BIGINT) * ([-20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15, 2, 19, -5, 12, -12, 5, -19, -2, 15, -9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15])[i])) AS BIGINT) AS d0,
         cast(list_sum(list_transform(range(1, 65), i -> cast(round(embedding[i] * 1000) AS BIGINT) * ([11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15, 2, 19, -5, 12, -12, 5, -19, -2, 15, -9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16])[i])) AS BIGINT) AS d1,
         cast(list_sum(list_transform(range(1, 65), i -> cast(round(embedding[i] * 1000) AS BIGINT) * ([1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15, 2, 19, -5, 12, -12, 5, -19, -2, 15, -9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6])[i])) AS BIGINT) AS d2,
         cast(list_sum(list_transform(range(1, 65), i -> cast(round(embedding[i] * 1000) AS BIGINT) * ([-9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4, 13, -11, 6, -18, -1, 16, -8, 9, -15, 2, 19, -5, 12, -12, 5, -19, -2, 15, -9, 8, -16, 1, 18, -6, 11, -13, 4, -20, -3, 14, -10, 7, -17, 0, 17, -7, 10, -14, 3, 20, -4])[i])) AS BIGINT) AS d3
  FROM embeddings
),
long AS (
  SELECT vec_id, u.c AS c, u.d AS d
  FROM dots, unnest([struct_pack(d := d0, c := 0), struct_pack(d := d1, c := 1), struct_pack(d := d2, c := 2), struct_pack(d := d3, c := 3)]) AS t(u)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, c DESC) AS rn
  FROM long
)
SELECT c AS centroid, count(*) AS n,
       round(cast(sum(d) AS DOUBLE) / count(*) / 1e6, 4) AS avg_sim
FROM ranked WHERE rn = 1 GROUP BY c ORDER BY centroid
"""


@query("simsearch_centroid_assign", "2.9 llm-data", _CENTROID_ASSIGN_ORACLE)
def simsearch_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means assignment step (the building block under IVF indexing):
    every embedding goes to the argmax-dot-product of K pinned centroids.
    Determinism by construction: embeddings quantize to integer 1e-3 units
    and the centroids are integers, so each dot product is an exact int64 —
    associative, order-free, bit-identical across engines and cluster sizes
    (the float path's summation order is not) — and the argmax breaks ties
    toward the greatest centroid id via (dot, cid) struct ordering.
    Map-side only until the final tiny groupBy on K keys; the centroid
    arrays ride the plan as literals (at real scale: a broadcast)."""
    e = load(spark, sf_dir, "embeddings")
    dots = [
        F.aggregate(
            F.zip_with(
                "embedding",
                F.array(*[F.lit(v) for v in c]),
                lambda x, y: F.round(x.cast("double") * 1000, 0).cast("long") * y.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"d{k}")
        for k, c in enumerate(_CENTROIDS)
    ]
    best = F.greatest(
        *[F.struct(F.col(f"d{k}").alias("d"), F.lit(k).alias("c")) for k in range(len(_CENTROIDS))]
    ).alias("best")
    return (
        e.select("vec_id", *dots)
        .select("vec_id", best)
        .groupBy(F.col("best.c").alias("centroid"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("best.d").cast("double") / F.count(F.lit(1)) / 1e6, 4).alias("avg_sim"),
        )
        .orderBy("centroid")
    )


# ------------------------------------------------- corpus scoring & packing

_UNIGRAM_LP_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
),
freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
total AS (SELECT count(*) AS total FROM tok),
per_doc AS (
  SELECT t.doc_id, t.lang,
         avg(-ln(f.cnt / CAST(total.total AS DOUBLE))) AS nll
  FROM tok t JOIN freq f ON t.token = f.token CROSS JOIN total
  GROUP BY t.doc_id, t.lang
)
SELECT lang, count(*) AS n_docs,
       round(avg(nll), 4) AS avg_nll,
       round(min(nll), 4) AS min_nll,
       round(max(nll), 4) AS max_nll
FROM per_doc GROUP BY lang ORDER BY lang
"""


@query("text_unigram_logprob", "2.9 llm-data", _UNIGRAM_LP_ORACLE, bench=True)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: per-doc mean negative log corpus
    unigram probability — the cheap statistical stand-in for an LM quality
    filter (docs of rare tokens score high, boilerplate scores low).

    Shape: one explode -> token-keyed count (map-side partial agg) -> token
    join back (the frequency table is Zipf-small -> AQE broadcasts it) ->
    per-doc mean -> per-lang rollup. Corpus total rides as a broadcast 1-row
    aggregate, the same pattern as text_tfidf_top_terms. No UDFs.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    nll = -F.log(F.col("cnt") / F.col("total").cast("double"))
    per_doc = (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(F.avg(nll).alias("nll"))
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
            F.round(F.min("nll"), 4).alias("min_nll"),
            F.round(F.max("nll"), 4).alias("max_nll"),
        )
        .orderBy("lang")
    )


_PACK_ORACLE = r"""
WITH d AS (
  SELECT doc_id, lang, len(string_split_regex(text, '\s+')) AS n_tok
  FROM documents
),
packed AS (
  SELECT lang, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT) AS shard
  FROM d
),
shards AS (
  SELECT lang, shard, count(*) AS n_docs, sum(n_tok) AS shard_tokens
  FROM packed GROUP BY lang, shard
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_shards,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(max(shard_tokens) AS BIGINT) AS max_shard_tokens,
       round(avg(shard_tokens), 2) AS avg_shard_tokens
FROM shards GROUP BY lang ORDER BY lang
"""


@query("pack_token_budget", "2.9 llm-data", _PACK_ORACLE)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: assign documents (per lang, doc_id order)
    to contiguous training shards of ~2048 tokens via an exclusive running
    token count — the deterministic sharding step before sequence packing in
    a training-data pipeline. Exact integer math on both sides, so the
    shard assignment cannot drift between engines.

    Scale shape: one window pass keyed by the pack group (lang) — the same
    partitioning a writer would use — then two keyed rollups. At 100 TB the
    pack group is (lang, date-bucket) so no single window partition grows
    unbounded; semantics are identical.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang", F.size(F.split("text", r"\s+")).alias("n_tok")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    packed = d.select(
        "lang",
        "n_tok",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / 2048.0).alias("shard"),
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
            F.round(F.avg("shard_tokens"), 2).alias("avg_shard_tokens"),
        )
        .orderBy("lang")
    )


_CONTAINMENT_ORACLE = """
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, lang,
         array_to_string(t[CAST(i.i AS INT):CAST(i.i + 2 AS INT)], ' ') AS shingle
  FROM toks, unnest(range(1, len(t) - 1)) AS i(i)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a AS doc_id, id_b AS doc_id2,
       round(CAST(i AS DOUBLE) / least(sa.sz, sb.sz), 4) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(CAST(i AS DOUBLE) / least(sa.sz, sb.sz), 4) >= 0.5
ORDER BY containment DESC, doc_id, doc_id2 LIMIT 20
"""


@query("dedup_containment", "2.9 llm-data", _CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: Broder CONTAINMENT |A∩B| / min(|A|,|B|) over
    3-word shingles, blocked by lang — catches quote inclusion and
    doc-inside-doc duplication that symmetric Jaccard underweights (a short
    doc fully quoted inside a long one has low Jaccard but containment 1.0).
    Same explode -> (lang, shingle) equi-join -> keyed counts shape as
    shingle-Jaccard: pair cost tracks shared shingles, never corpus^2."""
    from hdc_dataengineering_sqlsync_spark.operators.dedup import word_shingles

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(word_shingles(F.col("text"), k=3))).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("lang"), F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(
        F.col("lang").alias("_lang"), F.col("doc_id").alias("id_b"), F.col("shingle").alias("_sh")
    )
    inter = (
        a.join(b, (a.lang == b._lang) & (a.shingle == b._sh) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    cont = F.round(F.col("i") / F.least("sz_a", "sz_b").cast("double"), 4)
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias("doc_id"), F.col("id_b").alias("doc_id2"), cont.alias("containment")
        )
        .where(F.col("containment") >= 0.5)
        .orderBy(F.col("containment").desc(), "doc_id", "doc_id2")
        .limit(20)
    )


_QFILTER_ORACLE = r"""
WITH feat AS (
  SELECT doc_id, lang,
         len(string_split_regex(text, '\s+')) AS n_tok,
         1.0 - len(list_distinct(string_split_regex(text, '\s+')))
             / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS rep
  FROM documents
),
thresholds AS (
  SELECT lang, avg(n_tok) AS tok_avg, avg(rep) AS rep_avg FROM feat GROUP BY lang
)
SELECT f.lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN f.n_tok >= t.tok_avg AND f.rep <= t.rep_avg
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(sum(CASE WHEN f.n_tok >= t.tok_avg AND f.rep <= t.rep_avg
                      THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS keep_frac
FROM feat f JOIN thresholds t ON f.lang = t.lang
GROUP BY f.lang ORDER BY f.lang
"""


@query("text_quality_filter", "2.9 llm-data", _QFILTER_ORACLE)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation gate: keep documents that are at-least-average
    length AND at-most-average repetition WITHIN their language — the
    two-signal filter stage of a training-data pipeline, with per-lang
    keep counts and fractions. Thresholds are per-lang aggregates joined
    back (tiny -> AQE broadcast), so the gate is one scan + one 5-row
    join; exact integer/ratio math keeps the keep/drop decision stable
    across engines."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    feat = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tok"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(toks)) / F.size(toks).cast("double")
        ).alias("rep"),
    )
    thresholds = feat.groupBy("lang").agg(
        F.avg("n_tok").alias("tok_avg"), F.avg("rep").alias("rep_avg")
    )
    keep = (F.col("n_tok") >= F.col("tok_avg")) & (F.col("rep") <= F.col("rep_avg"))
    return (
        feat.join(thresholds, "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.round(F.sum(keep.cast("long")) / F.count(F.lit(1)).cast("double"), 4).alias(
                "keep_frac"
            ),
        )
        .orderBy("lang")
    )
