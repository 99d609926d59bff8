"""SURVEY.md §2 round-5 additions, batch PP.

LLM-data text featurization: the hashing-trick vectorizer (md5-derived
buckets, collision census) and Flesch reading-ease scoring from
regexp-countable proxies. Registered after ``roundfive_af``
(plans/__init__.py) so the qids append to the END of the never-checked
rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import duck_md5_int, query
from hdc_dataengineering_sqlsync_spark.registry import load

_N_BUCKETS = 256  # 2 md5 nibbles

# The hashing trick: token -> bucket = md5(token)[0:2 nibbles] mod 256.
# Portable across engines because the bucket derives from md5 hex (NOT
# xxhash/murmur, which the two engines implement differently). The
# census quantifies what the trick costs: tokens per bucket (collision
# fan-in) and the df mass of the heaviest buckets.
_FEATHASH_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, lower(t.tok) AS tok
  FROM documents,
       LATERAL unnest(string_split_regex(text, '[^a-zA-Z]+')) AS t(tok)
  WHERE t.tok <> ''
),
vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY tok
),
bucketed AS (
  SELECT CAST({duck_md5_int('tok', 2)} AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(df) AS BIGINT) AS df_mass
  FROM vocab GROUP BY 1
)
SELECT 'buckets_used' AS stat, CAST(count(*) AS BIGINT) AS v FROM bucketed
UNION ALL
SELECT 'max_fanin', CAST(max(n_tokens) AS BIGINT) FROM bucketed
UNION ALL
SELECT 'singleton_buckets', CAST(count(*) AS BIGINT) FROM bucketed WHERE n_tokens = 1
UNION ALL
SELECT 'vocab_size', CAST(count(*) AS BIGINT) FROM vocab
UNION ALL
SELECT 'top_bucket_' || lpad(CAST(rn AS VARCHAR), 2, '0'), df_mass FROM (
  SELECT df_mass, row_number() OVER (ORDER BY df_mass DESC, bucket) AS rn
  FROM bucketed
) WHERE rn <= 5
ORDER BY stat
"""


@query("text_feature_hashing", "2.9 llm-data", _FEATHASH_ORACLE)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer census: 256 md5 buckets over the doc vocab.

    Feature hashing replaces the vocabulary dictionary with
    hash(token) mod B — the only featurizer that needs NO global vocab
    build, which is why 100 TB text pipelines use it. The census
    answers the question the trick raises: how bad are collisions?
    (buckets used, max fan-in, singleton buckets, df mass of the top-5
    heaviest buckets vs vocab size.) Buckets derive from md5 hex
    nibbles — the engine-portable hash idiom (Spark conv(substr(md5..)),
    DuckDB nibble reconstruction) — NOT murmur/xxhash, which the two
    engines implement differently.

    Scale shape: tokenize map-side, distinct (doc, token) then the
    vocab reduce — both hash aggregates; the bucket census runs over
    the Zipf-small vocab table, not the corpus. At 100 TB the ONLY
    corpus-sized shuffle is the (doc_id, token) distinct, which any
    df-based featurizer already pays."""
    tok = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.col("text"), "[^a-zA-Z]+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select("doc_id", F.lower(F.col("tok")).alias("tok"))
        .distinct()
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    bucketed = (
        vocab.groupBy(
            F.expr("conv(substr(md5(tok), 1, 2), 16, 10)").cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("df").alias("df_mass"),
        )
        .localCheckpoint()  # tiny (≤256 rows); feeds 4 census branches
    )
    from pyspark.sql import Window

    top = (
        bucketed.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("df_mass").desc(), F.col("bucket"))
            ),
        )
        .where(F.col("rn") <= 5)
        .select(
            F.concat(
                F.lit("top_bucket_"), F.lpad(F.col("rn").cast("string"), 2, "0")
            ).alias("stat"),
            F.col("df_mass").alias("v"),
        )
    )
    census = (
        bucketed.agg(
            F.count(F.lit(1)).alias("buckets_used"),
            F.max("n_tokens").alias("max_fanin"),
            F.sum(F.when(F.col("n_tokens") == 1, 1).otherwise(0)).alias(
                "singleton_buckets"
            ),
        )
        .join(F.broadcast(vocab.agg(F.count(F.lit(1)).alias("vocab_size"))))
        .selectExpr(
            "stack(4, 'buckets_used', buckets_used, 'max_fanin', max_fanin,"
            " 'singleton_buckets', singleton_buckets, 'vocab_size', vocab_size)"
            " AS (stat, v)"
        )
    )
    return census.unionByName(top).orderBy("stat")


# Flesch reading ease from regexp-countable proxies: words = \s+ tokens,
# sentences = [.!?]+ runs (min 1), syllables = vowel GROUPS per word
# (min 1 per word — enforced as max(syll, words)). All three counts are
# integers; the score is ONE shared expression evaluated identically on
# both engines, rounded to 3dp.
_FLESCH_EXPR = (
    "round(206.835"
    " - 1.015 * (cast(words as double) / cast(sents as double))"
    " - 84.6 * (cast(sylls as double) / cast(words as double)), 3)"
)

_FLESCH_ORACLE = f"""
WITH c AS (
  SELECT doc_id, lang,
         CAST(length(regexp_replace(trim(text), '\\S+', 'w', 'g'))
              - length(regexp_replace(trim(text), '\\S+', '', 'g'))
              AS BIGINT) AS words,
         CAST(greatest(length(regexp_replace(text, '[.!?]+', '$', 'g'))
              - length(regexp_replace(text, '[.!?]+', '', 'g')), 1)
              AS BIGINT) AS sents,
         CAST(length(regexp_replace(lower(text), '[aeiouy]+', '@', 'g'))
              - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
              AS BIGINT) AS raw_sylls
  FROM documents
),
s AS (
  SELECT doc_id, lang, words, sents, greatest(raw_sylls, words) AS sylls
  FROM c WHERE words > 0
)
SELECT lang, n_docs, words, sents, sylls, {_FLESCH_EXPR} AS flesch
FROM (
  SELECT lang,
         COUNT(*) AS n_docs,
         CAST(SUM(words) AS BIGINT) AS words,
         CAST(SUM(sents) AS BIGINT) AS sents,
         CAST(SUM(sylls) AS BIGINT) AS sylls
  FROM s GROUP BY lang
) ORDER BY lang
"""


@query("text_readability_flesch", "2.9 llm-data", _FLESCH_ORACLE)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per language from regexp-countable proxies.

    Readability is a standard pre-training quality signal (too-low =
    noise, too-high = boilerplate). True syllable counting needs a
    dictionary; the distributable proxy counts VOWEL GROUPS per word
    (floored at one per word), with words = whitespace tokens and
    sentences = [.!?]+ runs — all three countable by regexp
    substitution, i.e. pure map-side JVM string ops. Counts are exact
    integers (count of X = len(replace(X,'@')) − len(remove(X)) — the
    portable occurrence-count idiom); the corpus-level score per lang
    is ONE shared expression over the three summed integers, round(3).

    Scale shape: three regexp passes per document map-side, one small
    keyed sum per language — zero joins, zero windows; the cheapest
    possible corpus quality gate."""
    t = load(spark, sf_dir, "documents")

    def _count(col, pat):
        stripped = F.regexp_replace(col, pat, "")
        marked = F.regexp_replace(col, pat, "@")
        return (F.length(marked) - F.length(stripped)).cast("long")

    c = t.select(
        "doc_id",
        "lang",
        _count(F.trim(F.col("text")), r"\S+").alias("words"),
        F.greatest(_count(F.col("text"), r"[.!?]+"), F.lit(1).cast("long")).alias(
            "sents"
        ),
        _count(F.lower(F.col("text")), "[aeiouy]+").alias("raw_sylls"),
    )
    s = c.where(F.col("words") > 0).select(
        "lang",
        "words",
        "sents",
        F.greatest(F.col("raw_sylls"), F.col("words")).alias("sylls"),
    )
    agg = s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("words"),
        F.sum("sents").alias("sents"),
        F.sum("sylls").alias("sylls"),
    )
    return agg.select(
        "lang", "n_docs", "words", "sents", "sylls",
        F.expr(_FLESCH_EXPR).alias("flesch"),
    ).orderBy("lang")
