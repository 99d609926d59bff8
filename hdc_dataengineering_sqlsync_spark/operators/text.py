"""Text-analysis operators for training-data pipelines (SURVEY.md §2.9 +
the language-ID / quality-score / token-count / fingerprint extensions).

Everything is built from builtin expressions (split/explode/groupBy) so the
hot path stays JVM-side; per-doc derived metrics are map-side only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"


def tokens(text: Column | str) -> Column:
    return F.split(F.lower(text), WS)


def wordcount(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def tf_idf_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-term max TF-IDF across the corpus: tf = in-doc term count,
    idf = ln(N / df).

    Because idf is constant within a term, max(tf * idf) = max(tf) * idf —
    so df (= number of tf rows per term) and max(tf) come out of ONE
    per-term aggregation over the tf table: two keyed shuffles total, no
    tf⋈df join. Corpus size N rides the plan as a broadcast 1-row aggregate
    (no driver-side count())."""
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    per_term = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.max("tf").alias("mtf")
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    score = F.col("mtf") * F.log(F.col("_n") / F.col("df"))
    return per_term.crossJoin(F.broadcast(n)).select(
        "term", F.round(score, 4).alias("score")
    )


# ---- training-data quality extensions (first-class, SURVEY.md §2.9 basis N)

_STOPWORDS = (
    "the a an and or of to in is it for on with as at by this that be are was".split()
)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: length, token count, avg token length,
    punct ratio, distinct-stopword ratio — map-side only, no shuffle."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in _STOPWORDS])))
    return docs.withColumns(
        {
            "n_chars_obs": F.length(t),
            "n_tokens": n_tok,
            "avg_token_len": F.round(F.length(t) / F.greatest(n_tok, F.lit(1)), 4),
            "punct_ratio": F.round(
                F.length(F.regexp_replace(t, r"[^.,;:!?]", "")) / F.greatest(F.length(t), F.lit(1)), 4
            ),
            "stopword_distinct_ratio": F.round(
                stop_hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)), 4
            ),
        }
    )


def lang_id_heuristic(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-frequency language guess (en/de/es/fr marker words). A real
    pipeline swaps in fastText/CLD3 behind the same column contract."""
    markers = {
        "en": ["the", "and", "of"],
        "de": ["der", "die", "und"],
        "es": ["el", "los", "que"],
        "fr": ["le", "les", "des"],
    }
    toks = F.array_distinct(tokens(F.col(text_col)))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ms in markers.items()
    ]
    best = F.greatest(*scores)
    guess = F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))
    return docs.withColumn("lang_guess", guess)


def token_count_bpe_ish(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish (subword regex) token counts per doc. The regex
    splits words and digit runs the way byte-pair pretokenizers do."""
    t = F.col(text_col)
    ws_count = F.size(F.split(t, WS))
    bpe_ish = F.size(F.regexp_extract_all(t, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1))
    return docs.withColumns({"n_tokens_ws": ws_count, "n_tokens_bpe": bpe_ish})


def fingerprint(docs: DataFrame, text_col: str = "text", algo: str = "xxhash64") -> DataFrame:
    """Document fingerprint of the normalized token stream — the cheap
    exact-dup key for 100 TB dedup sweeps.

    algo='xxhash64' (default): 64-bit integer, fastest JVM-side path.
    algo='md5': hex-string digest, byte-identical across engines (probed) —
    the t2-declared form so a DuckDB oracle can reproduce it.
    """
    normalized = F.array_join(tokens(F.col(text_col)), " ")
    fp = F.xxhash64(normalized) if algo == "xxhash64" else F.md5(normalized)
    return docs.withColumn("fingerprint", fp)
