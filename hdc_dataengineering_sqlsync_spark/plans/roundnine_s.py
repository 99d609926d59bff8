"""SURVEY.md §2 round-9 batch S: Simpson lexical diversity, Heaps'-law
vocabulary growth, curriculum staging.

  text_simpson_diversity  repeat-probability + effective vocab, exact
  text_heaps_law_fit      V = K·N^β log-log fit over cumulative growth
  mix_curriculum_stages   ntile difficulty stages + deterministic shuffle

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ---------- 2.9 llm-data: Simpson diversity (repeat probability), exact

_SIMPSON_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
counts AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM tok WHERE w <> '' GROUP BY source, w
),
s AS (
  SELECT source,
         CAST(SUM(c) AS DECIMAL(38,0)) AS n,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * (c - 1)) AS DECIMAL(38,0))
           AS rep
  FROM counts GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       vocab,
       -- HUGEINT, not DECIMAL: DuckDB '//' on DECIMAL degrades to DOUBLE
       -- division (33316.71 -> BIGINT cast ROUNDS to 33317); on HUGEINT it
       -- is the true integral division Spark's DIV computes (33316)
       CAST(CAST(rep AS HUGEINT) * 1000000
            // (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1)) AS BIGINT)
         AS simpson_e6,
       CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1)
            // CAST(rep AS HUGEINT) AS BIGINT) AS effective_vocab
FROM s WHERE n > 1 AND rep > 0
ORDER BY source
"""


@query("text_simpson_diversity", "2.9 llm-data", _SIMPSON_ORACLE)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration per source — the probability two tokens
    drawn without replacement are the SAME word, Σc(c−1)/(N(N−1)), and
    its reciprocal, the 'effective vocabulary' (how many equally-common
    words would give the same repeat rate) — the corpus-mixing
    diversity gauge that, unlike type-token ratio, is insensitive to
    corpus size. Every moment is an exact wide-integer sum; both ratios
    close with ONE integral division each (e6 fixed point), so the
    figures are bit-identical at any scale.

    Scale shape: tokenize map-side (explode), one keyed word census,
    then a source-grain fold of (N, vocab, Σc(c−1)) — map-side
    combinable end to end; sums carried DECIMAL(38,0)/HUGEINT because
    Σc² crosses int64 around 3e9 tokens of a skewed vocabulary."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )
    counts = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    s = counts.groupBy("source").agg(
        F.sum("c").cast("decimal(38,0)").alias("n"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.col("c").cast("decimal(38,0)") * (F.col("c") - 1)).alias(
            "rep"
        ),
    )
    return (
        s.where((F.col("n") > 1) & (F.col("rep") > 0))
        .select(
            "source",
            F.col("n").cast("long").alias("n_tokens"),
            "vocab",
            F.expr("CAST(rep * 1000000 DIV (n * (n - 1)) AS BIGINT)").alias(
                "simpson_e6"
            ),
            F.expr("CAST(n * (n - 1) DIV rep AS BIGINT)").alias(
                "effective_vocab"
            ),
        )
        .orderBy("source")
    )


# --------- 2.9 llm-data: Heaps' law V = K·N^β over cumulative growth

# ln coordinates quantize to the 1e-6 integer grid immediately (the
# wl_price_elasticity_loglog discipline): moments are exact integer
# sums, the two normal-equation divisions close in double, rounded 4dp.
_HEAPS_ORACLE = """
WITH tok AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
doc_tok AS (
  SELECT source, doc_id, CAST(count(*) AS BIGINT) AS ntok
  FROM tok WHERE w <> '' GROUP BY source, doc_id
),
first_seen AS (
  SELECT source, min(doc_id) AS fd
  FROM tok WHERE w <> '' GROUP BY source, w
),
new_vocab AS (
  SELECT source, fd AS doc_id, CAST(count(*) AS BIGINT) AS nv
  FROM first_seen GROUP BY source, fd
),
growth AS (
  SELECT d.source,
         CAST(SUM(d.ntok) OVER (PARTITION BY d.source ORDER BY d.doc_id)
              AS BIGINT) AS cumtok,
         CAST(SUM(COALESCE(v.nv, 0)) OVER (PARTITION BY d.source
                                           ORDER BY d.doc_id)
              AS BIGINT) AS cumvocab
  FROM doc_tok d LEFT JOIN new_vocab v
    ON v.source = d.source AND v.doc_id = d.doc_id
),
pt AS (
  SELECT source,
         CAST(floor(ln(CAST(cumtok AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS x,
         CAST(floor(ln(CAST(cumvocab AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS y
  FROM growth WHERE cumtok > 0 AND cumvocab > 0
),
mom AS (
  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM pt GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_points,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS beta,
       round((CAST(sy AS DOUBLE)
              - CAST(sx AS DOUBLE)
                * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
             / CAST(n AS DOUBLE) / 1000000.0, 4) AS ln_k
FROM mom ORDER BY source
"""


@query("text_heaps_law_fit", "2.9 llm-data", _HEAPS_ORACLE, bench=True)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit per source — vocabulary grows as V = K·N^β
    (β≈0.4–0.6 for natural text): the corpus-growth planning curve that
    says how much NEW vocabulary the next billion tokens will bring,
    and the screen that flags template/synthetic corpora (β near 0) vs
    token-salad (β near 1). Cumulative (tokens, vocab) checkpoints at
    every doc (vocab counted by FIRST occurrence — an exact min-doc per
    word, not a sketch), log-log OLS on the 1e-6 quantized grid so the
    moments are exact integer sums; slope β and intercept ln K close in
    double, rounded 4dp.

    Scale shape: two keyed map-combinable censuses (per-doc token
    counts; per-word first-doc) feed partition-parallel per-source
    running sums (window keyed by source — no global sort); OLS moments
    fold map-side to one row per source."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )
    doc_tok = tok.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("ntok")
    )
    new_vocab = (
        tok.groupBy("source", "w")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    growth = (
        doc_tok.join(new_vocab, ["source", "doc_id"], "left")
        .select(
            "source",
            F.sum("ntok").over(w).alias("cumtok"),
            F.sum(F.coalesce("nv", F.lit(0))).over(w).alias("cumvocab"),
        )
        .where((F.col("cumtok") > 0) & (F.col("cumvocab") > 0))
    )
    pt = growth.select(
        "source",
        F.floor(F.log(F.col("cumtok").cast("double")) * 1000000 + 0.5)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cumvocab").cast("double")) * 1000000 + 0.5)
        .cast("long")
        .alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    mom = pt.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * F.col("y").cast("decimal(38,0)")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return mom.select(
        "source",
        F.col("n").cast("long").alias("n_points"),
        F.round(slope, 4).alias("beta"),
        F.round(
            (F.col("sy").cast("double") - F.col("sx").cast("double") * slope)
            / nd
            / 1000000.0,
            4,
        ).alias("ln_k"),
    ).orderBy("source")


# ------- 2.9 llm-data: curriculum staging (ntile + deterministic shuffle)

_CURRICULUM_ORACLE = """
WITH diff AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
              AS BIGINT) AS ntok
  FROM documents
),
staged AS (
  SELECT source, doc_id, ntok,
         CAST(ntile(4) OVER (ORDER BY ntok, doc_id) AS INT) AS stage,
         (doc_id * 2654435761) % 4294967296 AS h
  FROM diff
)
SELECT stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(ntok) AS BIGINT) AS min_tokens,
       CAST(max(ntok) AS BIGINT) AS max_tokens,
       CAST(SUM(ntok) * 1000 // count(*) AS BIGINT) AS mean_tokens_milli,
       CAST(min_by(doc_id, h) AS BIGINT) AS first_doc
FROM staged GROUP BY stage ORDER BY stage
"""


@query("mix_curriculum_stages", "2.9 llm-data", _CURRICULUM_ORACLE)
def mix_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging — the easy-to-hard schedule curriculum
    training needs, derived deterministically: difficulty = token count,
    documents split into 4 equal stages by `ntile` over the total
    (difficulty, doc_id) order, then WITHIN each stage the feed order is
    a deterministic Knuth-multiplicative shuffle (odd multiplier mod
    2^32 is a bijection on doc_id, so `first_doc` — the stage's first
    sample — is collision-free and reproducible across engines and
    runs). Census per stage: sizes, difficulty range, exact milli-token
    mean, first sample.

    Scale shape: difficulty is map-side scalar work; ntile over a total
    order is the one intentionally-global step (rank via sampled range
    partitioning at scale — same cost class as any global sort); the
    stage census folds map-side to 4 rows."""
    diff = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).cast("long").alias("ntok"),
    )
    staged = diff.select(
        "doc_id",
        "ntok",
        F.ntile(4).over(Window.orderBy("ntok", "doc_id")).alias("stage"),
        ((F.col("doc_id") * 2654435761) % 4294967296).alias("h"),
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ntok").alias("min_tokens"),
            F.max("ntok").alias("max_tokens"),
            F.expr("SUM(ntok) * 1000 DIV count(*)").alias(
                "mean_tokens_milli"
            ),
            F.min_by("doc_id", "h").alias("first_doc"),
        )
        .orderBy("stage")
    )
