"""Deduplication operators for training-data pipelines (SURVEY.md §2.9).

Three tiers, in order of scale-readiness:
  exact         hash group-by on the text — one shuffle, always correct
  blocked-jaccard  exact pairwise Jaccard inside blocks — quadratic within a
                block, so the block key must stay selective; correct baseline
                for evaluating the approximate tiers
  MinHash-LSH   the 100 TB path: per-doc signature (map-side), band-bucket
                join, candidate verify — pair count scales with true-dup
                density, not corpus size²
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_tokens(text: Column | str, sep: str = " ") -> Column:
    """Order-preserving distinct token array — computed map-side (no
    explode/distinct shuffle)."""
    return F.array_distinct(F.split(text, sep))


def exact_dedup(df: DataFrame, on: list[str]) -> DataFrame:
    return df.dropDuplicates(on)


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: list[str] | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """Blocked pairwise token-set Jaccard, fully relational (SURVEY §2.9):
    explode distinct tokens -> self-join on (block, token) -> |A∩B| counts ->
    jaccard = i / (|A| + |B| - i). Returns (id, id2, jaccard) with id < id2.
    """
    blocks = block_cols or []
    tok = docs.select(
        F.col(id_col), *blocks, F.explode(distinct_tokens(F.col(text_col))).alias("token")
    )
    sizes = docs.select(F.col(id_col), F.size(distinct_tokens(F.col(text_col))).alias("sz"))

    a = tok.select(
        F.col(id_col).alias("id_a"), *[F.col(b).alias(f"ba_{b}") for b in blocks], "token"
    )
    b = tok.select(
        F.col(id_col).alias("id_b"), *[F.col(b_).alias(f"bb_{b_}") for b_ in blocks], "token"
    )
    cond = (a.id_a < b.id_b) & (a.token == b.token)
    for blk in blocks:
        cond = cond & (F.col(f"ba_{blk}") == F.col(f"bb_{blk}"))
    inter = a.join(b, cond).groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("i"))

    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("i").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("i"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias(f"{id_col}2"),
            F.round(jac, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def word_shingles(text: Column | str, k: int = 3, sep: str = " ") -> Column:
    """k-word shingles as strings; empty array when the doc has < k tokens."""
    tok = F.split(text, sep)
    n = F.size(tok)
    idx = F.sequence(F.lit(0), n - k)  # 0-based start positions
    mk = lambda i: F.concat_ws(  # noqa: E731
        sep, *[F.element_at(tok, i + F.lit(j + 1)) for j in range(k)]
    )
    return F.when(n >= k, F.transform(idx, mk)).otherwise(F.array().cast("array<string>"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    distance_threshold: float = 0.3,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup candidates at Jaccard distance < threshold.

    spark.ml MinHashLSH over hashed 3-word-shingle sets. This is the path
    that survives 100 TB: signatures are computed map-side, candidate pairs
    come from band-bucket joins, and the full pairwise verify only touches
    candidates. Hash family is engine-specific -> rows-only in t2.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = docs.select(
        F.col(id_col), word_shingles(F.col(text_col)).alias("shingles")
    ).where(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, distance_threshold, distCol="jaccard_dist")
    return (
        pairs.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias(id_col),
            F.col(f"datasetB.{id_col}").alias(f"{id_col}2"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .orderBy(id_col, f"{id_col}2")
    )
