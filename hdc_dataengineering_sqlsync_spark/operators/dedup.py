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


def simhash16(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """16-bit SimHash per document, cross-engine reproducible.

    Token hash = first 4 hex nibbles of ``md5(token)`` (md5 probed
    byte-identical across engines); per bit position, sum +-1 votes over the
    doc's distinct tokens; sign of the sum is the bit. Expressed relationally
    (explode tokens x 16 bit positions -> one keyed shuffle) so a DuckDB
    oracle can replay the identical algebra. At 100 TB the same signature is
    computed map-side in one pass (pandas_udf packing all 16 counters);
    the relational form here is the correctness baseline.
    """
    blocks = block_cols or []
    tok = docs.select(
        F.col(id_col), *blocks, F.explode(distinct_tokens(F.col(text_col))).alias("token")
    ).withColumn("_h", F.md5(F.col("token")))  # hash ONCE per token, before the x16 explode
    bits = tok.select(
        F.col(id_col),
        *blocks,
        F.col("_h"),
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bitpos"),
    )
    # nibble index 1..4 from bitpos, bit-within-nibble 0..3
    nib_char = F.substring(F.col("_h"), (F.col("bitpos") / 4 + 1).cast("int"), 1)
    nib_val = F.conv(nib_char, 16, 10).cast("int")
    bit = (F.floor(nib_val / F.pow(F.lit(2.0), (F.col("bitpos") % 4).cast("double"))).cast("int") % 2)
    vote = (bit * 2 - 1).alias("vote")
    per_bit = (
        bits.select(F.col(id_col), *blocks, F.col("bitpos"), vote)
        .groupBy(id_col, *blocks, "bitpos")
        .agg(F.sum("vote").alias("v"))
    )
    sh = F.sum(
        F.when(F.col("v") >= 0, F.pow(F.lit(2.0), F.col("bitpos").cast("double")).cast("long")).otherwise(F.lit(0))
    ).alias("simhash")
    return per_bit.groupBy(id_col, *blocks).agg(sh)


def simhash_topk_pairs(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
) -> DataFrame:
    """Top-k most-similar doc pairs by SimHash Hamming distance, blocked by
    ``block_col`` (pairwise only inside a block). Deterministic total order
    (hamming ASC, id, id2). The 100 TB path blocks further by signature bands
    so the pair count tracks true-dup density, not corpus size^2."""
    sh = simhash16(docs, id_col=id_col, text_col=text_col, block_cols=[block_col])
    a = sh.select(
        F.col(block_col), F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    b = sh.select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    pairs = a.join(b, (a[block_col] == b["_blk"]) & (F.col("id_a") < F.col("id_b")))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return (
        pairs.select(F.col("id_a").alias(id_col), F.col("id_b").alias(f"{id_col}2"), ham)
        .orderBy("hamming", id_col, f"{id_col}2")
        .limit(k)
    )


def shingle_jaccard_pairs(
    docs: DataFrame,
    k_shingle: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
) -> DataFrame:
    """n-gram (k-word-shingle) Jaccard near-dup pairs, blocked by
    ``block_col``. Same relational plan as ``jaccard_pairs`` but over
    k-shingles instead of unigrams — shingles catch local word order, the
    standard near-dup signal (and the exact-verify stage behind MinHash-LSH).
    """
    sh = docs.select(
        F.col(id_col),
        F.col(block_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k=k_shingle))).alias("shingle"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col(block_col).alias("blk_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), F.col(block_col).alias("blk_b"), "shingle")
    inter = (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")) & (a.shingle == b.shingle))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.round(F.col("i").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("i")), 4)
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(F.col("id_a").alias(id_col), F.col("id_b").alias(f"{id_col}2"), jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


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
