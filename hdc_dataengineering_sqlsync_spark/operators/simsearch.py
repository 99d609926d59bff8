"""Similarity search over embedding columns (SURVEY.md §2.9).

Brute-force cosine top-k is the correctness baseline (exact, one pass,
broadcast query). The scale path is LSH bucketing: random-hyperplane signs
computed map-side shrink the candidate set before exact re-scoring — at 100
TB the brute-force scan of every vector is the bottleneck, the bucketed
variant only re-scores one bucket.

All vector math via functions/vectors.py — builtin higher-order functions in
DOUBLE, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdc_dataengineering_sqlsync_spark.functions.vectors import cosine_similarity


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to one stored vector; deterministic
    order (rounded cos DESC, id ASC)."""
    qvec = emb.where(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("_q"))
    cand = emb.where(F.col(id_col) != query_vec_id)
    cos = F.round(cosine_similarity(F.col(vec_col), F.col("_q")), 4)
    return (
        cand.crossJoin(F.broadcast(qvec))
        .select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def knn_per_label(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per label: the member vector closest (cosine) to the label centroid.

    posexplode -> per-(label, pos) mean -> rejoin -> per-vector dot/norms.
    All shuffles are keyed on (label, pos) / (label, id) — no pairwise blowup.
    """
    comp = emb.select(
        F.col(label_col).alias("label"),
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("pos", "_xf"),
    ).withColumn("x", F.col("_xf").cast("double"))
    cent = comp.groupBy("label", "pos").agg(F.avg("x").alias("c"))
    per_vec = (
        comp.join(cent, ["label", "pos"])
        .groupBy("label", id_col)
        .agg(
            F.sum(F.col("x") * F.col("c")).alias("dot"),
            F.sum(F.col("x") * F.col("x")).alias("na2"),
            F.sum(F.col("c") * F.col("c")).alias("nb2"),
        )
    )
    cos = F.round(F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2")), 4)
    w = Window.partitionBy("label").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        per_vec.select("label", id_col, cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("label", id_col, "cos")
        .orderBy("label")
    )


def lsh_bucket(emb: DataFrame, n_planes: int = 8, seed: int = 42, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id per vector — the candidate-
    pruning stage for approximate search at scale. Deterministic: plane
    coefficients derive from a seeded hash of (plane, pos), not RNG state."""
    dim_idx = F.sequence(F.lit(0), F.size(vec_col) - 1)
    bucket = F.lit(0)
    for p in range(n_planes):
        # pseudo-random ±1 coefficient per (plane, position) via xxhash64
        coeff = lambda i, p=p: F.when(  # noqa: E731
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), 2) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))
        proj = F.aggregate(
            F.zip_with(dim_idx, F.transform(F.col(vec_col), lambda x: x.cast("double")),
                       lambda i, x: coeff(i) * x),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return emb.withColumn("bucket", bucket)
