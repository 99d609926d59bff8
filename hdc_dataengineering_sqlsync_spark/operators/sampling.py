"""Deterministic hash-based sampling (SURVEY.md §2.9 family — training-data
pipeline operators).

Spark's ``df.sample`` is seeded per-partition, so its row set changes with
partitioning and engine — useless both for the cross-engine oracle and for a
production corpus where the sample must be STABLE under re-partitioning,
retries, and incremental appends. The standard fix is hash-based selection:
a pseudo-uniform u ∈ [0,1) derived from md5 of the row key (md5 probed
byte-identical across engines), then

  bernoulli     keep iff u < rate           — stable row-level sample
  stratified    per-stratum rate lookup     — rebalance skewed strata
  bottom-k      k smallest hashes globally  — fixed-size "consistent sample"
                (a bottom-k sketch: as the corpus grows, the selected set
                evolves minimally, and two corpora's bottom-k sets estimate
                their Jaccard overlap)

All three are map-side except bottom-k's final TakeOrderedAndProject; no
shuffle, no RNG state, embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# u is built from the first 7 hex nibbles of md5 -> 28 bits; dividing by 2^28
# is exact in double, so threshold comparisons are deterministic.
HASH_DENOM = float(1 << 28)


def hash_uniform(key: Column, salt: str = "s") -> Column:
    """Pseudo-uniform double in [0,1) from md5("<salt>:<key>") — the
    deterministic stand-in for rand() (SURVEY §2 convention 7)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 7), 16, 10
    ).cast("long")
    return h / F.lit(HASH_DENOM)


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "s") -> DataFrame:
    """Stable Bernoulli sample: keep rows whose hash-uniform < rate."""
    return df.where(hash_uniform(F.col(key_col), salt) < rate)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum stable sample — the corpus-rebalancing op (e.g. downsample
    over-represented languages). ``rates`` maps stratum value -> keep rate;
    the rate lookup is a literal CASE chain, fully map-side."""
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    return df.where(hash_uniform(F.col(key_col)) < rate)


def bottom_k_sample(df: DataFrame, key_col: str, k: int, salt: str = "s") -> DataFrame:
    """Fixed-size consistent sample: the k rows with the smallest key hashes
    (order by the full md5 hex string — ties impossible for distinct keys).
    Plans as TakeOrderedAndProject: per-partition top-k then a k-row merge on
    the driver, never a global sort."""
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    return df.withColumn("_h", h).orderBy("_h", key_col).limit(k).drop("_h")
