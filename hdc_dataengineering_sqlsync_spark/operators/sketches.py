"""Sublinear sketches (SURVEY.md §2.9 family; the "custom sketch operator"
class): count-min for frequency estimation, Bloom for membership.

A CMS is a d x w counter matrix; item frequency is estimated as the MINIMUM
over its d hashed buckets, so estimates only ever overcount (collision
noise), never undercount. At 100 TB the sketch build is one map-side explode
(d rows per token) plus ONE keyed shuffle into d*w counters — the counter
table is tiny and broadcastable no matter how large the corpus, which is the
whole point: heavy-hitter frequencies without materializing a full per-token
count table.

A Bloom filter is the membership analog: k bit positions per item in an
m-bit array; a probe is positive iff all k bits are set — no false
negatives, false-positive rate ~(1 - e^(-kn/m))^k. Same build shape (one
explode + one distinct), same broadcast-probe shape, same guarantee
direction (only overcounts membership).

Hashing is md5-nibble based (probed byte-identical across engines), so a
DuckDB oracle reproduces the sketch exactly — same buckets, same counts,
same estimates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(item: Column, row: Column, w: int) -> Column:
    """Bucket of ``item`` in hash row ``row``: first 16 bits of
    md5("<row>:<item>") mod w. conv() hex->int keeps it builtin/JVM-side."""
    h = F.substring(F.md5(F.concat_ws(":", row.cast("string"), item)), 1, 4)
    return F.conv(h, 16, 10).cast("long") % w


def cms_build(df: DataFrame, item_col: str, d: int = 4, w: int = 64) -> DataFrame:
    """Build the (row, bucket, cnt) counter table: explode each item into its
    d hash rows, one groupBy. Output has at most d*w rows regardless of
    input size."""
    rows = df.select(
        F.col(item_col).alias("_item"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    )
    return (
        rows.select("r", cms_bucket(F.col("_item"), F.col("r"), w).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bloom_bit(item: Column, hash_idx: Column, m: int) -> Column:
    """Bit position of ``item`` under hash function ``hash_idx``: first 16
    bits of md5("<idx>:<item>") mod m — same md5-nibble scheme as the CMS,
    so a DuckDB oracle reproduces it exactly."""
    h = F.substring(F.md5(F.concat_ws(":", hash_idx.cast("string"), item)), 1, 4)
    return F.conv(h, 16, 10).cast("long") % m


def bloom_build(df: DataFrame, item_col: str, k: int = 4, m: int = 512) -> DataFrame:
    """Build the set-bits table of a Bloom filter over the (distinct) items:
    explode each item into its k bit positions, distinct. At most m rows
    regardless of member-set size — broadcastable, the point of the sketch:
    approximate membership (no false negatives, tunable false positives)
    without shipping the member set."""
    bits = df.select(
        F.col(item_col).alias("_item"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
    )
    return bits.select(bloom_bit(F.col("_item"), F.col("j"), m).alias("bit")).distinct()


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, item_col: str, k: int = 4, m: int = 512
) -> DataFrame:
    """Membership test per probe item: positive iff ALL k bit positions are
    set. The bits table broadcasts; the probe is a map-side join + count
    match — adds a `bloom_positive` boolean column."""
    pb = probes.select(
        F.col(item_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
    ).withColumn("bit", bloom_bit(F.col(item_col), F.col("j"), m))
    hits = (
        pb.join(F.broadcast(bloom), "bit", "left_semi")
        .groupBy(item_col)
        # countDistinct, not count: duplicate probe rows would otherwise
        # inflate the per-item hit count past k and flip true members to
        # negative — the one failure mode a Bloom filter must never have
        .agg(F.countDistinct("j").alias("_nset"))
    )
    return (
        probes.join(hits, item_col, "left")
        .withColumn("bloom_positive", F.coalesce(F.col("_nset"), F.lit(0)) == k)
        .drop("_nset")
    )


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, item_col: str, d: int = 4, w: int = 64
) -> DataFrame:
    """Estimated frequency per query item: min over the d (row, bucket)
    counters. The sketch side is tiny -> broadcast; the lookup is a map-side
    join however many query items there are."""
    probes = queries.select(
        F.col(item_col),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    ).withColumn("bucket", cms_bucket(F.col(item_col), F.col("r"), w))
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
