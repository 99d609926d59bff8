"""SURVEY.md §2 round-5 additions, batch Y.

Targeted (GDPR-style) erasure by minimal file rewrite. Registered after
``roundfive_o`` (plans/__init__.py) so the qids append to the END of the
never-checked rotation segment.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# The erased band is dataset-relative (45%..45%+2% of the max subject
# key) so the qid exercises a NON-EMPTY, properly-confined band at every
# scale factor — identical integer arithmetic on both engines.
_ERASURE_ORACLE = """
WITH b AS (
  SELECT MAX(o_custkey) * 45 // 100 AS lo,
         MAX(o_custkey) * 45 // 100 + greatest(MAX(o_custkey) // 50, 1) AS hi
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(COUNT(*) FILTER (WHERE o_custkey >= b.lo AND o_custkey < b.hi)
            AS BIGINT) AS n_target_rows
FROM orders, b WHERE NOT (o_custkey >= b.lo AND o_custkey < b.hi)
"""


@query("sync_targeted_erasure", "2.8 sync core", _ERASURE_ORACLE)
def sync_targeted_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten: erase keys by rewriting ONLY affected files.

    The GDPR deletion shape for immutable-file stores: a handful of
    subject keys must disappear, but rewriting the whole table for a
    0.1% deletion is a 1000× write amplification. The dataset is laid
    out range-clustered on the subject key (`repartitionByRange` — the
    layout choice that makes this work), so the hidden
    `_metadata.file_path` column locates the files that actually
    contain targets — a keyed census, no second scan source. Only
    those files re-write (filtered); every other file is untouched on
    disk (byte-for-byte, mtime-asserted in the unit test). The final
    census proves completeness: zero target rows remain, everything
    else survives. The erased subjects here are a CONTIGUOUS key band —
    the favorable case range clustering is designed to create; subjects
    scattered across the key space degrade toward a full rewrite, which
    is precisely the argument for clustering the table on the subject
    key in the first place.

    Scale shape: detect = one aggregate over the scan's own metadata
    column; rewrite I/O ∝ files-containing-targets (with range
    clustering, ≈ n_targets / rows_per_file), not table size. The
    follow-up hygiene ops are declared separately: compaction
    (`sync_compact_small_files`) and tombstone retention
    (`sync_tombstone_retention`)."""
    src = load(spark, sf_dir, "orders")
    tag = hashlib.md5(f"erasure:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"hdc_erasure_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    try:
        # range-clustered layout on the subject key: targets concentrate
        # in few files instead of smearing over all of them
        src.repartitionByRange(6, "o_custkey").write.parquet(root)
        mx = src.agg(F.max("o_custkey")).collect()[0][0]
        lo = mx * 45 // 100
        hi = lo + max(mx // 50, 1)
        target = (F.col("o_custkey") >= lo) & (F.col("o_custkey") < hi)
        affected = [
            r.f
            for r in spark.read.parquet(root)
            .select(F.col("_metadata.file_path").alias("f"), "o_custkey")
            .where(target)
            .select("f")
            .distinct()
            .collect()
        ]
        # rewrite ONLY the affected files, filtered; then retire originals
        if affected:
            cleaned = spark.read.parquet(*affected).where(~target)
            cleaned.write.mode("append").parquet(root)
            from urllib.parse import urlparse

            for f in affected:
                # _metadata.file_path is a URI (file:/... or file://...)
                os.remove(urlparse(f).path)
        out = (
            spark.read.parquet(root)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                    "total_cents"
                ),
                F.sum(target.cast("long")).alias("n_target_rows"),
            )
        )
        out.collect()  # materialize before staging removal
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
