"""Table maintenance — small-files compaction (SURVEY.md §2.8 family).

A continuously-syncing target accretes small files (one per micro-batch per
partition); scan cost then scales with file COUNT, not data size. Compaction
rewrites the dataset so each partition value holds a bounded number of
files. The rewrite is one shuffle keyed on the partition column — at
deployment it runs per-partition-predicate (only partitions whose file
count exceeds a threshold), so cost tracks the fragmented slice, never the
whole table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_file_counts(root: str) -> dict[str, int]:
    """Parquet data-file count per partition directory (recursive; '' key =
    unpartitioned root)."""
    counts: dict[str, int] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        n = sum(1 for f in filenames if f.endswith(".parquet"))
        if n:
            counts[os.path.relpath(dirpath, root)] = n
    return counts


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_col: str | None = None,
    files_per_partition: int = 1,
) -> DataFrame:
    """Rewrite ``src`` parquet at ``dst`` with ``files_per_partition`` files
    per partition value (or total, when unpartitioned). Returns the
    compacted DataFrame handle.

    ``repartition(partition_col, salt)`` routes every partition value to
    ``files_per_partition`` tasks, so the writer emits exactly that many
    files per directory — no post-hoc file stitching, one shuffle total.
    """
    df = spark.read.parquet(src)
    if partition_col is None:
        df.repartition(files_per_partition).write.mode("overwrite").parquet(dst)
    else:
        salt = (F.crc32(F.concat_ws("|", *df.columns)) % files_per_partition).alias("_salt")
        (
            df.withColumn("_salt", salt)
            .repartition(F.col(partition_col), F.col("_salt"))
            .drop("_salt")
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(dst)
        )
    return spark.read.parquet(dst)


def repair_partitions(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    part_col: str,
    parts: list[str],
) -> None:
    """Partition-level sync repair: rewrite ONLY the named partitions of the
    parquet target from the source's rows, via dynamic partition overwrite —
    untouched partitions' files are left physically in place (asserted in
    tests by file-listing identity).

    This is the 100 TB companion of the digest pre-pass
    (plans/dataops.py::sync_partition_digest): after the coarse compare
    flags diff partitions, repair cost tracks the CHANGED slice only —
    no row-level merge, no full-table rewrite. Partitions present only in
    the target (source-side drops of a whole partition) are not removed by
    an overwrite that writes no rows for them; deployment pairs this with
    an explicit partition-drop pass for that case.
    """
    if not parts:
        return
    repl = source.where(F.col(part_col).isin(parts))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        repl.write.mode("overwrite").partitionBy(part_col).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
