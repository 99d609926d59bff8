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
