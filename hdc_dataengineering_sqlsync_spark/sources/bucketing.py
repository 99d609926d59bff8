"""Bucketed tables — co-located joins without a shuffle (SURVEY.md §4).

At 100 TB the dominant cost of a repeated fact⋈fact join is re-shuffling both
sides on the join key every query. Writing both tables bucketed by that key
(same bucket count) pins rows to hash-stable files, so Spark's planner reads
matching buckets pairwise and the SortMergeJoin runs with NO Exchange on
either side. This is the storage-level analog of the reference's PK-clustered
sync tables.

Spark requires ``bucketBy`` writes to go through the session catalog
(``saveAsTable``); with the default in-memory catalog they land in
``spark.sql.warehouse.dir`` and are readable via ``spark.table``.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    catalog table. Sorting by the join key lets SortMergeJoin skip its sort
    step too (zero-exchange, zero-sort join).

    A managed table's files outlive the in-memory catalog that created it, so
    a table written by a previous session is an *orphaned location*:
    ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS even in overwrite
    mode (overwrite only replaces tables the current catalog knows about).
    Drop any registered table AND clear the orphaned directory first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = Path(warehouse.removeprefix("file:")) / table.lower()
    if loc.exists():
        shutil.rmtree(loc)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. When both
    sides were written with ``write_bucketed`` on ``on`` with equal bucket
    counts, the physical plan contains no Exchange (asserted in
    tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
