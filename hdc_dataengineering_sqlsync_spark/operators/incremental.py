"""Incremental pull + chunked extract (SURVEY.md §2.8).

Batch analogs of SQL Server change-tracking machinery:
  - ``watermark_pull``: rows changed since the last sync version/timestamp —
    the ``CHANGETABLE(CHANGES T, @last_version)`` shape. On parquet the
    predicate pushes down to the scan; on JDBC it becomes a WHERE clause on
    the server.
  - ``keyset_batches``: deterministic chunking of an extract by PK order —
    the keyset-pagination loop a JDBC reader runs (and what
    ``partitionColumn/lowerBound/upperBound/numPartitions`` parallelize).

Scale note: ``keyset_batches`` as written uses a global row_number (single
ordered pass) because the contract wants exact 500-row batches; a 100 TB
extract instead derives batches from PK *ranges* (value-based, fully
parallel) — that variant is ``keyset_ranges``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def watermark_pull(df: DataFrame, ts_col: str, last_watermark) -> DataFrame:
    """Rows strictly after the watermark (exclusive, like change-tracking
    versions: rows AT the watermark were already synced)."""
    return df.where(F.col(ts_col) > F.lit(last_watermark))


def keyset_batches(df: DataFrame, key: str, batch_size: int = 500) -> DataFrame:
    """Assign a 0-based batch id by key order; exact ``batch_size`` rows per
    batch (last one ragged)."""
    rn = F.row_number().over(Window.orderBy(key))
    return df.withColumn("batch", F.floor((rn - F.lit(1)) / F.lit(batch_size)))


def keyset_ranges(df: DataFrame, key: str, range_width: int) -> DataFrame:
    """Value-based batching (pk div width): no global sort, fully parallel —
    the scale path for chunked extracts. Returns ``df`` with a ``batch``
    column, mirroring ``keyset_batches``' shape."""
    return df.withColumn("batch", F.floor(F.col(key) / F.lit(range_width)))
