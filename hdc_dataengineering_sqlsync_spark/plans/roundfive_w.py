"""SURVEY.md §2 round-5 additions, batch FF.

Orphan-file garbage collection (the VACUUM complement of the commit-log
snapshot). Registered after ``roundfive_v`` (plans/__init__.py) so the
qids append to the END of the never-checked rotation segment.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

_GC_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(3 AS BIGINT) AS n_committed_files,
       CAST(2 AS BIGINT) AS n_orphans_removed
FROM orders WHERE o_orderkey % 2 = 0
"""


@query("sync_orphan_file_gc", "2.8 sync core", _GC_ORACLE)
def sync_orphan_file_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-file GC: delete data files the commit log never committed.

    The other half of `sync_txlog_snapshot`'s manifest-based isolation:
    a writer that died after writing part-files but BEFORE committing
    leaves orphans in the data directory. Readers that resolve through
    the manifest never see them — but they cost storage and poison any
    raw directory listing, so a VACUUM pass reconciles listing vs
    manifest and deletes the difference. Staged here: a committed
    3-file snapshot (manifest.json) plus a 2-file uncommitted write;
    GC removes exactly the 2 orphans (filesystem-asserted in the unit
    test), and the manifest-resolved census is IDENTICAL before and
    after — GC must never touch committed data.

    Scale shape: the listing-vs-manifest diff is a set difference over
    FILE NAMES (driver/metadata-scale, no data I/O); deletion is
    per-orphan. The safety rule at deployment is an age threshold
    (only orphans older than the longest plausible in-flight write —
    mtime machinery as in `scan_modified_after`), noted here because
    the fixture's synchronous staging doesn't need it."""
    src = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 2 == 0)
    tag = hashlib.md5(f"gc:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"hdc_gc_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    try:
        # committed snapshot: 3 files + manifest
        src.repartition(3).write.parquet(root)
        committed = sorted(
            f for f in os.listdir(root) if f.endswith(".parquet")
        )
        with open(os.path.join(root, "manifest.json"), "w") as fh:
            json.dump({"files": committed}, fh)
        # a zombie writer's uncommitted files (same schema, poison rows)
        src.limit(100).withColumn(
            "o_totalprice", F.lit(9.99)
        ).repartition(2).write.mode("append").parquet(root)
        # GC: listing vs manifest
        with open(os.path.join(root, "manifest.json")) as fh:
            manifest = set(json.load(fh)["files"])
        orphans = [
            f
            for f in os.listdir(root)
            if f.endswith(".parquet") and f not in manifest
        ]
        for f in orphans:
            os.remove(os.path.join(root, f))
        reader_files = [os.path.join(root, f) for f in sorted(manifest)]
        out = (
            spark.read.schema(src.schema)
            .parquet(*reader_files)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                    "total_cents"
                ),
                F.lit(len(manifest)).cast("long").alias("n_committed_files"),
                F.lit(len(orphans)).cast("long").alias("n_orphans_removed"),
            )
        )
        out.collect()  # materialize before staging removal
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
